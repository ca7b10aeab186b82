"""The CDC apply pipeline: change-event stream -> parse -> MERGE.

Batch and streaming entry points around one core routine, `apply_batch`
(the reference shares code between live consumption and replay the same
way — parser/main.py:49-54 re-feeds DB rows as fake Kafka records).

Exactly-once protocol (reference T1, SURVEY.md §2.11): Structured
Streaming checkpoints source offsets; the sink (LakeTable) records the
last applied `batch_id` in its atomically-swapped manifest. A crash
between sink commit and checkpoint commit replays the batch; the
manifest guard plus idempotent DDL plus LSN-guarded MERGE make the
replay a no-op. This is the Spark re-expression of the reference's
"DB commit, then Kafka offset commit, duplicates absorbed by ON
CONFLICT" protocol (parser/main.py:85-90).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lake.merge import merge_into
from ..lake.table import LakeTable
from ..schemas import CHANGE_EVENT_SCHEMA
from .dispatch import ParserRegistry, default_registry
from .skew import KEY_SEP, HotKeyMonitor


def _apply_ddl(table: LakeTable, ddl_rows: list) -> list[str]:
    """Apply schema_change events in LSN order. All three actions are
    metadata-only LakeTable commits and are idempotent under replay."""
    applied = []
    for r in sorted(ddl_rows, key=lambda r: r["lsn"]):
        if r["action"] == "add":
            table.add_column(r["name"], r["type"])
        elif r["action"] == "rename":
            table.rename_column(r["name"], r["new_name"])
        elif r["action"] == "widen":
            table.widen_column(r["name"], r["type"])
        applied.append(f"{r['action']}:{r['name']}")
    return applied


def _resolve_renames(
    spark: SparkSession,
    table: LakeTable,
    rename_rows: list,
    in_batch_upserts: DataFrame,
    in_batch_deletes: DataFrame,
    data_cols: list[str],
) -> tuple[list[dict], int]:
    """Driver-assisted rename resolution.

    A rename moves the old key's current content to the new key — a
    cross-key dependency the pure LWW merge can't express. Semantics
    match the sequential oracle: the winner is the latest write to the
    old key with lsn < rename.lsn, looked up across (a) this batch's
    events, (b) earlier renames in this batch (overlay), (c) the lake.
    Missing/dead old key -> rename skipped (the reference's NonCritical
    missing-parent contract, db.py:98-152 lookups + MIN_MATURITY).

    Renames are rare relative to upserts; the lookups are batched,
    bucket-pruned point reads (the Spark analogue of the reference's
    indexed point lookups, SURVEY.md §2.1 S5).
    """
    # dedup duplicate deliveries by lsn
    seen, renames = set(), []
    for r in sorted(rename_rows, key=lambda r: r["lsn"]):
        if r["lsn"] in seen or r["new_path"] is None:
            continue
        seen.add(r["lsn"])
        renames.append(r)
    if not renames:
        return [], 0

    old_keys = {(r["repo"], r["path"]) for r in renames}
    key_strs = [f"{k[0]}{KEY_SEP}{k[1]}" for k in old_keys]
    kcol = F.concat_ws(KEY_SEP, F.col("repo"), F.col("path"))

    # (a) in-batch writes to old keys — only the top few per key by LSN
    # can win a rename, so cap the collect (scale-safe even if a hot key
    # is renamed)
    from pyspark.sql import Window

    w = Window.partitionBy("repo", "path").orderBy(F.desc("lsn"))
    writes = (
        in_batch_upserts.withColumn("_dead", F.lit(False))
        .unionByName(
            in_batch_deletes.withColumn("_dead", F.lit(True)),
            allowMissingColumns=True,
        )
        .filter(kcol.isin(key_strs))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 8)
        .drop("_rn")
        .collect()
    )
    batch_writes: dict[tuple, list] = {}
    for row in writes:
        d = row.asDict()
        batch_writes.setdefault((d["repo"], d["path"]), []).append(
            (d["lsn"], d["_dead"], d)
        )

    # (c) lake state for old keys (bucket-pruned point reads, tombstones
    # included so a dead key blocks the rename)
    kdf = spark.createDataFrame(list(old_keys), ["repo", "path"])
    buckets = [
        r["_b"]
        for r in kdf.withColumn("_b", table.bucket_expr()).select("_b").distinct().collect()
    ]
    lake_state = {
        (r["repo"], r["path"]): r.asDict()
        for r in table.read(buckets=buckets, include_deleted=True)
        .filter(kcol.isin(key_strs))
        .collect()
    }

    # sequential driver resolution with an overlay for in-batch chains
    overlay: dict[tuple, tuple] = {}  # key -> (lsn, alive, row|None)
    synthetic, skipped = [], 0
    for r in renames:
        L, old = r["lsn"], (r["repo"], r["path"])
        best = None  # (lsn, alive, row)
        lk = lake_state.get(old)
        if lk is not None and lk["lsn"] < L:
            best = (lk["lsn"], not lk.get("_deleted"), lk)
        for lsn, dead, row in batch_writes.get(old, []):
            if lsn < L and (best is None or lsn > best[0]):
                best = (lsn, not dead, row)
        ov = overlay.get(old)
        if ov is not None and ov[0] < L and (best is None or ov[0] > best[0]):
            best = ov
        if best is None or not best[1]:
            skipped += 1
            continue
        new_key = (r["repo"], r["new_path"])
        moved = {c: best[2].get(c) for c in data_cols}
        moved.update(repo=new_key[0], path=new_key[1], lsn=L, op="u")
        synthetic.append({"repo": old[0], "path": old[1], "lsn": L, "op": "d"})
        synthetic.append(moved)
        overlay[old] = (L, False, None)
        overlay[new_key] = (L, True, moved)
    return synthetic, skipped


def apply_batch(
    spark: SparkSession,
    table: LakeTable,
    events: DataFrame,
    batch_id: int | None = None,
    registry: ParserRegistry | None = None,
    monitor: HotKeyMonitor | None = None,
    collect_stats: bool = True,
) -> dict:
    t0 = time.time()
    m = table.manifest()
    if batch_id is not None and batch_id <= m["batch_id"]:
        return {"skipped": True, "batch_id": batch_id}
    events = events.persist()
    try:
        # 1. DDL first — schema_change events are global barriers in the
        #    log (WAL DDL is totally ordered), so every data event in this
        #    batch parses against the post-DDL schema.
        reg = registry or default_registry()
        ddl = reg.route(events, reg.get("schema_change")).collect()
        applied_ddl = _apply_ddl(table, ddl)

        cols = table.schema().fieldNames()
        lang_col = "language" if "language" in cols else "lang"
        reg = registry or default_registry(lang_col)
        data_cols = [c for c in cols if c not in ("repo", "path", "lsn")]

        # 2. vectorized per-event-type parse
        ups = reg.route(events, reg.get("file_upsert"))
        ups_ok = ups.filter(~F.col("_malformed")).drop("_malformed")
        dels = reg.route(events, reg.get("file_delete"))
        ren = reg.route(events, reg.get("file_rename")).collect()

        synthetic, renames_skipped = _resolve_renames(
            spark, table, ren, ups_ok, dels, data_cols
        )
        updates = ups_ok.unionByName(dels, allowMissingColumns=True)
        if synthetic:
            from pyspark.sql import types as T

            tbl_schema = table.schema()
            names = ["repo", "path", "lsn", "op", *data_cols]
            sschema = T.StructType(
                [
                    T.StructField("op", T.StringType(), True)
                    if n == "op"
                    else T.StructField(n, tbl_schema[n].dataType, True)
                    for n in names
                ]
            )
            sdf = spark.createDataFrame(
                [tuple(s.get(n) for n in names) for s in synthetic], sschema
            )
            updates = updates.unionByName(sdf, allowMissingColumns=True)

        # 3. hot-key detection -> salted dedup
        salt = monitor.salt_for(events) if monitor is not None else None

        stats = {}
        if collect_stats:
            stats = {
                "n_events": events.count(),
                "n_malformed": ups.filter(F.col("_malformed")).count(),
                "n_renames": len(ren),
                "renames_skipped": renames_skipped,
            }

        result = merge_into(table, updates, batch_id=batch_id, salt=salt)
        result.update(
            ddl=applied_ddl,
            salt=salt,
            parse_wall_ms=int((time.time() - t0) * 1000),
            **stats,
        )
        return result
    finally:
        events.unpersist()


class CdcPipeline:
    """Streaming (and batch-replay) driver around apply_batch."""

    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        event_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 4,
        salt: int = 16,
        collect_stats: bool = True,
    ):
        self.spark = spark
        self.table = table
        self.event_dir = event_dir
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.monitor = HotKeyMonitor(table.key_fields(), salt=salt)
        self.collect_stats = collect_stats
        self.batches_applied = 0
        self.fail_after: int | None = None  # test hook: crash injection

    def _handle(self, batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(
            self.spark,
            self.table,
            batch_df,
            batch_id=batch_id,
            monitor=self.monitor,
            collect_stats=self.collect_stats,
        )
        self.batches_applied += 1
        if self.fail_after is not None and self.batches_applied >= self.fail_after:
            # simulate a crash AFTER the sink committed but BEFORE the
            # checkpoint recorded the batch — the exactly-once razor's edge
            raise RuntimeError("injected crash after sink commit")

    def run_streaming(self, available_now: bool = True) -> None:
        stream = (
            self.spark.readStream.schema(CHANGE_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.event_dir)
        )
        writer = stream.writeStream.foreachBatch(self._handle).option(
            "checkpointLocation", self.checkpoint_dir
        )
        q = writer.trigger(availableNow=True).start() if available_now else writer.start()
        q.awaitTermination()

    def run_batch(self) -> dict:
        events = self.spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(self.event_dir)
        return apply_batch(
            self.spark,
            self.table,
            events,
            batch_id=None,
            monitor=self.monitor,
            collect_stats=self.collect_stats,
        )
