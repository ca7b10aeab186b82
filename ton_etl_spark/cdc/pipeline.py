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
from .skew import HotKeyMonitor


def _apply_ddl(table: LakeTable, ddl_rows: list) -> list[str]:
    """Apply schema_change events in LSN order. All three actions are
    metadata-only LakeTable commits and are idempotent under replay."""
    applied = []
    for r in sorted(ddl_rows, key=lambda r: r["lsn"]):
        if r["action"] == "add":
            table.add_column(r["name"], r["type"])
        elif r["action"] == "rename":
            table.rename_column(r["name"], r.get("new_name"))
        elif r["action"] == "widen":
            table.widen_column(r["name"], r["type"])
        applied.append(f"{r['action']}:{r['name']}")
    return applied


def _split_chained(renames: list[dict]) -> tuple[list[dict], list[dict]]:
    """Split renames into chain-free (distributed resolution) and
    chained (driver resolution). A rename is chained iff its old or new
    key collides with another rename's key in this batch — only then
    does sequential ordering between renames matter."""
    from collections import Counter

    olds = Counter((r["repo"], r["path"]) for r in renames)
    news = {(r["repo"], r["new_path"]) for r in renames}
    simple, chained = [], []
    for r in renames:
        old, new = (r["repo"], r["path"]), (r["repo"], r["new_path"])
        if olds[old] > 1 or old in news or new in olds:
            chained.append(r)
        else:
            simple.append(r)
    return simple, chained


def _rename_candidates(
    table: LakeTable,
    in_batch_upserts: DataFrame,
    in_batch_deletes: DataFrame,
    data_cols: list[str],
    old_keys_df: DataFrame,
    buckets: list[int],
) -> DataFrame:
    """All writes that could be a rename's source: this batch's
    upserts/deletes plus the lake state of the old keys (tombstones
    included so a dead key blocks the rename).

    The old-key filter is a broadcast semi-join, NOT a giant `isin`
    literal list — thousands of literals embedded in the plan made
    Catalyst analysis a serial driver-side bottleneck."""
    keys_b = F.broadcast(old_keys_df)
    # batch side arrives PRE-FILTERED to old keys (semi-join on the raw
    # events before the Arrow decode — see apply_batch)
    batch_side = in_batch_upserts.withColumn("_dead", F.lit(False)).unionByName(
        in_batch_deletes.withColumn("_dead", F.lit(True)),
        allowMissingColumns=True,
    )
    lake_side = (
        table.read(buckets=sorted(set(buckets)), include_deleted=True)
        .join(keys_b, on=["repo", "path"], how="left_semi")
        .withColumn("_dead", F.coalesce(F.col("_deleted"), F.lit(False)))
        .drop("_deleted")
    )
    return batch_side.unionByName(lake_side, allowMissingColumns=True)


def _resolve_renames(
    spark: SparkSession,
    table: LakeTable,
    rename_rows: list,
    in_batch_upserts: DataFrame | None,
    in_batch_deletes: DataFrame | None,
    data_cols: list[str],
    old_key_buckets: list[int] | None = None,
    old_keys_df: DataFrame | None = None,
) -> tuple[DataFrame | None, list[dict], int]:
    """Rename resolution.

    A rename moves the old key's current content to the new key — a
    cross-key dependency the pure LWW merge can't express. Semantics
    match the sequential oracle: the winner is the latest write to the
    old key with lsn < rename.lsn, looked up across (a) this batch's
    events, (b) earlier renames in this batch, (c) the lake. A
    missing/dead old key skips the rename (the reference's NonCritical
    missing-parent contract, db.py:98-152 lookups + MIN_MATURITY).

    Scale design: chain-free renames (the overwhelming majority) are
    resolved ENTIRELY in Spark — broadcast the tiny rename set, join it
    against candidate writes, take the max-LSN winner per rename, and
    synthesize delete+insert rows without moving any content through
    the driver. Only in-batch rename CHAINS (old/new key collisions,
    where sequential order between renames matters) fall back to a
    driver loop over a few collected rows.

    Returns (synthetic_df | None, driver_synthetic_rows, n_chained).
    """
    # dedup duplicate deliveries by lsn
    seen, renames = set(), []
    for r in sorted(rename_rows, key=lambda r: r["lsn"]):
        if r["lsn"] in seen or r["new_path"] is None:
            continue
        seen.add(r["lsn"])
        renames.append(r)
    if not renames:
        return None, [], 0

    simple, chained = _split_chained(renames)
    if old_keys_df is None:
        old_keys_df = spark.createDataFrame(
            sorted({(r["repo"], r["path"]) for r in renames}),
            "repo string, path string",
        )
    if old_key_buckets is None:
        old_key_buckets = [
            r["_b"]
            for r in old_keys_df.withColumn("_b", table.bucket_expr())
            .select("_b").distinct().collect()
        ]
    cand = _rename_candidates(
        table, in_batch_upserts, in_batch_deletes, data_cols,
        old_keys_df, old_key_buckets,
    )

    synth_df = None
    if simple:
        ren_df = F.broadcast(
            spark.createDataFrame(
                [(r["repo"], r["path"], r["lsn"], r["new_path"]) for r in simple],
                "repo string, path string, _rlsn long, _new_path string",
            )
        )
        joined = cand.join(ren_df, on=["repo", "path"]).filter(
            F.col("lsn") < F.col("_rlsn")
        )
        winner = joined.groupBy("repo", "path", "_rlsn", "_new_path").agg(
            F.max(
                F.struct(
                    F.col("lsn").alias("_l"),
                    F.col("_dead").alias("_dead"),
                    *[F.col(c).alias(c) for c in data_cols],
                )
            ).alias("_w")
        ).filter(~F.col("_w._dead"))
        synth_del = winner.select(
            "repo", "path", F.col("_rlsn").alias("lsn"), F.lit("d").alias("op")
        )
        synth_ups = winner.select(
            "repo",
            F.col("_new_path").alias("path"),
            F.col("_rlsn").alias("lsn"),
            F.lit("u").alias("op"),
            *[F.col(f"_w.{c}").alias(c) for c in data_cols],
        )
        synth_df = synth_del.unionByName(synth_ups, allowMissingColumns=True)

    driver_rows: list[dict] = []
    if chained:
        ckeys_df = F.broadcast(
            spark.createDataFrame(
                sorted({(r["repo"], r["path"]) for r in chained}),
                "repo string, path string",
            )
        )
        rows = cand.join(ckeys_df, on=["repo", "path"], how="left_semi").collect()
        by_key: dict[tuple, list] = {}
        for row in rows:
            d = row.asDict()
            by_key.setdefault((d["repo"], d["path"]), []).append(
                (d["lsn"], d["_dead"], d)
            )
        overlay: dict[tuple, tuple] = {}  # key -> (lsn, alive, row|None)
        for r in chained:
            L, old = r["lsn"], (r["repo"], r["path"])
            best = None  # (lsn, alive, row)
            for lsn, dead, row in by_key.get(old, []):
                if lsn < L and (best is None or lsn > best[0]):
                    best = (lsn, not dead, row)
            ov = overlay.get(old)
            if ov is not None and ov[0] < L and (best is None or ov[0] > best[0]):
                best = ov
            if best is None or not best[1]:
                continue
            new_key = (r["repo"], r["new_path"])
            moved = {c: best[2].get(c) for c in data_cols}
            moved.update(repo=new_key[0], path=new_key[1], lsn=L, op="u")
            driver_rows.append(
                {"repo": old[0], "path": old[1], "lsn": L, "op": "d"}
            )
            driver_rows.append(moved)
            overlay[old] = (L, False, None)
            overlay[new_key] = (L, True, moved)
    return synth_df, driver_rows, len(chained)


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
    timings: dict[str, int] = {}

    def mark(name: str, since: float) -> float:
        timings[name] = timings.get(name, 0) + int((time.time() - since) * 1000)
        return time.time()

    m = table.manifest()
    if batch_id is not None and batch_id <= m["batch_id"]:
        return {"skipped": True, "batch_id": batch_id}
    # 1. control-plane events (DDL + renames) in ONE small collect —
    #    schema_change events are global barriers in the log (WAL DDL
    #    is totally ordered), so every data event in this batch
    #    parses against the post-DDL schema.
    t = time.time()
    # ONE aggregation job yields the whole control plane AND the batch
    # stats: DDL + rename rows (with the bucket ids of old and new keys
    # riding along), plus affected buckets / LSN range / row bound from
    # the data events. Per-batch driver-side job latency is the serial
    # floor of the pipeline — every saved job counts.
    is_ctl = F.col("event_type").isin("schema_change", "file_rename")
    is_data = F.col("event_type") != "schema_change"
    bucket = table.bucket_expr(m)
    bucket_new = F.pmod(
        F.hash(F.col("repo"), F.get_json_object("payload", "$.new_path")),
        F.lit(m["bucket_count"]),
    ).cast("int")
    row0 = events.agg(
        F.count(F.when(is_data, 1)).alias("n"),
        F.min(F.when(is_data, F.col("lsn"))).alias("lsn_min"),
        F.max(F.when(is_data, F.col("lsn"))).alias("lsn_max"),
        F.collect_set(F.when(is_data, bucket)).alias("buckets"),
        F.collect_list(
            F.when(
                is_ctl,
                F.struct(
                    F.col("lsn").alias("lsn"),
                    F.col("event_type").alias("event_type"),
                    F.col("repo").alias("repo"),
                    F.col("path").alias("path"),
                    # full payload only for the few DDL rows; renames ship
                    # just the extracted new_path (collect goes through the
                    # single driver thread — bytes matter)
                    F.when(
                        F.col("event_type") == "schema_change", F.col("payload")
                    ).alias("payload"),
                    F.get_json_object("payload", "$.new_path").alias("new_path"),
                    bucket.alias("_bucket"),
                    bucket_new.alias("_bucket_new"),
                ),
            )
        ).alias("ctl"),
    ).collect()[0]
    ctl = row0["ctl"]
    ddl = [
        {**json.loads(r["payload"]), "lsn": r["lsn"]}
        for r in ctl
        if r["event_type"] == "schema_change" and r["payload"]
    ]
    applied_ddl = _apply_ddl(table, ddl)
    t = mark("control_ms", t)

    cols = table.schema().fieldNames()
    lang_col = "language" if "language" in cols else "lang"
    reg = registry or default_registry(lang_col)
    data_cols = [c for c in cols if c not in ("repo", "path", "lsn")]

    precomputed = {
        "n_upper": row0["n"],
        "lsn_min": row0["lsn_min"],
        "lsn_max": row0["lsn_max"],
        "buckets": list(row0["buckets"])
        + [r["_bucket_new"] for r in ctl if r["event_type"] == "file_rename"],
    }

    # 2. vectorized per-event-type parse. NOT cached: the merge decodes
    #    the batch exactly once inside its write pipeline; the rename
    #    lookup decodes only the pre-filtered old-key rows.
    ups = reg.route(events, reg.get("file_upsert"))
    ups_ok = ups.filter(~F.col("_malformed")).drop("_malformed")
    dels = reg.route(events, reg.get("file_delete"))
    ren = [
        {
            "repo": r["repo"],
            "path": r["path"],
            "lsn": r["lsn"],
            "new_path": r["new_path"],
        }
        for r in ctl
        if r["event_type"] == "file_rename"
    ]
    ren_buckets = [
        r["_bucket"] for r in ctl if r["event_type"] == "file_rename"
    ]

    if ren:
        old_keys_df = spark.createDataFrame(
            sorted({(r["repo"], r["path"]) for r in ren}),
            "repo string, path string",
        )
        # semi-join the RAW events before the Arrow decode — a join
        # cannot be pushed below the UDF projection the way a literal
        # filter can, so filter first, decode the survivors only
        ev_old = events.join(
            F.broadcast(old_keys_df), on=["repo", "path"], how="left_semi"
        )
        ups_ren = reg.route(ev_old, reg.get("file_upsert")).filter(
            ~F.col("_malformed")
        ).drop("_malformed")
        dels_ren = reg.route(ev_old, reg.get("file_delete"))
    else:
        old_keys_df = ups_ren = dels_ren = None
    synth_df, driver_rows, n_chained = _resolve_renames(
        spark, table, ren, ups_ren, dels_ren, data_cols,
        old_key_buckets=ren_buckets, old_keys_df=old_keys_df,
    )
    t = mark("rename_ms", t)
    updates = ups_ok.unionByName(dels, allowMissingColumns=True)
    if synth_df is not None:
        updates = updates.unionByName(synth_df, allowMissingColumns=True)
    if driver_rows:
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
            [tuple(s.get(n) for n in names) for s in driver_rows], sschema
        )
        updates = updates.unionByName(sdf, allowMissingColumns=True)

    # 3. hot-key detection -> salted dedup
    salt = monitor.salt_for(events) if monitor is not None else None
    t = mark("salt_ms", t)

    stats = {}
    if collect_stats:
        stats = {
            "n_events": events.count(),
            "n_malformed": ups.filter(F.col("_malformed")).count(),
            "n_renames": len(ren),
            "n_chained_renames": n_chained,
        }
        t = mark("stats_ms", t)

    result = merge_into(
        table, updates, batch_id=batch_id, salt=salt, precomputed=precomputed
    )
    mark("merge_ms", t)
    timings["total_ms"] = int((time.time() - t0) * 1000)
    result.update(ddl=applied_ddl, salt=salt, timings=timings, **stats)
    return result


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
        self.batch_results: list[dict] = []
        self.fail_after: int | None = None  # test hook: crash injection

    def _handle(self, batch_df: DataFrame, batch_id: int) -> None:
        res = apply_batch(
            self.spark,
            self.table,
            batch_df,
            batch_id=batch_id,
            monitor=self.monitor,
            collect_stats=self.collect_stats,
        )
        self.batch_results.append(res)
        self.batches_applied += 1
        if self.fail_after is not None and self.batches_applied >= self.fail_after:
            # simulate a crash AFTER the sink committed but BEFORE the
            # checkpoint recorded the batch — the exactly-once razor's edge
            raise RuntimeError("injected crash after sink commit")

    def run_streaming(
        self, available_now: bool = True, metrics_path: str | None = None
    ) -> None:
        listener = None
        if metrics_path is not None:
            from ..streaming.metrics import attach_metrics_listener

            listener = attach_metrics_listener(self.spark, metrics_path)
        stream = (
            self.spark.readStream.schema(CHANGE_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.event_dir)
        )
        writer = stream.writeStream.foreachBatch(self._handle).option(
            "checkpointLocation", self.checkpoint_dir
        )
        q = writer.trigger(availableNow=True).start() if available_now else writer.start()
        try:
            q.awaitTermination()
        finally:
            if listener is not None:
                self.spark.streams.removeListener(listener)

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
