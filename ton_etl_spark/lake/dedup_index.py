"""Incremental exact-dedup index: dedup a corpus DELTA against the
full historical corpus, exactly-once.

The batch curation operators (`operators.dedup`) dedup a corpus that is
fully in hand. A CDC-fed corpus is never fully in hand: each micro-batch
must be deduplicated against everything ever ingested WITHOUT rescanning
100 TB per batch. `DedupIndex` does this with a LakeTable keyed by
content sha256 — the same bucketed, manifest-committed, exactly-once
storage layer the main pipeline uses — so the membership join is
key-bucket-aligned and the index inherits time travel, vacuum, and the
change feed.

Reference analogue: none (the reference re-inserts and lets Postgres
ON CONFLICT drop duplicates — per-row, single-node, db.py:249-269).
This is the distributed re-expression: set-at-a-time anti-join against
a bucketed index table plus an idempotent merge.

Replay semantics (the part a naive anti-join gets wrong): if a batch is
REDELIVERED after its merge committed, an anti-join would now find all
its shas already present and return an EMPTY novel set — downstream
consumers fed by the first delivery and replayers would disagree. The
index therefore records (first_id, first_batch) per sha, and a replayed
batch recomputes its novel set FROM THE INDEX (rows whose first_batch
== this batch and first_id == this row), returning exactly the original
rows. Combined with the lake's batch_id commit guard, `filter_novel` is
deterministic under at-least-once redelivery.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window, functions as F, types as T

from .merge import append_insert
from .table import LakeTable

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("content_sha", T.StringType(), False),
        T.StructField("first_id", T.LongType(), True),
        T.StructField("first_batch", T.LongType(), True),
        # version field (LakeTable requires it in the schema); a sha is
        # written once and never updated, so its LSN is its first_batch
        T.StructField("lsn", T.LongType(), True),
    ]
)


class DedupIndex:
    """A content-sha dedup index over a LakeTable.

    `create(spark, root)` / `open(spark, root)`, then per micro-batch:
    `novel = idx.filter_novel(batch_df, id_col, content_col, batch_id)`
    — returns the batch rows whose content has never been seen before
    (within-batch duplicates collapse to the smallest id), and commits
    those shas to the index in the same call, guarded by batch_id.
    """

    def __init__(self, table: LakeTable):
        self.table = table
        # previous batch's persisted novel-key set (see filter_novel);
        # retired at the next call so at most one delta's keys are cached
        self._novel_cache: DataFrame | None = None

    @classmethod
    def create(cls, spark, root: str, bucket_count: int = 16) -> "DedupIndex":
        return cls(
            LakeTable.create(
                spark,
                root,
                INDEX_SCHEMA,
                key_fields=["content_sha"],
                version_field="lsn",
                bucket_count=bucket_count,
            )
        )

    @classmethod
    def open(cls, spark, root: str) -> "DedupIndex":
        return cls(LakeTable(spark, root))

    def filter_novel(
        self,
        df: DataFrame,
        id_col: str,
        content_col: str,
        batch_id: int,
    ) -> DataFrame:
        """Rows of `df` whose sha256(content) is globally novel.

        Within-batch duplicates keep the smallest id (one hash shuffle
        on the sha); cross-batch duplicates are dropped by an anti-join
        against the index pinned to its PRE-MERGE version (the returned
        DataFrame is lazy — an unpinned read would see the just-merged
        shas and evaluate to empty). The novel shas are merged into the
        index before returning, exactly-once by batch_id.

        Scale shape: one shuffle on the sha for the window, one join
        against the bucket-aligned index, one bucket-aligned merge
        write. The full corpus is never rescanned.
        """
        m = self.table.manifest()
        sha = F.sha2(F.col(content_col).cast("string"), 256)
        w = Window.partitionBy("_sha").orderBy(F.col(id_col).asc())
        cand = (
            df.withColumn("_sha", sha)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if batch_id <= m["batch_id"]:
            # replay: this batch's merge already committed. Its novel
            # set is recorded in the index as first_batch provenance —
            # recompute it from there so redelivery returns the exact
            # original rows (an anti-join would return none).
            firsts = self.table.read().filter(
                F.col("first_batch") == batch_id
            )
            return (
                cand.join(
                    firsts,
                    (cand["_sha"] == firsts["content_sha"])
                    & (cand[id_col] == firsts["first_id"]),
                    "left_semi",
                )
                .drop("_sha")
            )
        # pin to the pre-merge version: `novel` is evaluated lazily by
        # the caller, after the merge below bumps the table
        existing = self.table.read(version=m["version"]).select("content_sha")
        # The novel-key set feeds two actions (the merge below and the
        # caller's use of the returned rows) — persist the (sha, id)
        # pairs ONLY, never the content, so the window + index
        # anti-join run once per delta instead of per consumer.
        novel_keys = (
            cand.select("_sha", F.col(id_col))
            .join(existing, F.col("_sha") == existing["content_sha"],
                  "left_anti")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if self._novel_cache is not None:
            self._novel_cache.unpersist()
        self._novel_cache = novel_keys
        updates = novel_keys.select(
            F.col("_sha").alias("content_sha"),
            F.col(id_col).cast("long").alias("first_id"),
            F.lit(batch_id).cast("long").alias("first_batch"),
            F.lit(batch_id).cast("long").alias("lsn"),
            F.lit("c").alias("op"),
        )
        # fast-append: every key in `updates` is strictly new (anti-joined
        # against the index above), so the Iceberg-style append path
        # applies — one write job, no stats pass, no rewrite shuffle
        append_insert(self.table, updates, batch_id=batch_id)
        # re-derive the rows from df by (id, sha) so the cache holds
        # keys only; the pair join keeps semantics exact even for
        # pathological inputs with duplicate ids
        return (
            df.withColumn("_sha", sha)
            .join(novel_keys, on=[id_col, "_sha"], how="left_semi")
            .drop("_sha")
        )
