"""DedupIndex: incremental exact dedup of a corpus delta against the
full historical corpus, exactly-once under redelivery."""

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.lake import DedupIndex


@pytest.fixture()
def idx(spark, tmp_path):
    return DedupIndex.create(spark, str(tmp_path / "dedup_idx"), bucket_count=4)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_within_batch_duplicates_keep_smallest_id(spark, idx):
    b = _batch(spark, [(3, "same"), (1, "same"), (2, "other")])
    got = sorted(r["doc_id"] for r in
                 idx.filter_novel(b, "doc_id", "text", batch_id=1).collect())
    assert got == [1, 2]


def test_cross_batch_duplicates_dropped(spark, idx):
    b1 = _batch(spark, [(1, "a"), (2, "b")])
    assert sorted(
        r["doc_id"]
        for r in idx.filter_novel(b1, "doc_id", "text", 1).collect()
    ) == [1, 2]
    b2 = _batch(spark, [(3, "b"), (4, "c"), (5, "a")])
    assert sorted(
        r["doc_id"]
        for r in idx.filter_novel(b2, "doc_id", "text", 2).collect()
    ) == [4]


def test_replay_returns_original_novel_set_and_no_new_version(spark, idx):
    b1 = _batch(spark, [(1, "a"), (2, "b")])
    idx.filter_novel(b1, "doc_id", "text", 1).collect()
    b2 = _batch(spark, [(3, "b"), (4, "c")])
    first = sorted(
        r["doc_id"]
        for r in idx.filter_novel(b2, "doc_id", "text", 2).collect()
    )
    assert first == [4]
    v = idx.table.current_version()
    # redelivery of batch 2: same novel rows, index untouched
    again = sorted(
        r["doc_id"]
        for r in idx.filter_novel(b2, "doc_id", "text", 2).collect()
    )
    assert again == first
    assert idx.table.current_version() == v
    # and a replay of batch 1 as well
    assert sorted(
        r["doc_id"]
        for r in idx.filter_novel(b1, "doc_id", "text", 1).collect()
    ) == [1, 2]
    assert idx.table.current_version() == v


def test_novel_frame_is_stable_after_merge(spark, idx):
    """filter_novel returns a LAZY frame; re-evaluating it after the
    index merge must still see the pre-merge index (pinned read)."""
    b = _batch(spark, [(1, "x"), (2, "y")])
    novel = idx.filter_novel(b, "doc_id", "text", 1)
    # force two evaluations after the merge committed
    assert novel.count() == 2
    assert sorted(r["doc_id"] for r in novel.collect()) == [1, 2]


def test_index_rows_carry_first_provenance(spark, idx):
    b1 = _batch(spark, [(7, "dup"), (3, "dup"), (5, "solo")])
    idx.filter_novel(b1, "doc_id", "text", 1).collect()
    rows = {
        r["first_id"]: r["first_batch"]
        for r in idx.table.read().collect()
    }
    assert rows == {3: 1, 5: 1}
