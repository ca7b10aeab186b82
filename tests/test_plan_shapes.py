"""Physical-plan shape assertions: the properties that keep the
operators 100 TB-viable must be visible in `explain`, not just assumed.

  * pure-column kernels (csv_struct, text analysis, simhash) contain NO
    Python evaluation node — they stay JVM-side;
  * scans under selective queries carry PushedFilters;
  * dimension joins in the datamart query broadcast the small side;
  * the decode UDF appears exactly ONCE in the upsert parse plan (the
    asNondeterministic de-duplication guard keeps holding).
"""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_csv_struct_and_text_are_jvm_only(spark):
    from ton_etl_spark.queries import q_csv_struct, q_text_analyze

    for q in (q_csv_struct, q_text_analyze):
        plan = plan_of(q(spark, SF))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_simhash_is_jvm_only(spark):
    from ton_etl_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(DD.simhash(docs, "doc_id", "text"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "xxhash64" in plan.lower()


def test_filter_pushdown_reaches_scan(spark):
    from ton_etl_spark.queries import q_trade_decimal

    plan = plan_of(q_trade_decimal(spark, SF))
    assert "PushedFilters: [IsNotNull(event_id), LessThan(event_id,2000)]" in plan


def test_region_revenue_broadcasts_dims(spark):
    from ton_etl_spark.queries import q_region_revenue

    plan = plan_of(q_region_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_upsert_decode_udf_evaluated_once(spark):
    from ton_etl_spark.cdc.parsers import parse_file_upserts
    from ton_etl_spark.schemas import CHANGE_EVENT_SCHEMA

    ev = spark.createDataFrame([], CHANGE_EVENT_SCHEMA)
    out = parse_file_upserts(ev).filter(~F.col("_malformed"))
    plan = optimized_of(out)
    # one decode for `content`, not re-inlined into the filter
    assert plan.count("_unpack_zb64") == 1


def test_near_dup_lsh_is_bucketed_join_with_one_arrow_kernel(spark):
    """The banded-LSH near-dup must candidate via a real equi-join on
    (band, signature) — never a nested-loop all-pairs product. The
    signature kernel is the similarity stack's ONE deliberate Arrow
    UDF (batch matmul: interpreted HOFs measured seconds per thousand
    rows at 128 planes); it must appear on each join side and nowhere
    else, and never row-at-a-time Python."""
    from ton_etl_spark.queries import q_embedding_near_dup_lsh

    plan = plan_of(q_embedding_near_dup_lsh(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # vectorized Arrow kernel, never row-at-a-time Python (the subtree
    # containing the one UDF is replicated across join sides / union
    # branches in the plan string, so no exact count)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_session_windows_single_shuffle(spark):
    """Gaps-and-islands sessions: the two window functions and the
    final aggregation all reuse ONE hash partitioning on the key —
    exactly one Exchange in the plan (hashpartitioning(user_id) also
    satisfies the groupBy(user_id, session_id) distribution), and no
    Python anywhere."""
    from ton_etl_spark.queries import q_user_sessions

    plan = plan_of(q_user_sessions(spark, SF))
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_ann_joins_on_cell(spark):
    """IVF search joins corpus to queries on the coarse cell id (hash
    join on _cell), not a cross product; cell assignment is an Arrow
    argmax-matmul kernel (never row-at-a-time Python — interpreted
    HOF centroid dots cost per-row x per-cell x per-dim)."""
    from ton_etl_spark.queries import q_ivf_ann_topk

    plan = plan_of(q_ivf_ann_topk(spark, SF))
    assert "_cell" in plan and "HashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_hash_sampling_is_shuffle_free_and_jvm_only(spark):
    from ton_etl_spark.operators.sampling import hash_sample, hash_split

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sampled = hash_sample(docs, "doc_id", 0.2)
    plan = plan_of(sampled)
    # a deterministic sample is a filter at the scan: no shuffle, no Python
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    split = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    plan = plan_of(split)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_sample_is_shuffle_free_and_jvm_only(spark):
    from pyspark.sql import functions as F
    from ton_etl_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
    plan = plan_of(weighted_sample(docs, "doc_id", w))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_span_dedup_two_shuffles_zero_python(spark):
    from ton_etl_spark.operators.dedup import span_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(span_dedup(docs, "doc_id", "text", 5))
    # one Exchange for the keeper window over span, one for the
    # per-doc reassembly groupBy (partial agg runs map-side)
    assert plan.count("Exchange") == 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_doc_chunks_shuffle_free_and_jvm_only(spark):
    from ton_etl_spark.operators.text import doc_chunks

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(doc_chunks(docs, "doc_id", "text", 8, 4))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corpus_shuffle_avoids_global_data_sort(spark):
    from ton_etl_spark.operators.sampling import corpus_shuffle

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(corpus_shuffle(docs, "doc_id"))
    # ranks are computed per hash-bucket — the DATA is hash-partitioned,
    # never range-partitioned through a global sort; the only
    # single-partition step is the 256-row bucket-offset window
    assert "hashpartitioning(_b" in plan
    assert "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
