"""Train/eval decontamination: flag evaluation documents whose word
n-grams leak from the training split (the n-gram-overlap check the
GPT-3 paper ran before reporting benchmark numbers — Brown et al.
2020, appendix C; public paper).

Shape: per eval doc, the fraction of its DISTINCT n-gram shingles that
appear anywhere in the train split. A doc above the threshold is
contaminated — it (or a near-copy) leaked across the split boundary.

Scale design (100 TB):
  * the join key is the shingle — one hash shuffle over the shingle
    space, the canonical decontamination shape; the train side is
    `distinct()`ed first so partial aggregation shrinks it map-side.
  * candidates carry (doc_id, shingle) only; text never shuffles.
  * `hash_shingles=True` replaces the shingle string with xxhash64
    before the shuffle — 8 bytes instead of ~40 per shingle, the
    100 TB path (engine-specific hash, so the DuckDB oracle runs the
    exact-string variant; a hash collision can only ADD a false hit
    at ~2^-64 per pair).
  * `bloom_prefilter=True` builds a deterministic Bloom filter over
    the train shingles (operators/bloom.py) and drops eval shingles
    that are definitely not in train BEFORE they enter the shuffle —
    the extreme-scale path when the eval side is also huge. Bloom
    filters never false-negative, so the output is byte-identical to
    the plain join (the exact join still verifies every survivor);
    the filter is a bounded plan constant, never a silent cap
    (build_bloom warns and skips above its bit bound).

Split assignment reuses operators.sampling.hash_split, so the exact
split the curation pipeline trains on is the one checked for leakage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import word_ngrams


def decontaminate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    train_split: str = "train",
    ngram: int = 5,
    threshold: float = 0.3,
    hash_shingles: bool = False,
    bloom_prefilter: bool = False,
    bloom_bits_per_key: int = 10,
) -> DataFrame:
    """Per NON-train document: doc_id, split, n_shingles (distinct),
    n_hit (of those, how many occur in any train doc), contam_frac
    (6dp), is_contaminated (0/1 int — int not bool so the value is
    engine-portable byte-for-byte).

    Docs too short to have a single n-gram report n_shingles = 0 and
    are never contaminated. The flag compares the RAW fraction (not
    the rounded display column) against the threshold.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # staged projection: materialize the shingle array once per row
    # (HOF lambdas evaluate interpreted — see repetition_metrics)
    base = docs.select(F.col(id_col), F.col(split_col), toks.alias("_toks"))
    sh = base.select(
        id_col,
        split_col,
        F.array_distinct(word_ngrams(F.col("_toks"), ngram)).alias("_sh"),
    )
    key = F.col("shingle")
    if hash_shingles:
        key = F.xxhash64("shingle")
    # explode_OUTER on purpose, even though the null rows it adds are
    # filtered right back out: plain explode triggers
    # InferFiltersFromGenerate, which pushes an inferred
    # `size(shingles) > 0` below the staging projections — inlining the
    # whole shingle-build expression into a scan-level filter that
    # re-splits the text per lambda element per row (measured 12x
    # end-to-end). The isNotNull filter sits above the Generate (its
    # input attribute is created there), so nothing can push it down.
    train_keys = (
        sh.filter(F.col(split_col) == train_split)
        .select(F.explode_outer("_sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .select(key.alias("k"))
        .distinct()
    )
    ev = sh.filter(F.col(split_col) != train_split).select(
        id_col, split_col, F.size("_sh").cast("long").alias("n_shingles"), "_sh"
    )
    ev_pairs = (
        ev.select(id_col, F.explode_outer("_sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .select(id_col, key.alias("k"))
    )
    if bloom_prefilter:
        from .bloom import build_bloom

        # the train side is distinct'ed and (in the steady decontam
        # case) far smaller than the eval shingle stream: spend one
        # bounded bit-array build to keep definite non-members out of
        # the shuffle. None (over the bit bound) = plain-join fallback.
        bf = build_bloom(train_keys, "k", bits_per_key=bloom_bits_per_key)
        if bf is not None:
            ev_pairs = ev_pairs.filter(bf.contains(F.col("k")))
    hits = (
        ev_pairs.join(train_keys, "k", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    joined = (
        ev.drop("_sh")
        .join(hits, id_col, "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)).cast("long"))
    )
    frac = F.col("n_hit") / F.greatest(F.col("n_shingles"), F.lit(1))
    return joined.select(
        id_col,
        split_col,
        "n_shingles",
        "n_hit",
        F.round(frac, 6).alias("contam_frac"),
        (frac >= threshold).cast("int").alias("is_contaminated"),
    )
