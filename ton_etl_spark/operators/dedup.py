"""Deduplication operators for large-scale corpus curation.

Beyond the reference's key-based dedup (EXCEPT / row_number — K6/K7),
a training-data pipeline needs content dedup at document granularity:

  * exact            — sha256 grouping (JVM-side, zero Python)
  * near-dup MinHash — shingle -> minhash signature -> LSH band join
  * SimHash          — 64-bit locality-sensitive fingerprint
  * n-gram Jaccard   — exact set similarity for candidate verification

Scale design: everything is expressed as explode/groupBy/join pipelines
whose shuffles are on (doc, band) or (band_hash) keys — the classic
LSH-bucketing layout that survives 100 TB corpora. There is ZERO Python
in any kernel: MinHash and SimHash both hash with xxhash64 (JVM,
codegen), and SimHash's bit votes are one hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents: (content_sha, n_docs, doc_ids)."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


def _tokens(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Word k-shingles per document (distinct), via JVM array functions."""
    toks = _tokens(text_col)
    n = F.size(toks)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return df.select(F.col(id_col), F.array_distinct(sh).alias("shingles"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_perm: int = 16, k: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """id -> array<long> minhash signature. Permutation i is
    min(xxhash64(i, shingle)) — deterministic, JVM-vectorized.

    `shingles_df` — optional precomputed (id, shingles) frame (typically
    persisted by the caller) so a pipeline that ALSO needs the shingle
    sets (e.g. exact-Jaccard verification) tokenizes each document once
    instead of once per consumer."""
    sh = shingles_df if shingles_df is not None else shingles(
        df, id_col, text_col, k
    )
    exploded = sh.select(id_col, F.explode("shingles").alias("_s"))
    # ONE SQL string parsed JVM-side instead of ~80 Column-operator py4j
    # round trips per build (the simhash kernel's lesson, dedup.py
    # simhash(): driver-side expression construction is re-paid on
    # EVERY fresh DataFrame — it dominated the incremental index's
    # per-batch driver floor). Semantics identical: SQL integer
    # literals are IntegerType, same as F.lit(i).
    sig_expr = "array(" + ", ".join(
        f"min(xxhash64({i}, _s))" for i in range(n_perm)
    ) + ")"
    return exploded.groupBy(id_col).agg(F.expr(sig_expr).alias("signature"))


def band_rows(
    sig: DataFrame, id_col: str, n_perm: int, bands: int
) -> DataFrame:
    """Explode a signature frame (id, signature array<long>) into LSH
    band rows (id, band, band_hash) — the unit the band join and the
    incremental near-dup index (lake/neardup_index.py) both key on."""
    rpb = n_perm // bands
    # single JVM-parsed expression (see minhash_signatures on why);
    # byte-identical band hashes to the former nested-Column build
    e = (
        f"explode(transform(sequence(0, {bands - 1}), "
        f"b -> named_struct("
        f"'band', b, "
        f"'band_hash', xxhash64(concat_ws(':', "
        f"transform(slice(signature, b * {rpb} + 1, {rpb}), "
        f"x -> cast(x AS string))))))) AS b"
    )
    return sig.select(F.col(id_col), F.expr(e)).select(
        id_col, "b.band", "b.band_hash"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH: docs agreeing on any band are candidate near-dups.
    Shuffle key is (band_idx, band_hash) — bounded buckets, no O(n^2)."""
    sig = minhash_signatures(df, id_col, text_col, n_perm, k)
    banded = band_rows(sig, id_col, n_perm, bands)
    a, bb = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            bb,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_perm: int = 16,
    bands: int = 16,
    k: int = 1,
) -> DataFrame:
    """The full MinHash dedup pipeline: LSH candidates -> exact k-gram
    Jaccard verification -> pairs with jaccard >= threshold. Precision
    is structural (every emitted pair is exactly verified); recall is
    the LSH candidate recall, (1 - (1 - t^r)^b) at true similarity t
    with b bands of r = n_perm/bands rows — the defaults (r=1, b=16)
    make the miss probability at t=0.8 about (1-0.8)^16 ~ 7e-12 per
    pair, i.e. the output equals the exact all-pairs answer in any run
    you will ever observe (and deterministically so for a fixed corpus:
    xxhash64 is seeded). Single-row bands trade more candidates for
    that recall; tune (n_perm, bands) per corpus similarity profile.

    Scale shape: candidates carry ONLY ids out of the band join; the
    shingle sets are re-attached afterwards by two id-equi-joins, so
    the wide text columns never enter the LSH shuffle."""
    cand = lsh_candidate_pairs(df, id_col, text_col, n_perm, bands, k)
    sh = shingles(df, id_col, text_col, k)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("_sa"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    union = F.size(F.array_union(F.col("_sa"), F.col("_sb")))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.0,
    k: int = 1,
) -> DataFrame:
    """Exact word-k-gram Jaccard over all pairs (verification / small-N
    path; pair with lsh_candidate_pairs for the 100 TB path)."""
    sh = shingles(df, id_col, text_col, k)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    return (
        a.crossJoin(b)
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, portable_hash: bool = False
) -> DataFrame:
    """id -> 64-bit SimHash (signed long), computed ENTIRELY JVM-side:
    explode tokens -> 64-bit token hash -> 64 conditional-sum bit votes
    in one hash aggregation (map-side combine + codegen) -> assemble the
    signature from the vote signs. Replaces a per-token Python blake2b
    loop that was the slowest kernel in the repo. Deterministic across
    runs and parallelism levels (token hashes are seeded, votes are
    sums).

    `portable_hash=False` (default) uses xxhash64 — fastest, Spark-only.
    `portable_hash=True` derives the 64 bits from md5(token) (two 32-bit
    halves of the hex digest), which ANY engine with md5 reproduces
    bit-for-bit — this is what makes the simhash family ORACLE-CHECKABLE
    against DuckDB (queries.py simhash_near_dup): same tokens, same md5,
    same votes, same signature, so cross-engine equality is structural.
    Cost: md5+conv per token vs one xxhash64 — still JVM codegen, no
    Python."""
    # Null-text docs must still get a signature (the old kernel's
    # behavior); a null token array would explode to zero rows and the
    # document would silently vanish from the output.
    toks = F.coalesce(_tokens(text_col), F.array(F.lit("")))
    tok = df.select(F.col(id_col), F.explode(toks).alias("_t"))
    if portable_hash:
        m = F.md5(F.col("_t"))
        # hex[1:8] -> bits 32..63, hex[9:16] -> bits 0..31 (conv stays
        # < 2^32 so the ANSI string->long cast can never overflow;
        # shiftleft(,32) is a bit op — wraps into the sign, never throws)
        hi = F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(m, 9, 8), 16, 10).cast("long")
        h = F.shiftleft(hi, 32).bitwiseOR(lo)
    else:
        h = F.xxhash64(F.col("_t"))
    ex = tok.select(F.col(id_col), h.alias("_h"))
    # Packed bit-vote lanes: 64 separate sum buffers push the aggregate
    # past the whole-stage-codegen field limit (the plan falls back to
    # interpreted eval — the r2 5.0 s regression was almost entirely that
    # compile/interpret overhead). Pack the per-bit ones-counts into 32
    # longs of two 32-bit lanes (lane capacity 2^31 occurrences per doc —
    # unreachable) plus one total-count buffer: 33 buffers keeps codegen
    # alive and a single shuffle on id. Bit i of the signature is set iff
    # ones_i > n/2, i.e. 2*ones_i - n > 0 — the exact vote rule.
    # The whole vote/assemble expression is built as SQL strings parsed
    # JVM-side in ONE call each: composing it from ~400 Column operators
    # cost ~2 s of py4j round-trips PER QUERY BUILD (measured — the bulk
    # of the r2 "5 s simhash" was driver-side expression construction,
    # re-paid on every fresh DataFrame, not execution).
    votes = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.expr(
                f"sum((shiftrightunsigned(_h, {2 * j}) & 1) + "
                f"((shiftrightunsigned(_h, {2 * j + 1}) & 1) * 4294967296))"
            ).alias(f"_p{j}")
            for j in range(32)
        ],
    )

    def ones(i):
        lane = f"_p{i // 2}"
        if i % 2:
            lane = f"shiftrightunsigned({lane}, 32)"
        return f"({lane} & 4294967295)"

    terms = [f"if({ones(i)} * 2 > _n, {1 << i}L, 0L)" for i in range(63)]
    # bit 63 would overflow a positive long literal: add Long.MIN_VALUE
    # (x >= 0 plus MIN_VALUE lands in [-2^63, -1] — wraps, never throws)
    terms.append(f"if({ones(63)} * 2 > _n, -9223372036854775808L, 0L)")
    sig = F.expr(" + ".join(terms))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def _simhash_blocks(sig, n_blocks: int):
    """Split the 64-bit signature into `n_blocks` disjoint bit blocks:
    (block_idx, block_value) structs. Pigeonhole: two signatures within
    hamming distance n_blocks-1 agree EXACTLY on at least one block."""
    base, extra = divmod(64, n_blocks)
    out, start = [], 0
    for i in range(n_blocks):
        width = base + (1 if i < extra else 0)
        if width >= 64:
            # n_blocks=1 (max_hamming=0): the "block" is the whole
            # signature — (1<<64)-1 would overflow LongType at plan time.
            val = sig
        else:
            mask = (1 << width) - 1
            val = F.shiftrightunsigned(sig, start).bitwiseAND(F.lit(mask))
        out.append(F.struct(F.lit(i).alias("block"), val.alias("val")))
        start += width
    return F.array(*out)


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_blocks: int | None = None,
    portable_hash: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance with GUARANTEED
    candidate recall: the signature is split into max_hamming+1 disjoint
    bit blocks (Charikar-style multi-table LSH); any pair within the
    radius shares at least one exact block (pigeonhole), so bucketing on
    (block_idx, block_value) finds 100% of qualifying pairs while the
    shuffle key space stays ~2^(64/(k+1)) per block — no O(n^2) stage.
    (The previous single-prefix bucketing both missed pairs whose
    differing bits fell in the prefix AND collapsed to 2^prefix buckets.)
    """
    n_blocks = n_blocks or (max_hamming + 1)
    s = simhash(df, id_col, text_col, portable_hash=portable_hash)
    blocks = s.select(
        F.col(id_col),
        "simhash",
        F.explode(_simhash_blocks(F.col("simhash"), n_blocks)).alias("b"),
    ).select(id_col, "simhash", "b.block", "b.val")
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.block") == F.col("b.block"),
                F.col("a.val") == F.col("b.val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("_sa"),
            F.col("b.simhash").alias("_sb"),
        )
        .distinct()  # a pair may match in several blocks
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return pairs.select(
        "id_a", "id_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def doc_spans(
    df: DataFrame, id_col: str, text_col: str, span_words: int = 5
) -> DataFrame:
    """Explode each document into fixed-width word spans (C4-style
    span units): tokens grouped into consecutive `span_words`-word
    chunks, each tagged with its 0-based position. The splitting is a
    pure column expression (split / sequence / slice / array_join —
    all codegen'd) chosen so the identical chunking is one line of
    ANSI SQL for the oracle (list slicing over regexp_split_to_array).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(span_words)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * span_words + 1, span_words), " "
        ),
    )
    ex = df.select(
        F.col(id_col), F.posexplode(spans).alias("pos", "span")
    )
    return ex.select(id_col, F.col("pos").cast("long").alias("pos"), "span")


def span_dedup(
    df: DataFrame, id_col: str, text_col: str, span_words: int = 5
) -> DataFrame:
    """C4-style span-level exact dedup with order-preserving
    reassembly (reference analogue: none — this is the C4/mC4
    three-sentence dedup rule re-expressed over fixed word windows,
    a first-class LLM-curation operator).

    Rule: a span occurrence survives iff it is the FIRST occurrence of
    that exact span corpus-wide, ordered by (doc_id, pos); later
    occurrences are dropped and the document is reassembled from its
    surviving spans in original order.

    Output per document: `n_spans`, `n_spans_kept`, and `dedup_sha`
    (sha256 of the reassembled text; empty-string sha when every span
    was dropped) — compact, engine-portable columns the DuckDB oracle
    reproduces exactly.

    Scale shape: two shuffles — one window over the span value to pick
    keepers (at 100 TB you would window over xxhash64(span) to shrink
    the shuffle key and salt-split any megaspan; the raw span is used
    here because the oracle must agree bit-for-bit), then one groupBy
    doc to reassemble. collect_list is NOT order-stable, so reassembly
    sorts struct(pos, span) arrays post-collect (array_sort is JVM-
    side). No Python anywhere.
    """
    from pyspark.sql import Window as W

    s = doc_spans(df, id_col, text_col, span_words)
    w = W.partitionBy("span").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    k = s.select(
        id_col, "pos", "span",
        (F.row_number().over(w) == 1).alias("keep"),
    )
    kept_txt = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("keep"), F.struct("pos", "span"))
                )
            ),
            lambda x: x.span,
        ),
        " ",
    )
    return (
        k.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("keep").cast("long")).alias("n_spans_kept"),
            F.sha2(kept_txt, 256).alias("dedup_sha"),
        )
        .select(
            id_col, "n_spans", "n_spans_kept", "dedup_sha",
        )
    )
