"""Quantized n-gram language-model scoring — the CCNet-style corpus
quality filter (Wenzek et al. 2020 score documents with a KenLM
n-gram model and keep the low-perplexity head) re-expressed so that
the score is INTEGER-EXACT and therefore bit-identical across
engines, partitionings, and cluster sizes.

The quantization: a gram seen cnt times in a reference corpus of V
total gram occurrences has information content -log2(cnt/V) bits.
We charge the whole-bit Shannon cost

    cost(g) = bitlen(V) - bitlen(cnt(g))        (seen grams)
    cost(g) = bitlen(V) + 1                     (out-of-vocabulary)

where bitlen(x) = floor(log2 x) + 1 = length of the binary rendering
of x — computable EXACTLY in both Spark (`length(bin(x))`) and DuckDB
(`length(printf('%b', x))`), no floating-point log anywhere. The
cost is within ±1 bit of the real -log2 p, which is all a
rank-and-threshold quality filter uses, and integer addition is
associative, so `sum(cost)` is deterministic at any parallelism —
the same fixed-point discipline as queries.q_curation_pipeline.
A document's score is avg bits per gram (lower = more reference-like,
the analogue of low perplexity).

The same machinery with per-class models is a multinomial Naive
Bayes classifier: score a document under each class's gram model and
take the argmin-bits class (ties broken by class name). With
class = `lang` over word unigrams this is the CCNet/fastText
language-ID step.

Scale shape: model building is one explode + groupBy (map-side
combined); scoring is one explode + one equi-join on the gram (the
model side broadcasts while it fits, AQE decides) + one groupBy on
the doc id. Zero Python, zero floating point until the final
display-rounding division. At 100 TB the model table is itself
distributed — nothing here collects it.

Reference analogue: none (the reference pipeline has no content
quality scoring); this is LLM-training-data curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .text import word_ngrams, ws_tokens


def _grams(df: DataFrame, id_col: str, text_col: str, n: int,
           *extra_cols: str) -> DataFrame:
    """(id, *extra, gram) — one row per n-gram occurrence.

    STAGED like text.repetition_metrics: the token array is aliased in
    its own projection so it materializes once per row. Inlining it
    would re-run the regex split inside every element_at of the
    word_ngrams lambda (HOFs evaluate interpreted) — measured ~8x on
    the bigram explode at sf0.1."""
    staged = df.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        ws_tokens(F.lower(F.col(text_col))).alias("_toks"),
    )
    return staged.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.explode(word_ngrams(F.col("_toks"), n)).alias("gram"),
    )


def train_ngram_lm(df: DataFrame, id_col: str, text_col: str,
                   n: int = 2) -> DataFrame:
    """(gram, cnt) occurrence counts over the reference corpus."""
    return (
        _grams(df, id_col, text_col, n)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _with_costs(model: DataFrame) -> tuple[DataFrame, DataFrame]:
    """-> (per-gram cost table (gram, bits), 1-row totals (oov_bits)).

    bitlen via length(bin(x)); the single-row total joins in by
    crossJoin (broadcast of an aggregate row — no driver collect)."""
    tot = model.agg(
        F.length(F.bin(F.sum("cnt"))).cast("long").alias("_vbits")
    )
    costs = model.crossJoin(F.broadcast(tot)).select(
        "gram",
        (F.col("_vbits") - F.length(F.bin(F.col("cnt")))).cast("long").alias("bits"),
    )
    oov = tot.select((F.col("_vbits") + 1).alias("oov_bits"))
    return costs, oov


def lm_bitcost(df: DataFrame, id_col: str, text_col: str,
               model: DataFrame, n: int = 2) -> DataFrame:
    """Score every document of `df` under `model` (from
    train_ngram_lm): -> (id, n_grams, total_bits, avg_bits). Documents
    with fewer than n tokens get n_grams=0, total_bits=0, avg_bits 0.

    avg_bits = round(total_bits / n_grams, 6) — an exact-integer ratio
    rounded once, the cross-engine-stable rendering."""
    costs, oov = _with_costs(model)
    scored = (
        _grams(df, id_col, text_col, n)
        .join(costs, on="gram", how="left")
        .crossJoin(F.broadcast(oov))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("bits"), F.col("oov_bits")))
            .alias("total_bits"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("total_bits", F.lit(0)).alias("total_bits"),
            F.round(
                F.coalesce("total_bits", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)),
                6,
            ).alias("avg_bits"),
        )
    )


def train_nb(df: DataFrame, id_col: str, text_col: str, class_col: str,
             n: int = 1) -> DataFrame:
    """(class, gram, cnt) per-class gram counts."""
    return (
        _grams(df, id_col, text_col, n, class_col)
        .groupBy(class_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def nb_classify(df: DataFrame, id_col: str, text_col: str,
                model: DataFrame, class_col: str,
                n: int = 1) -> DataFrame:
    """Multinomial NB by quantized bit-cost: -> (id, predicted,
    total_bits). predicted = class whose model spends the fewest bits
    on the document (tie -> lexicographically smallest class).

    Every document is scored under EVERY class (grams x classes via
    the class list, then left join per-class costs — OOV under one
    class is a real signal, not a dropped row)."""
    classes = model.select(F.col(class_col).alias("_cls")).distinct()
    tot = model.groupBy(class_col).agg(
        F.length(F.bin(F.sum("cnt"))).cast("long").alias("_vbits")
    )
    costs = model.join(tot, on=class_col).select(
        F.col(class_col).alias("_cls"), "gram",
        (F.col("_vbits") - F.length(F.bin(F.col("cnt")))).cast("long").alias("bits"),
    )
    oov = tot.select(
        F.col(class_col).alias("_cls"), (F.col("_vbits") + 1).alias("oov_bits")
    )
    per_class = (
        _grams(df, id_col, text_col, n)
        .crossJoin(F.broadcast(classes))
        .join(costs, on=["_cls", "gram"], how="left")
        .join(F.broadcast(oov), on="_cls")
        .groupBy(id_col, "_cls")
        .agg(F.sum(F.coalesce(F.col("bits"), F.col("oov_bits")))
             .alias("total_bits"))
    )
    w = W.partitionBy(id_col).orderBy("total_bits", "_cls")
    return (
        per_class.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("_cls").alias("predicted"), "total_bits")
    )
