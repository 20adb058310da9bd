"""Tests for the training-data ops: dedup (exact/minhash/simhash/
jaccard), similarity search (brute vs LSH recall), text analysis, and
multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oar_ocr_spark.functions import dedup as D
from oar_ocr_spark.functions import similarity as S
from oar_ocr_spark.functions import text as X
from oar_ocr_spark.functions.multimodal import (
    decode_media_df,
    frame_sample_df,
    image_features_df,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "spark engines process big data very fast indeed"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    out = {r["keep_doc_id"]: r["n_dups"] for r in D.exact_dedup(docs).collect()}
    assert out["1"] == 2  # docs 1 and 4 collapse
    assert sum(out.values()) == 5


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             D.ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()}
    assert ("1", "2") in pairs and pairs[("1", "2")] > 0.5
    assert ("1", "4") in pairs and pairs[("1", "4")] == 1.0
    assert ("1", "3") not in pairs


def test_ngram_jaccard_df_cap_drops_boilerplate_shingle(spark):
    # one boilerplate shingle shared by 1k docs would contribute ~1M
    # rows to a single join key without the document-frequency cap;
    # with the cap it is dropped and the join stays linear
    rows = [(i, f"common boiler plate unique{i} token{i} word{i}") for i in range(1000)]
    rows.append((2000, "common boiler plate only"))
    rows.append((2001, "common boiler plate only"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = D.ngram_jaccard_pairs(df, k=3, threshold=0.2, max_df=100).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # docs 2000/2001 share surviving shingles ('boiler plate only'),
    # so they still pair; the 1000 boilerplate-only overlaps do not
    assert ("2000", "2001") in got
    assert all(a in ("2000",) and b in ("2001",) for a, b in got)


def test_ngram_jaccard_threshold_uses_raw_ratio(spark):
    # raw jaccard just below threshold must be dropped even when it
    # rounds up to the threshold at 4dp (ADVICE round-1 finding)
    # 3 shared / (5 + 5 - 3) = 0.428571... — with threshold 0.4286 the
    # 4dp-rounded value (0.4286) passes but the raw value fails
    a = "w1 w2 w3 w4 w5 w6 w7"  # 5 shingles
    b = "w1 w2 w3 w4 w5 x1 x2"  # 5 shingles, 3 shared
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    out = D.ngram_jaccard_pairs(df, k=3, threshold=0.4286).collect()
    assert out == []
    out2 = D.ngram_jaccard_pairs(df, k=3, threshold=0.4285).collect()
    assert len(out2) == 1 and out2[0]["jaccard"] == 0.4286


def test_minhash_bands_identical_docs_collide(spark, docs):
    bands = D.minhash_band_hashes(docs, n_hashes=8, n_bands=2)
    cands = {(r["doc_a"], r["doc_b"]) for r in D.minhash_candidates(bands).collect()}
    assert ("1", "4") in cands  # exact dups always collide on all bands


def test_minhash_signature_is_min_over_shingles(spark):
    # one-doc sanity: band hash must be reproducible from plain python
    import hashlib

    df = spark.createDataFrame([(9, "a b c d")], ["doc_id", "text"])
    rows = D.minhash_band_hashes(df, n_hashes=2, n_bands=1).collect()
    shingles = {"a b c", "b c d"}
    mins = [
        min(hashlib.md5(f"{seed}#{sh}".encode()).hexdigest() for sh in shingles)
        for seed in (0, 1)
    ]
    expected = hashlib.md5("|".join(mins).encode()).hexdigest()
    assert rows[0]["band_hash"] == expected


def test_simhash_near_dup_low_hamming(spark, docs):
    sim = D.simhash_df(docs)
    vals = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert vals["1"] == vals["4"]  # exact dup → identical signature
    # mask to the uint64 range before converting: a negative int64
    # signature passed straight to np.uint64 is a hard error in future
    # numpy (out-of-bound python int conversion)
    def _u64(v):
        return np.uint64(v & 0xFFFF_FFFF_FFFF_FFFF)

    ham_12 = bin(_u64(vals["1"]) ^ _u64(vals["2"])).count("1")
    ham_13 = bin(_u64(vals["1"]) ^ _u64(vals["3"])).count("1")
    assert ham_12 < ham_13  # near-dup closer than unrelated
    cands = {(r["doc_a"], r["doc_b"]) for r in D.simhash_candidates(sim, 3).collect()}
    assert ("1", "4") in cands


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    rows = [(int(i), [float(v) for v in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_knn_bruteforce_matches_numpy(spark, emb):
    q = emb.where(F.col("vec_id") < 2)
    got = {}
    for r in S.knn_bruteforce(emb, q, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    M = np.stack([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ Mn.T
    for qid in (0, 1):
        s = sims[qid].copy()
        s[qid] = -np.inf
        exp = list(np.argsort(np.round(s, 6), kind="stable")[::-1][:3])
        got_ids = [n for _, n in sorted(got[qid])]
        assert [int(e) for e in exp] == got_ids


def test_knn_self_join_matches_bruteforce(spark, emb):
    # exact distributed self-join must equal the broadcast brute force
    # with the full table as queries (same total order, incl. ties)
    brute = S.knn_bruteforce(emb, emb, k=3).collect()
    sj = S.knn_self_join(emb, k=3, n_blocks=4).collect()
    key = lambda r: (r["query_id"], r["rank"])
    b = {key(r): (r["neighbor_id"], r["cosine"]) for r in brute}
    s = {key(r): (r["neighbor_id"], r["cosine"]) for r in sj}
    assert b == s


def test_knn_self_join_tie_partition_invariant(spark):
    # duplicate embeddings (cosine ties) must resolve by neighbor_id
    # regardless of block assignment — the ADVICE round-1 finding
    vec = [1.0, 0.0, 0.0, 0.0]
    rows = [(int(i), vec) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    for nb in (2, 3, 7):
        out = {}
        for r in S.knn_self_join(df, k=3, n_blocks=nb).collect():
            out.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
        for qid, ranked in out.items():
            expect = [n for n in range(3 + (qid < 3)) if n != qid][:3]
            assert [n for _, n in sorted(ranked)] == expect, (nb, qid)


def test_knn_bruteforce_query_cap(spark, emb):
    import pytest as _pytest

    old = S.MAX_BRUTEFORCE_QUERIES
    S.MAX_BRUTEFORCE_QUERIES = 5
    try:
        with _pytest.raises(ValueError, match="knn_self_join"):
            S.knn_bruteforce(emb, emb, k=3).collect()
    finally:
        S.MAX_BRUTEFORCE_QUERIES = old


def test_lsh_ann_recall_against_bruteforce(spark, emb):
    q = emb.where(F.col("vec_id") < 5)
    brute = S.knn_bruteforce(emb, q, k=3).collect()
    ann = S.lsh_ann(emb, q, dim=16, k=3, n_bits=2).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    aset = {(r["query_id"], r["neighbor_id"]) for r in ann}
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.5  # 2-bit LSH on 20 vectors keeps most true neighbors


def test_lsh_ann_axis_planes_recall_and_schema(spark, emb):
    q = emb.where(F.col("vec_id") < 5)
    brute = S.knn_bruteforce(emb, q, k=3).collect()
    ann = S.lsh_ann(emb, q, dim=16, k=3, n_bits=2, n_tables=4, planes="axis").collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    aset = {(r["query_id"], r["neighbor_id"]) for r in ann}
    assert len(bset & aset) / len(bset) >= 0.5
    assert set(ann[0].asDict()) == {"query_id", "neighbor_id", "cosine", "rank"}


def test_simhash_vectorized_reference_vector(spark):
    # pin the signature against a hand-computed reference so the
    # vectorized path (and the DuckDB oracle) share one contract
    import hashlib

    text = "a b a"
    toks = text.split(" ")
    votes = [0] * 64
    for t in toks:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for b in range(64):
            votes[b] += (h >> b) & 1
    expect = 0
    for b in range(64):
        if 2 * votes[b] > len(toks):
            expect |= 1 << b
    expect = int(np.uint64(expect).astype(np.int64))
    got = D.simhash_df(spark.createDataFrame([(1, text)], ["doc_id", "text"])).collect()
    assert got[0]["simhash"] == expect


def test_token_stats_and_quality(spark, docs):
    ts = {r["doc_id"]: r for r in X.token_stats(docs).collect()}
    assert ts[1]["n_tokens"] == 9
    q = {r["doc_id"]: r for r in X.quality_score(docs).collect()}
    assert 0.0 <= q[1]["quality"] <= 1.0
    assert q[1]["stop_ratio"] > q[5]["stop_ratio"]


def test_lang_id_guesses(spark):
    rows = [
        (1, "the query of the data and the fast scan"),
        (2, "el proceso de datos y la consulta"),
        (3, "der plan und die daten der abfrage"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["lang_guess"] for r in X.lang_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "de"}


def test_fingerprint_normalizes_whitespace_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["fingerprint"] for r in X.fingerprint(df).collect()}
    assert out[1] == out[2] != out[3]


def test_multimodal_decode_and_features(spark):
    refs = spark.createDataFrame([(f"mm_{i}",) for i in range(6)], ["media_ref"])
    meta = {r["media_ref"]: r for r in decode_media_df(refs).collect()}
    assert len(meta) == 6
    from oar_ocr_spark.fixtures.render import render_page

    img = render_page("mm_0")
    assert (meta["mm_0"]["height"], meta["mm_0"]["width"]) == img.shape
    feats = {r["media_ref"]: r for r in image_features_df(refs).collect()}
    from oar_ocr_spark.fixtures.render import page_truth

    assert feats["mm_0"]["n_regions"] == len(page_truth("mm_0").regions)
    assert 0 < feats["mm_0"]["ink_ratio"] < 1


def test_frame_sample_shapes(spark):
    refs = spark.createDataFrame([("mm_7",)], ["media_ref"])
    frames = frame_sample_df(refs, n_frames=4).collect()
    assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    from oar_ocr_spark.fixtures.render import render_page

    h = render_page("mm_7").shape[0]
    assert sum(f["height"] for f in frames) == h
    for f in frames:
        assert len(f["frame"]) == f["height"] * f["width"]


def test_ivf_ann_recall_and_schema(spark, emb):
    q = emb.where(F.col("vec_id") < 5)
    brute = S.knn_bruteforce(emb, q, k=3).collect()
    ann = S.ivf_ann(emb, q, k=3, nprobe=2, centroid_mod=5).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    aset = {(r["query_id"], r["neighbor_id"]) for r in ann}
    assert len(bset & aset) / len(bset) >= 0.5
    assert set(ann[0].asDict()) == {"query_id", "neighbor_id", "cosine", "rank"}
    # probing ALL centroids with unlimited k recovers brute force exactly
    full = S.ivf_ann(emb, q, k=3, nprobe=4, centroid_mod=5).collect()
    fset = {(r["query_id"], r["rank"], r["neighbor_id"]) for r in full}
    # nprobe=4 covers all 4 centroids -> candidates = all vectors
    assert fset == {(r["query_id"], r["rank"], r["neighbor_id"]) for r in brute}


def test_duplicate_clusters_path_graph(spark):
    # a path a-b-c-d (diameter 3) must collapse to one cluster with the
    # min label, plus an isolated pair e-f
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("c", "d"), ("e", "f")], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r["cluster_id"] for r in D.duplicate_clusters(pairs).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}


def test_duplicate_clusters_chain_converges_logarithmically(spark):
    # 256-node path graph: min-label eccentricity 255. One-hop-only
    # propagation needs ~255 rounds; pointer doubling must finish
    # within ~log2(255)+2 rounds — max_iters=12 would raise otherwise.
    n = 256
    ids = [f"n{i:04d}" for i in range(n)]
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in D.duplicate_clusters(pairs, max_iters=12).collect()
    }
    assert out == {i: ids[0] for i in ids}


def test_duplicate_clusters_frees_round_caches(spark):
    # regression pin for the round-3 cache-lifecycle fix: the CC loop
    # must not leave one persisted label frame per round in the
    # CacheManager (the final frame is checkpointed + every round
    # handle freed). Budget: the final checkpoint plus the loop's
    # every-3-rounds lineage-truncation checkpoints (~log2(64)/3 + 1
    # ≤ 4 here) — those are ContextCleaner-collected asynchronously,
    # so they may still be registered at assert time. The leaky
    # version left one frame PER ROUND (~8-10).
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    n = 64
    ids = [f"m{i:03d}" for i in range(n)]
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    out = D.duplicate_clusters(pairs, max_iters=12)
    assert out.count() == n
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 4, f"cache leak: {before} -> {after} persistent RDDs"


def test_duplicate_clusters_raises_on_exhaustion(spark):
    import pytest

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        # diameter-4 path cannot settle in a single round
        D.duplicate_clusters(pairs, max_iters=1)


def test_argmin_assign_null_cosine_sorts_last(spark):
    # parity with the row_number window's desc_nulls_last: a NULL
    # cosine (zero-norm vector under non-ANSI division) must lose to
    # every real score — a bare struct-min would sort NULL first and
    # pick the degenerate centroid
    sim = spark.createDataFrame(
        [("q1", 1, 0.9), ("q1", 2, None), ("q1", 3, 0.5), ("q2", 2, None), ("q2", 7, None)],
        "qid string, centroid_id int, ccos double",
    )
    out = {r["qid"]: r["centroid_id"] for r in S._argmin_assign(sim, "qid").collect()}
    assert out["q1"] == 1  # best real score wins, not the NULL
    assert out["q2"] == 2  # all-NULL group: centroid_id tiebreak


def test_trained_ivf_recall_monotone_and_beats_standin(spark):
    # clustered corpus (8 gaussian clusters in 16-d): sampled-Lloyd
    # centroids should land near cluster centers, so probing fewer
    # lists recovers more true neighbors than the id%K stand-in
    rng = np.random.default_rng(17)
    centers = rng.standard_normal((8, 16)) * 3.0
    vecs = np.concatenate(
        [centers[i % 8] + 0.15 * rng.standard_normal(16) for i in range(96)]
    ).reshape(96, 16)
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in vecs[i]]) for i in range(96)],
        ["vec_id", "embedding"],
    )
    q = emb.where(F.col("vec_id") < 8)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_bruteforce(emb, q, k=5).collect()
    }
    trained = S.train_ivf_centroids(emb, centroid_mod=12, iters=2)

    def recall(codebook, nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in S.ivf_ann(
                emb, q, k=5, nprobe=nprobe, centroids=codebook, centroid_mod=12
            ).collect()
        }
        return len(got & brute) / len(brute)

    r_trained = [recall(trained, p) for p in (1, 2, 3)]
    r_standin = [recall(None, p) for p in (1, 2, 3)]
    # candidates grow with nprobe -> recall is monotone
    assert r_trained == sorted(r_trained)
    assert r_standin == sorted(r_standin)
    # the trained codebook dominates the stand-in at every probe depth
    assert all(t >= s for t, s in zip(r_trained, r_standin))
    assert r_trained[0] > r_standin[0]  # strict win where probing is tight
    assert r_trained[-1] >= 0.95


def test_embedding_near_dup_exact_matches_query_shape(spark, emb):
    out = S.embedding_near_dup(emb, threshold=0.5, mode="exact", k=3).collect()
    assert set(out[0].asDict()) == {"vec_a", "vec_b", "cosine"} if out else True
    for r in out:
        assert r["vec_a"] < r["vec_b"] and r["cosine"] >= 0.5


@pytest.mark.parametrize(
    "threshold,noise,min_recall",
    [
        # near-copies (cosine ≈ 0.99): the easy regime the docstring's
        # ≥0.95 claim covers
        (0.9, 0.12, 0.95),
        # harder operating point: planted pairs spread 0.74–0.91, so
        # qualifying pairs sit close to the threshold where per-pair
        # retention drops to ~0.90 (docstring curve) — measured 0.977
        # on this corpus because most pairs sit above the boundary
        (0.8, 0.65, 0.90),
    ],
)
def test_embedding_near_dup_approx_recall(spark, threshold, noise, min_recall):
    # planted near-dup corpus: 150 base vectors + a perturbed copy of
    # each; the LSH defaults (6 bits x 8 tables) must recover the
    # documented recall at BOTH operating points of the
    # recall/threshold curve (see embedding_near_dup docstring).
    rng = np.random.default_rng(23)
    base = rng.standard_normal((150, 64))
    pert = base + noise * rng.standard_normal((150, 64))
    vecs = np.concatenate([base, pert])
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ vn.T
    iu = np.triu_indices(len(vecs), 1)
    true_pairs = {
        (int(i), int(j))
        for i, j in zip(*iu)
        if round(float(sims[i, j]), 4) >= threshold
    }
    assert len(true_pairs) >= 100  # the plant worked
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in vecs[i]]) for i in range(len(vecs))],
        ["vec_id", "embedding"],
    )
    got = {
        (r["vec_a"], r["vec_b"])
        for r in S.embedding_near_dup(
            emb, threshold=threshold, mode="approx", dim=64, n_bits=6, n_tables=8
        ).collect()
    }
    # exact re-rank -> precision 1.0
    assert got <= true_pairs
    assert len(got) / len(true_pairs) >= min_recall
