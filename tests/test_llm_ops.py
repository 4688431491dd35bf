"""LLM-pipeline operator tests: the non-SQL-expressible paths that the
DuckDB oracle can't gate (MinHash/LSH, SimHash, ANN) are checked here
against their exact counterparts (recall/containment), plus the
multimodal mapInPandas plumbing.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
    simhash_near_pairs,
)
from parquet_rewriter_spark.operators.similarity import ann_lsh_topk, cosine_topk, knn_join
from parquet_rewriter_spark.sources.multimodal import blob_table, decode_image, frame_sample
from parquet_rewriter_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_minhash_lsh_finds_known_near_dups(spark, docs):
    """LSH candidates verified at >=0.4 must be a subset of the exact
    jaccard pairs, with decent recall on the high-similarity band."""
    d = docs.filter(F.col("n_chars") < 200)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(d, "doc_id", "text", 0.4, shingle_n=1).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            d, "doc_id", "text", threshold=0.4, num_hashes=48, bands=16, shingle_n=1
        ).collect()
    }
    assert set(lsh) <= set(exact)  # verification step guarantees precision
    high = {k for k, v in exact.items() if v >= 0.6}
    if high:
        recall = len(high & set(lsh)) / len(high)
        assert recall >= 0.8, f"LSH recall on jaccard>=0.6 band too low: {recall}"


def test_minhash_identical_docs_always_pair(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon zeta"),
            (3, "completely different words entirely here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.9, shingle_n=1).collect()
    assert [(p.id_a, p.id_b, p.jaccard) for p in pairs] == [(1, 2, 1.0)]


def test_simhash_deterministic_and_discriminative(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "totally unrelated content about something else")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp1 = {r.id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    fp2 = {r.id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    assert fp1 == fp2  # deterministic
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(fp1[1], fp1[2]) < ham(fp1[1], fp1[3])  # near docs closer


def test_simhash_near_pairs_total_recall_vs_bruteforce(spark, docs):
    """Pigeonhole blocking guarantees recall: the blocked pairs at
    max_hamming=3 must EQUAL the brute-force XOR-popcount pairs."""
    d = docs.filter(F.col("doc_id") % 3 == 0)  # keep the n² check cheap
    fps = {r.id: r.simhash for r in simhash(d, "doc_id", "text").collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    ids = sorted(fps)
    brute = {
        (x, y): ham(fps[x], fps[y])
        for i, x in enumerate(ids)
        for y in ids[i + 1:]
        if ham(fps[x], fps[y]) <= 3
    }
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(d, "doc_id", "text", max_hamming=3).collect()
    }
    assert got == brute, (len(got), len(brute))


def test_simhash_near_pairs_runs(spark, docs):
    out = simhash_near_pairs(docs, "doc_id", "text", max_hamming=12)
    rows = out.collect()
    for r in rows:
        assert r.id_a < r.id_b and r.hamming <= 12


def test_ann_finds_planted_neighbors(spark):
    """Fixture embeddings are uniform-random (max pairwise cosine ≈0.33 —
    no true neighbors), so recall there is meaningless. Plant clusters:
    ANN must recover a cluster member's true neighbors, which all fall
    in (or one bit off) its hyperplane bucket because the angles are tiny."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((10, 32))
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(20):
            v = c + 0.05 * rng.standard_normal(32)
            rows.append((vid, ci, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<float>")
    qv = [float(x) for x in centers[3]]
    exact = [r.id for r in cosine_topk(df, "vec_id", "embedding", qv, k=10).collect()]
    approx = [r.id for r in ann_lsh_topk(df, "vec_id", "embedding", qv, k=10, n_planes=8).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, f"ANN recall on planted clusters too low: {recall}"
    clusters = {r.cluster for r in df.filter(F.col("vec_id").isin(approx)).collect()}
    assert clusters == {3}


def test_ivf_finds_planted_neighbors(spark):
    """IVF variant of the planted-cluster recall test: with k-means
    cells ≈ planted clusters, probing the nearest cells must recover the
    exact top-10 (tight clusters → the query's cell holds its true
    neighbors)."""
    import numpy as np

    from parquet_rewriter_spark.operators.similarity import ann_ivf_topk

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((10, 32))
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(20):
            v = c + 0.05 * rng.standard_normal(32)
            rows.append((vid, ci, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<float>")
    qv = [float(x) for x in centers[3]]
    exact = [r.id for r in cosine_topk(df, "vec_id", "embedding", qv, k=10).collect()]
    approx = [
        r.id
        for r in ann_ivf_topk(
            df, "vec_id", "embedding", qv, k=10, n_centroids=10, n_probe=2
        ).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, f"IVF recall on planted clusters too low: {recall}"


def test_distributed_kmeans_refine_matches_numpy_reference(spark, emb):
    """The distributed Lloyd iteration must compute the SAME centroids
    a single-machine numpy implementation gets from identical init and
    identical data — the distribution changes where the work runs, not
    the math (tolerance covers float summation order)."""
    import numpy as np

    from parquet_rewriter_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
        kmeans_refine_distributed,
    )

    C0 = kmeans_centroids(emb, "embedding", n_centroids=8)
    got = kmeans_refine_distributed(emb, "embedding", C0, iters=2)

    X = np.asarray(
        [r[0] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = np.asarray(C0, dtype=np.float64)
    for _ in range(2):
        assign = np.argmax(X @ C.T, axis=1)
        newC = C.copy()
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                newC[c] = members.mean(axis=0)
        C = newC / np.maximum(np.linalg.norm(newC, axis=1, keepdims=True), 1e-12)
    assert np.allclose(got, C, atol=1e-9)

    # refinement must not degrade the quantization objective (mean
    # max-cosine to the assigned centroid) vs the sample-trained init
    def objective(cent):
        return float(np.mean(np.max(X @ np.asarray(cent).T, axis=1)))

    assert objective(got) >= objective(C0) - 1e-9
    # and the index built on refined centroids still assigns every row
    n = ivf_assign(emb, "embedding", got).count()
    assert n == emb.count()


def test_ivf_on_fixture_embeddings_prunes_and_returns_k(spark, emb):
    """On the real fixture: k results, and the probed candidate set is a
    strict subset of the table (the scan actually pruned)."""
    from parquet_rewriter_spark.operators.similarity import (
        ann_ivf_topk,
        ivf_assign,
        kmeans_centroids,
    )

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    C = kmeans_centroids(emb, "embedding", n_centroids=16)
    out = ann_ivf_topk(
        emb, "vec_id", "embedding", qv, k=10, n_probe=4, centroids=C
    ).collect()
    assert len(out) == 10
    assert out[0].id == 0 and out[0].cos_sim == 1.0  # self-match first
    sizes = (
        ivf_assign(emb, "embedding", C)
        .groupBy("centroid_id")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in sizes)
    assert total == emb.count()
    assert len(sizes) > 4  # multiple non-empty cells → probing 4 prunes


def test_ann_on_fixture_embeddings_prunes_and_returns_k(spark, emb):
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    approx = ann_lsh_topk(emb, "vec_id", "embedding", qv, k=10, n_planes=8).collect()
    assert len(approx) <= 10 and approx[0].id == 0 and approx[0].cos_sim == 1.0
    sims = [r.cos_sim for r in approx]
    assert sims == sorted(sims, reverse=True)


def test_knn_join_small(spark, emb):
    left = emb.filter(F.col("vec_id") < 5)
    out = knn_join(left, emb, "vec_id", "vec_id", "embedding", k=3)
    rows = out.collect()
    assert len(rows) == 5 * 3
    by_left = {}
    for r in rows:
        by_left.setdefault(r[0], []).append((r.rank, r[1], r.cos_sim))
    for lid, lst in by_left.items():
        lst.sort()
        assert lst[0][1] == lid and lst[0][2] == 1.0  # self is rank 1
        sims = [s for _, _, s in lst]
        assert sims == sorted(sims, reverse=True)


def test_block_kernels_have_no_row_level_cross_join(spark, emb):
    """The exact similarity paths must plan as the blocked cogroup —
    no CartesianProduct and no per-row BroadcastNestedLoopJoin of the
    two DATA relations (the only nested loop allowed is the tiny
    block-grid broadcast)."""
    from parquet_rewriter_spark.operators.dedup import embedding_near_dup_pairs
    from parquet_rewriter_spark.plans import plan_of

    pairs_plan = plan_of(embedding_near_dup_pairs(emb, "vec_id", "embedding", 0.45))
    knn_plan = plan_of(knn_join(emb.limit(20), emb, "vec_id", "vec_id", "embedding", k=3))
    for p in (pairs_plan, knn_plan):
        assert "CartesianProduct" not in p, p
        assert "FlatMapCoGroupsInPandas" in p, p


def test_embedding_near_dup_blocked_matches_bruteforce(spark, emb):
    """Blocked matmul == the row-level brute force, bit-for-bit at the
    rounded output, across chunk counts (1 chunk = single block; small
    chunks = many blocks exercising the triangle + dedup logic)."""
    from parquet_rewriter_spark.functions.vector import as_double, cosine
    from parquet_rewriter_spark.operators.dedup import embedding_near_dup_pairs

    v = emb.select(F.col("vec_id").alias("id"), as_double("embedding").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    brute = {
        (r.id_a, r.id_b): r.cos_sim
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.4)
        .collect()
    }
    for chunk_rows in (100, 10_000_000):
        got = {
            (r.id_a, r.id_b): r.cos_sim
            for r in embedding_near_dup_pairs(
                emb, "vec_id", "embedding", 0.4, chunk_rows=chunk_rows
            ).collect()
        }
        assert got == brute, (chunk_rows, len(got), len(brute))


def test_embedding_near_dup_lsh_high_threshold(spark):
    """Banded hyperplane LSH at a HIGH threshold: precision total (every
    pair verified), recall >= target on planted near-dups; low
    thresholds must raise (the documented LSH impossibility)."""
    import numpy as np

    from parquet_rewriter_spark.operators.dedup import embedding_near_dup_lsh

    rng = np.random.RandomState(7)
    base = rng.standard_normal((40, 32))
    rows = []
    vid = 0
    planted = []
    for i in range(40):
        v = base[i] / np.linalg.norm(base[i])
        rows.append((vid, [float(x) for x in v]))
        if i < 15:  # plant a near-dup: tiny perturbation → cos ≈ 0.99+
            w = v + 0.05 * rng.standard_normal(32)
            w = w / np.linalg.norm(w)
            rows.append((vid + 1000, [float(x) for x in w]))
            planted.append((vid, vid + 1000))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_lsh(
            df, "vec_id", "embedding", threshold=0.9, target_recall=0.99
        ).collect()
    }
    truly_high = {
        p
        for p in planted
        # verify the perturbation actually kept cos >= 0.9
        if float(
            np.dot(
                dict(rows)[p[0]], dict(rows)[p[1]]
            )
        )
        >= 0.9
    }
    recall = len(truly_high & got) / max(1, len(truly_high))
    assert recall >= 0.9, (recall, len(truly_high))
    with pytest.raises(ValueError, match="brute-force"):
        embedding_near_dup_lsh(df, "vec_id", "embedding", threshold=0.3, target_recall=0.999)


def test_knn_join_ivf_recall_vs_exact(spark, emb):
    """Bucketed IVF kNN join: with generous probing its neighbor sets
    overlap the exact join's heavily; with narrow probing it still
    returns k rows per left (structure intact)."""
    from parquet_rewriter_spark.operators.similarity import knn_join_ivf

    left = emb.filter(F.col("vec_id") < 20)
    exact = {}
    for r in knn_join(left, emb, "vec_id", "vec_id", "embedding", k=3).collect():
        exact.setdefault(r[0], set()).add(r[1])
    approx = {}
    for r in knn_join_ivf(
        left, emb, "vec_id", "vec_id", "embedding", k=3, n_centroids=8, n_probe=6
    ).collect():
        approx.setdefault(r[0], set()).add(r[1])
    assert set(approx) == set(exact)
    hits = sum(len(exact[l] & approx[l]) for l in exact)
    total = sum(len(exact[l]) for l in exact)
    assert hits / total >= 0.7, f"IVF kNN recall too low: {hits}/{total}"


def test_exact_dedup_keeps_lowest_id(spark):
    rows = [(5, "x"), (2, "x"), (9, "y"), (1, "z"), (3, "z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in exact_dedup(df, ["text"], "doc_id").collect())
    assert kept == [1, 2, 9]


def test_multimodal_decode_plumbing(spark, docs):
    blobs = blob_table(docs.limit(50), "doc_id", "text")
    assert blobs.schema["payload"].dataType.typeName() == "binary"
    feats = decode_image(blobs, fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes > 0 and 16 <= r.width < 80 and 16 <= r.height < 80
        assert len(r.feat) == 8
    # determinism across runs
    again = {r.media_id: (r.width, r.height) for r in decode_image(blobs, fake=True).collect()}
    assert all(again[r.media_id] == (r.width, r.height) for r in rows)


def test_multimodal_decode_real_path_raises(spark, docs):
    blobs = blob_table(docs.limit(1), "doc_id", "text")
    with pytest.raises(NotImplementedError):
        decode_image(blobs, fake=False)


def test_frame_sample_expansion(spark, docs):
    blobs = blob_table(docs.limit(10), "doc_id", "text")
    frames = frame_sample(blobs, every_n_bytes=100)
    rows = frames.collect()
    assert len(rows) >= 10  # at least one frame per doc
    n_bytes = {r.media_id: r.n_bytes for r in blobs.select("media_id", "n_bytes").collect()}
    from collections import Counter
    per_doc = Counter(r.media_id for r in rows)
    for mid, n in per_doc.items():
        expected = max(1, -(-n_bytes[mid] // 100))
        assert n == expected


def test_winnow_pairs_finds_duplicates(spark):
    """Identical docs share every fingerprint; disjoint-vocab docs share
    none. Both selector variants (hash-min production, lex-min oracle)
    must agree on the detected pair."""
    from parquet_rewriter_spark.operators.dedup import winnow_fingerprints, winnow_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq pppp oooo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for use_hash in (True, False):
        pairs = winnow_pairs(
            df, "doc_id", "text", k=5, window=4, min_shared=3, use_hash=use_hash
        ).collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)], pairs
        n_fp = winnow_fingerprints(
            df, "doc_id", "text", k=5, window=4, use_hash=use_hash
        ).filter(F.col("id") == 1).count()
        # winnowing density: ~2/(w+1) of gram count, never more than grams
        assert 1 <= n_fp <= len(rows[0][1])
        assert pairs[0].shared_fps == n_fp  # identical docs share all


# ---------------- chunking + PII (pipeline 3) ----------------


def test_chunk_text_covers_and_overlaps(spark):
    from parquet_rewriter_spark.functions.chunk import chunk_text
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "a" * 250), (2, "b" * 100), (3, "c" * 30), (4, "d" * 101)],
        "doc_id long, text string",
    )
    out = chunk_text(df, "text", size=100, overlap=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
    # 250 chars, step 80 → ceil(230/80)=3 chunks; last one short
    assert [len(c) for _, c in sorted(by_doc[1])] == [100, 100, 90]
    # adjacent chunks share exactly 20 chars of source span
    c0, c1 = sorted(by_doc[1])[0][1], sorted(by_doc[1])[1][1]
    assert c0[80:] == c1[:20]
    assert [len(c) for _, c in sorted(by_doc[2])] == [100]  # exact fit → 1 chunk
    assert [len(c) for _, c in sorted(by_doc[3])] == [30]  # short doc → 1 chunk
    assert [len(c) for _, c in sorted(by_doc[4])] == [100, 21]  # 1 char past → 2
    # reconstruction: de-overlapped concat equals the source
    recon = "".join(
        c if i == 0 else c[20:] for i, c in sorted(by_doc[4])
    )
    assert recon == "d" * 101


def test_pii_redact_and_count(spark):
    import pyspark.sql.functions as F

    from parquet_rewriter_spark.functions import pii

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b-c_9@foo-bar.example.org today"),
            (2, "call (555) 123-4567 or 555-123-4567 now"),
            (3, "plain text, no pii"),
            (4, "two addrs x@y.io z@w.co and 999.555.1234"),
        ],
        "id long, t string",
    )
    got = {
        r["id"]: (r["e"], r["p"], r["red"])
        for r in df.select(
            "id",
            pii.count_emails("t").alias("e"),
            pii.count_phones("t").alias("p"),
            pii.redact("t").alias("red"),
        ).collect()
    }
    assert got[1] == (1, 0, "mail me at <EMAIL> today")
    assert got[2][1] == 2 and got[2][2] == "call <PHONE> or <PHONE> now"
    assert got[3] == (0, 0, "plain text, no pii")
    assert got[4][0] == 2 and got[4][1] == 1
    assert got[4][2] == "two addrs <EMAIL> <EMAIL> and <PHONE>"


def test_portable_minhash_finds_all_injected_duplicates(spark, docs):
    """The portable-family variant must bucket identical texts together
    in every band — all injected exact duplicates surface with
    jaccard 1.0, and every reported pair clears the verify threshold."""
    from parquet_rewriter_spark.operators.dedup import minhash_lsh_pairs_portable

    dups = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    corpus = docs.unionByName(dups)
    pairs = minhash_lsh_pairs_portable(
        corpus, "doc_id", "text", threshold=0.5
    ).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    expected = {
        (r.doc_id, r.doc_id + 1_000_000)
        for r in docs.filter(F.col("doc_id") % 7 == 0).select("doc_id").collect()
    }
    for pair in expected:
        assert pair in got and got[pair] == 1.0
    assert all(j >= 0.5 for j in got.values())


def test_portable_simhash_blocked_equals_bruteforce(spark, docs):
    """Portable-family pigeonhole blocking keeps the total-recall
    guarantee: blocked pairs at max_hamming=3 must EQUAL brute force
    over the same fingerprint definition."""
    from parquet_rewriter_spark.operators.countmin import portable_string_hash
    from parquet_rewriter_spark.operators.dedup import simhash_portable_near_pairs

    d = docs.filter(F.col("doc_id") % 3 == 0)
    # reference fingerprints straight from the definition
    rows = d.select("doc_id", F.explode(F.split("text", " ")).alias("t")).select(
        "doc_id", portable_string_hash(F.col("t")).alias("h")
    ).collect()
    votes: dict = {}
    for r in rows:
        v = votes.setdefault(r.doc_id, [0] * 48)
        for b in range(48):
            v[b] += 1 if (r.h >> b) & 1 else -1
    fps = {
        k: sum((1 << b) for b in range(48) if v[b] > 0) for k, v in votes.items()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    ids = sorted(fps)
    brute = {
        (x, y): ham(fps[x], fps[y])
        for i, x in enumerate(ids)
        for y in ids[i + 1:]
        if ham(fps[x], fps[y]) <= 3
    }
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_portable_near_pairs(d, "doc_id", "text", max_hamming=3).collect()
    }
    assert got == brute, (len(got), len(brute))


def test_minhash_bucket_cap_bounds_mass_duplicate_blowup(spark):
    """1,000 identical docs share every band bucket: uncapped, the
    bucket self-join materializes ~500k matches. With bucket_cap the
    pair count is bounded by C(cap,2) + (n - cap) star edges, and every
    doc still reaches the cluster hub (connected components intact)."""
    n = 1000
    rows = [(i, "the same exact text repeated in every document") for i in range(n)]
    rows += [(n + 1, "an entirely different and unrelated sentence")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 10
    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.9, shingle_n=1, bucket_cap=cap
    ).collect()
    assert 0 < len(pairs) <= cap * (cap - 1) // 2 + (n - cap)
    # star coverage: every duplicate doc appears in at least one pair
    touched = {p.id_a for p in pairs} | {p.id_b for p in pairs}
    assert touched == set(range(n))
    # every pair is a true duplicate (verify step ran)
    assert all(p.jaccard == 1.0 for p in pairs)
    # hub star: doc 0 (bucket minimum) links every beyond-cap member
    hub_links = {p.id_b for p in pairs if p.id_a == 0}
    assert set(range(cap, n)) <= hub_links


def test_simhash_bucket_cap_bounds_mass_duplicate_blowup(spark):
    n = 500
    rows = [(i, "identical fingerprint text for every single doc") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 8
    pairs = simhash_near_pairs(
        df, "doc_id", "text", max_hamming=3, bucket_cap=cap
    ).collect()
    assert 0 < len(pairs) <= cap * (cap - 1) // 2 + (n - cap)
    touched = {p.id_a for p in pairs} | {p.id_b for p in pairs}
    assert touched == set(range(n))
    assert all(p.hamming == 0 for p in pairs)


def test_jaccard_size_ratio_prefilter_keeps_results(spark):
    """The size-ratio prefilter is implied by Jaccard >= t: results on
    docs with very different lengths must be unchanged vs brute math."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),     # J = 7/9 vs doc 1
        (3, "a b"),                 # tiny: ratio-filtered against 1/2
        (4, "z y x w v u t s r q p o n m l k j i h g f e d c b a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in jaccard_pairs(df, "doc_id", "text", 0.5, shingle_n=1).collect()}
    assert set(got) == {(1, 2)}
    assert abs(got[(1, 2)] - round(7 / 9, 4)) < 1e-9


def test_decode_image_real_path_with_pil(spark):
    """Real decode path — runs wherever PIL exists, skips here."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("RGB", (32, 20), color=(120, 30, 200))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    bt = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id long, payload binary"
    )
    out = decode_image(bt, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (32, 20)
    assert len(r.feat) == 8 and all(0.0 <= v <= 1.0 for v in r.feat)


def test_substring_dup_spans_and_stats(spark):
    """Two docs share a 12-token run; with window=10 the three
    overlapping duplicated grams must union to exactly 12 covered
    tokens per doc, and unique docs must report zero."""
    from parquet_rewriter_spark.operators.dedup import (
        substring_dup_spans,
        substring_dup_stats,
    )

    shared = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, "intro text here " + shared + " tail one", "a"),
        (2, "other beginning words " + shared + " ending two two", "a"),
        (3, "completely unique sentence with many distinct tokens inside it", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    spans = substring_dup_spans(df, "doc_id", "text", window=10).collect()
    assert {r.id for r in spans} == {1, 2}
    stats = {
        r.source: r
        for r in substring_dup_stats(
            df, "doc_id", "text", window=10, group_cols=["source"]
        ).collect()
    }
    assert stats["a"].docs_with_dups == 2
    assert stats["a"].dup_tokens == 24  # 12 covered tokens in each doc
    assert stats["b"].dup_tokens == 0 and stats["b"].docs_with_dups == 0


def test_substring_dup_property_vs_bruteforce(spark):
    """Randomized corpora vs a brute-force python model of the
    gram-span union — dup token counts must match exactly."""
    import random

    from parquet_rewriter_spark.operators.dedup import substring_dup_stats

    rng = random.Random(13)
    W = 4
    for trial in range(3):
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        for did in range(14):
            n = rng.randrange(2, 18)
            docs.append((did, " ".join(rng.choice(vocab) for _ in range(n)), "s"))

        # brute-force model
        from collections import Counter

        grams = Counter()
        doc_grams = {}
        for did, text, _ in docs:
            toks = text.split(" ")
            gs = [
                (" ".join(toks[i:i + W]), i)
                for i in range(len(toks) - W + 1)
            ]
            doc_grams[did] = gs
            for g, _ in gs:
                grams[g] += 1
        exp_dup = {}
        for did, text, _ in docs:
            covered = set()
            for g, i in doc_grams[did]:
                if grams[g] >= 2:
                    covered.update(range(i, i + W))
            exp_dup[did] = len(covered)
        total_exp = sum(exp_dup.values())

        df = spark.createDataFrame(docs, "doc_id long, text string, source string")
        row = substring_dup_stats(df, "doc_id", "text", window=W).first()
        assert row["dup_tokens"] == total_exp, (trial, row["dup_tokens"], total_exp)
        assert row["docs_with_dups"] == sum(1 for v in exp_dup.values() if v), trial


def test_hyperplane_portable_pairs_are_true_pairs(spark, sf_dir):
    """Precision must be exact (verified candidates only), and the pair
    set deterministic run-to-run — it is what the SQL oracle replays."""
    import numpy as np

    from parquet_rewriter_spark.operators.dedup import hyperplane_lsh_pairs_portable

    df = load_table(spark, sf_dir, "embeddings")
    got = {
        (r["a_id"], r["b_id"])
        for r in hyperplane_lsh_pairs_portable(df).collect()
    }
    assert got  # bands are tuned to surface pairs on the fixture
    rows = df.select("vec_id", "embedding").collect()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = [r["vec_id"] for r in rows]
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn @ Xn.T
    true = {
        tuple(sorted((ids[i], ids[j])))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(C[i, j], 3) >= 0.449  # quantized-cosine slack at the boundary
    }
    assert got <= true, got - true
    got2 = {
        (r["a_id"], r["b_id"])
        for r in hyperplane_lsh_pairs_portable(df).collect()
    }
    assert got == got2


def test_hyperplane_ann_topk_exact_within_candidates(spark, sf_dir):
    """Ranking inside the candidate set must be exactly the brute-force
    cosine order (the candidate set is the only approximation)."""
    import numpy as np

    from parquet_rewriter_spark.operators.dedup import hyperplane_ann_topk_portable

    df = load_table(spark, sf_dir, "embeddings")
    got = hyperplane_ann_topk_portable(df, probe_ids=[0, 1], k=5).collect()
    assert got and all(r["rnk"] <= 5 for r in got)
    rows = df.select("vec_id", "embedding").collect()
    X = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    for r in got:
        a, b = X[r["query_id"]], X[r["neighbor_id"]]
        true_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(true_cos - r["cos_sim"]) < 2e-4  # quantization slack
    # per-probe ranks are contiguous from 1 and ordered by cos desc
    for qid in {r["query_id"] for r in got}:
        mine = sorted((r for r in got if r["query_id"] == qid), key=lambda r: r["rnk"])
        assert [r["rnk"] for r in mine] == list(range(1, len(mine) + 1))
        assert all(
            mine[i]["cos_sim"] >= mine[i + 1]["cos_sim"] for i in range(len(mine) - 1)
        )
