"""ANN correctness: LSH-bucketed top-k recall vs brute-force oracle;
document dedup on synthetic near-duplicates."""

import pytest
from pyspark.sql import functions as F, types as T

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


def test_lsh_ann_recall(spark, emb):
    from etl_reconciliate_spark.operators.similarity import (
        cosine_topk,
        lsh_cosine_topk,
    )

    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=10)
    # NOTE: the sandbox embeddings are near-uniform (top-5 same-label
    # fraction ≈ 0.12 ≈ chance), the hardest case for hyperplane LSH —
    # 4 planes + 2-bit multiprobe scans ~11/16 buckets for recall ≈ 0.8.
    approx = lsh_cosine_topk(
        emb, queries, dim=64, k=10, n_planes=4, multiprobe_bits=2
    )
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"LSH recall@10 too low: {recall:.2f}"
    # approximate results are a subset of legal pairs and correctly ranked
    ranks = {}
    for r in approx.collect():
        ranks.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for qid, rs in ranks.items():
        rs.sort()
        cos = [c for _, c in rs]
        assert cos == sorted(cos, reverse=True)


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again!"),  # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
    (4, "completely different content about spark window aggregation functions"),
    (5, "yet another unrelated document mentioning parquet column pruning"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in DOCS],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )


def test_exact_dedup(spark, docs):
    from etl_reconciliate_spark.operators.dedupe_docs import (
        dedup_exact,
        exact_duplicate_groups,
    )

    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keep_doc_id"] == 1
    kept = {r["doc_id"] for r in dedup_exact(docs).collect()}
    assert kept == {1, 2, 4, 5}


def test_minhash_lsh_finds_near_dup(spark, docs):
    from etl_reconciliate_spark.operators.dedupe_docs import minhash_near_dup_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_near_dup_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0  # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5  # near dup
    assert not any({a, b} & {4, 5} and {a, b} & {1, 2, 3} for a, b in pairs)


def test_ngram_jaccard_exact_values(spark, docs):
    from etl_reconciliate_spark.operators.dedupe_docs import ngram_jaccard_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 3)] == 1.0
    assert 0.8 <= pairs[(1, 2)] < 1.0


def test_simhash_hamming(spark):
    from etl_reconciliate_spark.operators.dedupe_docs import simhash_near_dup_pairs

    # SimHash needs enough tokens for stable bit margins — use ~100-token
    # docs where the near-dup differs in one token.
    base = " ".join(f"tok{i % 37}" for i in range(100))
    near = base.replace("tok5", "tokX", 1)
    other = " ".join(f"zzz{i % 41}" for i in range(100))
    docs = [(1, base), (2, near), (3, base), (4, other)]
    df = _docs_df(docs)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(df, max_hamming=6).collect()
    }
    assert pairs.get((1, 3)) == 0  # identical text → identical simhash
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6  # near dup → small hamming
    assert not any({a, b} == {1, 4} or {a, b} == {2, 4} for a, b in pairs)


def _docs_df(rows):
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    return spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )


def test_embedding_near_dups_self_consistency(spark, emb):
    from etl_reconciliate_spark.operators.dedupe_docs import embedding_near_dup_pairs

    # a vector duplicated must be found at cosine 1
    two = emb.limit(1)
    dup = two.withColumn("vec_id", F.col("vec_id") + 100000)
    pairs = embedding_near_dup_pairs(two.union(dup), threshold=0.999).collect()
    assert len(pairs) == 1 and abs(pairs[0]["cosine"] - 1.0) < 1e-9


def test_ivf_full_probe_equals_exact(spark, emb):
    """nprobe = n_centroids degenerates IVF to the exact scan: identical
    (query, vec) result sets to the brute-force oracle."""
    from etl_reconciliate_spark.operators.similarity import cosine_topk, ivf_topk

    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=10)
    full = ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=8)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    assert a == e


def test_ivf_partial_probe_recall(spark, emb):
    from etl_reconciliate_spark.operators.similarity import cosine_topk, ivf_topk

    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=5)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # near-uniform embeddings are the worst case (neighbors spread across
    # cells); 5/8 cells must still recover most of the true top-k
    assert len(a & e) / len(e) >= 0.6


def test_curate_corpus_stage_semantics(spark):
    """Composed curation: language gate, min-token gate, exact dedup
    (min doc_id wins), LSH near-dup removal (smaller doc_id kept)."""
    from etl_reconciliate_spark.operators.curate import (
        curate_corpus,
        curation_stats,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),  # near-dup of 1
        (3, "the  quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1 (ws-normalized)
        (4, "completely different content about the spark window functions and more"),
        (5, "yet another unrelated document mentioning the parquet pruning and related"),
        (6, "el gato y la casa que los perros el dia la noche que viene"),  # es
        (7, "the few words"),  # under min_tokens
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    out = curate_corpus(
        docs, min_quality=0.3, min_tokens=5, langs=("en",),
        jaccard_threshold=0.5,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1, 4, 5}
    stats = curation_stats(docs, out).collect()[0]
    assert stats["n_input"] == 7 and stats["n_kept"] == 3
    assert abs(stats["drop_rate"] - 4 / 7) < 1e-12


def test_ivf_index_persist_and_query(spark, emb, tmp_path):
    """A persisted IVF index returns the same results as the in-memory
    ivf_topk at identical quantizer settings, and full-probe degenerates
    to the exact scan."""
    from etl_reconciliate_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_topk,
        ivf_topk_from_index,
    )

    idx = str(tmp_path / "ivf")
    info = build_ivf_index(emb, idx, dim=64, n_centroids=8, seed=7,
                           max_iter=4, init_mode="random")
    assert info["n_vectors"] == emb.count()

    queries = emb.filter(F.col("vec_id") < 10)
    from_index = ivf_topk_from_index(spark, idx, queries, k=5, nprobe=3)
    in_memory = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=3,
                         seed=7, max_iter=4, init_mode="random")
    a = {(r["query_id"], r["rank"]): r["vec_id"] for r in from_index.collect()}
    b = {(r["query_id"], r["rank"]): r["vec_id"] for r in in_memory.collect()}
    assert a == b

    # nprobe = n_centroids probes every cell → identical to brute force
    full = ivf_topk_from_index(spark, idx, queries, k=5, nprobe=8)
    exact = cosine_topk(emb, queries, k=5)
    fa = {(r["query_id"], r["rank"]): r["vec_id"] for r in full.collect()}
    ea = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    assert fa == ea


def test_ann_index_job_cli(spark, emb, tmp_path, capsys, monkeypatch):
    """The build/query job surface over the persisted IVF index: both
    subcommands run end-to-end and print one JSON stats line."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    try:
        import ann_index_job
    finally:
        sys.path.pop(0)

    idx = str(tmp_path / "idx")
    out_dir = str(tmp_path / "topk")
    monkeypatch.setattr(sys, "argv", [
        "ann_index_job.py", "build", "--vectors", EMB, "--index", idx,
        "--dim", "64", "--n-centroids", "8", "--max-iter", "4",
    ])
    assert ann_index_job.main() == 0
    build_stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert build_stats["n_vectors"] == emb.count()
    assert build_stats["n_centroids"] == 8

    monkeypatch.setattr(sys, "argv", [
        "ann_index_job.py", "query", "--index", idx, "--queries", EMB,
        "--k", "5", "--nprobe", "3", "--out", out_dir,
    ])
    assert ann_index_job.main() == 0
    q_stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert q_stats["queries"] == emb.count()
    assert q_stats["rows"] == emb.count() * 5
    res = spark.read.parquet(out_dir)
    assert set(res.columns) == {"query_id", "vec_id", "cosine", "rank"}


def test_curate_embeddings_greedy_drop(spark):
    """Embedding-level dedup curation: identical vectors collapse to the
    smallest id; the kept set is exactly all ids minus every larger-id
    side of a verified near-dup pair (greedy drop, curate.py semantics)."""
    from etl_reconciliate_spark.operators.curate import curate_embeddings
    from etl_reconciliate_spark.operators.dedupe_docs import (
        embedding_lsh_near_dup_pairs,
    )

    base = [1.0, 0.5, -0.25, 0.75, -1.0, 0.1, 0.3, -0.6]
    other = [-0.8, 0.2, 0.9, -0.1, 0.4, -0.7, 0.05, 0.55]
    rows = [(0, base), (1, base), (2, base), (3, other), (4, [0.0] * 8)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    kept = {
        r["vec_id"]
        for r in curate_embeddings(
            emb, dim=8, threshold=0.95, n_bands=2, planes_per_band=4
        ).collect()
    }
    # duplicates of vec 0 drop; the unrelated vector and the zero vector stay
    assert {3, 4} <= kept and 0 in kept and not {1, 2} & kept

    pairs = embedding_lsh_near_dup_pairs(
        emb, dim=8, threshold=0.95, n_bands=2, planes_per_band=4
    )
    dropped = {r["id_b"] for r in pairs.collect()}
    assert kept == {r[0] for r in rows} - dropped


def test_connected_components_chain_and_singletons(spark):
    """a~b, b~c with a!~c must land in ONE cluster (the transitive
    semantics the greedy drop-all-doc_b rule misses); unpaired ids come
    back as singletons."""
    from etl_reconciliate_spark.operators.dedupe_docs import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 13)], "doc_id long")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(pairs, ids=ids).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
        **{i: i for i in (4, 5, 6, 7, 8, 9, 12)},
    }


def test_connected_components_path_graph_multi_round(spark):
    """A 12-node path forces label propagation through ~11 rounds of the
    fixpoint loop (worst-case diameter), and an iteration cap below the
    diameter must raise instead of returning wrong labels."""
    import pytest as _pytest

    from etl_reconciliate_spark.operators.dedupe_docs import connected_components

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(path).collect()}
    assert got == {i: 0 for i in range(12)}
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iterations=3)


def test_dedup_clusters_transitive_keep(spark, docs):
    """dedup_clusters over the synthetic docs: 1~2 (near dup) and 1~3
    (exact dup) form one cluster with representative 1; 4 and 5 stay
    singletons. Keep rule doc_id == cluster_id retains {1, 4, 5}."""
    from pyspark.sql import functions as F

    from etl_reconciliate_spark.operators.dedupe_docs import dedup_clusters

    out = dedup_clusters(docs, threshold=0.5)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    kept = {r["doc_id"] for r in out.filter(
        F.col("doc_id") == F.col("cluster_id")).collect()}
    assert kept == {1, 4, 5}
