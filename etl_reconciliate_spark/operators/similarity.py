"""Similarity search over embedding columns (`array<float>`).

Three paths:

* ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  score with native ``zip_with``/``aggregate`` (JVM-side, codegen'd,
  no UDF), window-rank per query. O(n_queries × n_vectors) — correct
  baseline and fine when queries are few.
* ``lsh_cosine_topk`` — random-hyperplane LSH: deterministic
  pseudo-random planes (hash32-derived coefficients — reproducible
  across runs and engines, no RNG state to ship), bucket vectors by the
  sign pattern, probe only the query's bucket (+ optional multiprobe by
  flipping bits), exact re-rank inside the bucket. At 10^9 vectors the
  bucket join replaces the full scan; recall is tested against the
  brute-force oracle in tests/test_similarity.py.
* ``ivf_topk`` — inverted-file index: a k-means coarse quantizer
  (pyspark.ml, seeded) partitions vectors into cells; each query probes
  its ``nprobe`` nearest cells (Arrow-batched pandas UDF over the
  broadcast centroid matrix — the one place built-ins can't express the
  argsort) and re-ranks exactly inside them. ``nprobe = n_centroids``
  degenerates to the exact scan (tested), smaller nprobe trades recall
  for a 1/(n_centroids/nprobe) scan fraction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import Column, DataFrame, Window, functions as F


def _norm_cols(df: DataFrame, id_col: str, vec_col: str, suffix: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias(f"id_{suffix}"),
        v.alias(f"v_{suffix}"),
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)).alias(
            f"n_{suffix}"
        ),
    )


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared per-query window-rank tail: (query_id, vec_id, cosine,
    rank), ties broken by vec_id — ONE definition so the four top-k
    paths cannot drift (r4 review)."""
    w = Window.partitionBy("id_q").orderBy(
        F.col("cosine").desc(), F.col("id_v").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id_q").alias("query_id"),
            F.col("id_v").alias("vec_id"),
            F.col("cosine"),
            F.col("rank"),
        )
    )


def _probe_cells_udf(b_centers, n_probe: int):
    """Arrow-batched nearest-cells probe over the broadcast centroid
    matrix — shared by the in-memory and persisted-index IVF paths.

    Memory-lean distance kernel: the naive broadcast-difference tensor
    ``(m[:,None,:]-c)**2`` allocates batch x n_centroids x dim float64
    (~63 GB at 10k x 1024 x 768 — r4 review); since the per-row
    ||m||^2 term is constant within a row it cannot change the argsort,
    so ``-2 m @ c.T + ||c||^2`` gives the same ordering with only
    batch x n_centroids memory."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        c = b_centers.value  # (n_centroids, dim)
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        d = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype("int32")))

    return probe_cells


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine per query: (query_id, vec_id, cosine, rank).
    Ties broken by vec_id for determinism. Self-matches excluded."""
    v = _norm_cols(vectors, id_col, vec_col, "v")
    q = _norm_cols(queries, query_id_col, vec_col, "q")
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("id_v") != F.col("id_q"))
        .withColumn(
            "cosine",
            _dot("v_v", "v_q")
            / (F.greatest(F.col("n_v"), F.lit(1e-12)) * F.greatest(F.col("n_q"), F.lit(1e-12))),
        )
    )
    return _rank_topk(scored, k)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    seed: int = 7,
    max_iter: int = 10,
    init_mode: str = "k-means||",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    Build: k-means (seeded, ``pyspark.ml``) assigns every vector to its
    nearest centroid cell — in a persisted deployment this assignment is
    written once and reused across queries (it IS the index). Query:
    each query row picks its ``nprobe`` nearest centroids (pandas UDF
    over the broadcast centroid matrix: n_queries × n_centroids work,
    Arrow-batched), joins the matching cells only, exact cosine re-rank
    inside them. Returns (query_id, vec_id, cosine, rank).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("id_v"),
        F.col(vec_col).cast("array<double>").alias("v_v"),
    )
    feat = v.withColumn("_feat", array_to_vector(F.col("v_v")))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode=init_mode,
        featuresCol="_feat", predictionCol="_cell",
    ).fit(feat)
    assigned = model.transform(feat).select("id_v", "v_v", "_cell")

    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    sc = vectors.sparkSession.sparkContext
    b_centers = sc.broadcast(centers)
    probe_cells = _probe_cells_udf(b_centers, min(nprobe, n_centroids))

    q = queries.select(
        F.col(query_id_col).alias("id_q"),
        F.col(vec_col).cast("array<double>").alias("v_q"),
    ).withColumn("_cell", F.explode(probe_cells(F.col("v_q"))))

    return _rank_topk(_score_cells(q, assigned), k)


def _score_cells(q: DataFrame, assigned: DataFrame) -> DataFrame:
    """Exact cosine re-rank input: join probed cells, score, project —
    shared by both IVF paths."""
    dot = F.aggregate(
        F.zip_with(F.col("v_v"), F.col("v_q"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.greatest(  # noqa: E731
        F.sqrt(F.aggregate(F.col(c), F.lit(0.0), lambda a, x: a + x * x)),
        F.lit(1e-12),
    )
    return (
        q.join(assigned, "_cell")
        .filter(F.col("id_v") != F.col("id_q"))
        .withColumn("cosine", dot / (norm("v_v") * norm("v_q")))
        .select("id_q", "id_v", "cosine")
    )


def build_ivf_index(
    vectors: DataFrame,
    index_path: str,
    dim: int,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
    init_mode: str = "k-means||",
) -> dict:
    """Build and PERSIST an IVF index: the cell assignment parquet
    (hash-clustered by cell so a probe scans only its cells' files) and
    the centroid matrix. Build once, query many — the k-means fit is
    paid at index time, not per query (``ivf_topk`` refits per call and
    stays for ad-hoc use). Returns {n_centroids, n_vectors, path}."""
    import json
    import os

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("id_v"),
        F.col(vec_col).cast("array<double>").alias("v_v"),
    )
    feat = v.withColumn("_feat", array_to_vector(F.col("v_v")))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode=init_mode,
        featuresCol="_feat", predictionCol="_cell",
    ).fit(feat)
    assigned = model.transform(feat).select("id_v", "v_v", "_cell")
    os.makedirs(index_path, exist_ok=True)
    (
        assigned.repartition(max(1, n_centroids // 4), "_cell")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(os.path.join(index_path, "cells"))
    )
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    n_vectors = assigned.count()
    with open(os.path.join(index_path, "centroids.json"), "w") as f:
        json.dump({"dim": dim, "n_centroids": n_centroids,
                   "centroids": centers, "n_vectors": n_vectors}, f)
    return {"n_centroids": n_centroids, "n_vectors": n_vectors,
            "path": index_path}


def ivf_topk_from_index(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index (``build_ivf_index``): each query
    probes its ``nprobe`` nearest centroids (Arrow-batched pandas UDF
    over the broadcast centroid matrix) and exact-cosine re-ranks inside
    those cells only. The cells parquet is clustered by ``_cell``, so
    the probe join's scan prunes to the probed cells' files."""
    import json
    import os

    with open(os.path.join(index_path, "centroids.json")) as f:
        meta = json.load(f)
    centers = np.asarray(meta["centroids"])
    assigned = spark.read.parquet(os.path.join(index_path, "cells"))
    b_centers = spark.sparkContext.broadcast(centers)
    probe_cells = _probe_cells_udf(b_centers, min(nprobe, meta["n_centroids"]))

    q = queries.select(
        F.col(query_id_col).alias("id_q"),
        F.col(vec_col).cast("array<double>").alias("v_q"),
    ).withColumn("_cell", F.explode(probe_cells(F.col("v_q"))))

    return _rank_topk(_score_cells(q, assigned), k)


def plane_coeffs(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane matrix, computed ONCE on
    the driver: plane_p[d] = (md5_32('p:d') % 2001 - 1000) / 1000 ∈
    [-1, 1] (the md5-prefix hash matches functions.hashing.hash32, so
    an oracle engine can reproduce the exact same planes). Plain float
    literals — no per-coefficient hash expression in the plan (round-1
    verdict: 8×64 scalar md5 expression trees were pure plan bloat)."""
    out = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        out.append(row)
    return out


def _plane_matrix(dim: int, n_planes: int) -> Column:
    """The hyperplanes as ONE literal array<array<double>> column."""
    return F.array(
        *[
            F.array(*[F.lit(c) for c in row])
            for row in plane_coeffs(dim, n_planes)
        ]
    )


def plane_sign_bucket(vec: Column, dim: int, n_planes: int) -> Column:
    """Sign-pattern bucket id of ``vec`` against the deterministic
    planes: one ``transform`` over the literal plane matrix (each dot is
    a left-to-right ``zip_with``/``aggregate`` fold from 0.0 — the same
    association an expanded ``0.0 + x1*c1 + ...`` oracle expression
    uses, so buckets are bit-identical across engines). The fold packs
    bits as ``acc*2 + sign`` (plane 0 is the high bit)."""
    dots = F.transform(
        _plane_matrix(dim, n_planes),
        lambda row: F.aggregate(
            F.zip_with(vec, row, lambda x, c: x * c),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    return F.aggregate(
        dots,
        F.lit(0),
        lambda acc, d: acc * 2 + F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)),
    )


def plane_sign_band_codes(
    vec: Column, dim: int, n_bands: int, planes_per_band: int
) -> Column:
    """Array of ``n_bands`` band codes: the sign pattern of
    ``planes_per_band`` consecutive planes packed per band (same
    ``acc*2 + sign`` packing as :func:`plane_sign_bucket`). Two vectors
    colliding on ANY band are LSH candidates — the banding trades the
    all-planes-agree strictness of a single bucket for recall, exactly
    like MinHash banding."""
    n_planes = n_bands * planes_per_band
    dots = F.transform(
        _plane_matrix(dim, n_planes),
        lambda row: F.aggregate(
            F.zip_with(vec, row, lambda x, c: x * c),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    bits = F.transform(
        dots, lambda d: F.when(d >= 0, F.lit(1)).otherwise(F.lit(0))
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.aggregate(
            F.slice(bits, b * planes_per_band + 1, planes_per_band),
            F.lit(0),
            lambda acc, x: acc * 2 + x,
        ),
    )


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vector, bucket): sign-pattern bucket id from n_planes
    deterministic hyperplanes."""
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias("id"),
        v.alias("vec"),
        plane_sign_bucket(v, dim, n_planes).alias("bucket"),
    )


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: join on LSH bucket (query probes its own
    bucket plus every bucket at hamming distance ≤ multiprobe_bits),
    exact cosine re-rank within the probed buckets."""
    vb = lsh_buckets(vectors, dim, n_planes, id_col, vec_col)
    qb = lsh_buckets(queries, dim, n_planes, id_col, vec_col)

    probes = [F.col("bucket")]
    if multiprobe_bits >= 1:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    if multiprobe_bits >= 2:
        from itertools import combinations

        probes += [
            F.col("bucket").bitwiseXOR(F.lit((1 << p) | (1 << r)))
            for p, r in combinations(range(n_planes), 2)
        ]
    q = qb.select(
        F.col("id").alias("id_q"),
        F.col("vec").alias("v_q"),
        F.explode(F.array(*probes)).alias("probe"),
    ).withColumn(
        "n_q",
        F.sqrt(F.aggregate(F.col("v_q"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    v = vb.select(
        F.col("id").alias("id_v"),
        F.col("vec").alias("v_v"),
        F.col("bucket").alias("probe"),
    ).withColumn(
        "n_v",
        F.sqrt(F.aggregate(F.col("v_v"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    scored = (
        q.join(v, "probe")
        .filter(F.col("id_v") != F.col("id_q"))
        .withColumn(
            "cosine",
            _dot("v_v", "v_q")
            / (F.greatest(F.col("n_v"), F.lit(1e-12)) * F.greatest(F.col("n_q"), F.lit(1e-12))),
        )
        .select("id_q", "id_v", "cosine")
        # no distinct needed: the multiprobe XOR masks (0, 1<<p,
        # (1<<p)|(1<<r)) are pairwise-distinct and a vector sits in
        # exactly ONE bucket, so each (query, vector) pair joins at most
        # once — the r4 review found the old distinct() was a full
        # shuffle+dedup of the scored candidate set for nothing
    )
    return _rank_topk(scored, k)
