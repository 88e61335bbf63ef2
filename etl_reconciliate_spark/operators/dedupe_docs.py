"""Document deduplication operators for training-data pipelines.

Five families, each a DataFrame→DataFrame operator with a DuckDB oracle
(see __spark_entry__.py) where SQL can express it:

* exact        — fingerprint groupBy (md5 of normalized text);
* n-gram Jaccard — exact set overlap over char-k-gram shingles;
* MinHash+LSH  — signature → banding → bucket join → candidate pairs
                 (the at-scale path: candidates ∝ near-dups, not n²);
* SimHash      — 32-bit sign-aggregated token hashes + hamming buckets;
* embedding    — cosine near-dup over `embedding: array<float>`.

Everything is native column algebra (codegen'd); hashes via the portable
``hash32`` (functions/hashing.py) so DuckDB verifies values bit-for-bit.

Scale notes: shingling explodes ~|text| rows per doc — at 100 TB run it
per-partition with ``spark.sql.files.maxPartitionBytes`` lowered so the
exploded partitions stay in memory; the minhash groupBy is a single
shuffle on doc_id; LSH bucket join shuffles on (band, band_hash) whose
cardinality ≈ n_docs × n_bands — never n². The exact-Jaccard verifier
only runs on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from etl_reconciliate_spark.functions.hashing import (
    HASH_FAMILY_VERSION,
    hash32,
)
from etl_reconciliate_spark.operators.textstats import (
    TOKENIZER_VERSION,
    with_fingerprint,
)

# Bump when banded_signature's band-hash scheme changes (the md5 over
# '_'-joined signature values, or the band/column layout). It is a
# third semantic input to the persisted index, OUTSIDE hashing.py's
# seam: swapping hashing.py's md5 for xxhash64 bumps
# HASH_FAMILY_VERSION, but the band digest here would silently keep
# stamping the same version without this constant.
BANDING_VERSION = 1

# The full semantics a persisted band-signature index depends on: text
# normalization (tokenizer), the hash family, AND the banding scheme.
# A change to ANY of the three makes freshly-hashed rows stop colliding
# with persisted ones, so the index job stamps this combined version
# and degrades an incremental --refresh to a full rebuild on mismatch
# (k/bands/rows_per_band are checked separately — they're per-index
# params, not code semantics).
SIGNATURE_VERSION = (
    f"tok{TOKENIZER_VERSION}-hash{HASH_FAMILY_VERSION}"
    f"-band{BANDING_VERSION}"
)

# ---------------------------------------------------------------- exact

def exact_duplicate_groups(docs: DataFrame) -> DataFrame:
    """Fingerprint groups with >1 doc: (fingerprint, n_docs, keep_doc_id)."""
    fp = with_fingerprint(docs)
    return (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep the min-doc_id representative of every fingerprint group."""
    fp = with_fingerprint(docs)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "fingerprint")
    )


# ------------------------------------------------------------- shingles

def char_shingles(docs: DataFrame, k: int = 8, text_col: str = "text") -> DataFrame:
    """Distinct char-k-gram shingles per doc: (doc_id, shingle).
    Normalization: the SHARED fingerprint normalization
    (``textstats.normalized_text`` — lowercase + whitespace collapse);
    one implementation so shingles and exact-dedup fingerprints can
    never normalize differently (r5 operator review). Short docs
    (<k chars) contribute their whole text as one shingle."""
    from etl_reconciliate_spark.operators.textstats import normalized_text

    d = docs.select("doc_id", normalized_text(text_col).alias("_t"))
    n = F.length("_t")
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return (
        d.withColumn("_i", F.explode(idx))
        .select("doc_id", F.expr(f"substr(_t, _i, {k})").alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


# ------------------------------------------------------- n-gram Jaccard
# (measured dead end, round 2: pre-filtering to shingles with doc-freq>1
# before the self-join SLOWED sf0.1 by ~2× — unique shingles cost only
# linear sort-merge time, while the filter adds two full shuffles of the
# exploded shingle set. The join keeps the raw shingle stream.)

def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 8, threshold: float = 0.5
) -> DataFrame:
    """EXACT Jaccard similarity over char-k-gram shingle sets for all
    pairs sharing ≥1 shingle; filtered to ≥ threshold. The shingle
    self-join is the quadratic baseline — compose with LSH candidates
    (below) at scale."""
    sh = char_shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


# ---------------------------------------------------------- MinHash/LSH

def minhash_signatures(
    docs: DataFrame, k: int = 8, n_hashes: int = 16
) -> DataFrame:
    """(doc_id, h0..h{n-1}): per-hash min over the shingle set. One
    groupBy, n_hashes parallel min-aggregates (map-side combined). The
    hash family is ONE base hash32 per shingle + affine derivations
    ``(a_i*h + b_i) mod 2^32`` (functions.hashing.minhash_coeffs) — the
    md5 is computed once, not once per seed (16× cheaper at k=16)."""
    from etl_reconciliate_spark.functions.hashing import M32, minhash_coeffs

    sh = char_shingles(docs, k)
    base = hash32(F.col("shingle"))
    aggs = [
        F.min((F.lit(a) * base + F.lit(b)) % F.lit(M32)).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_coeffs(n_hashes))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def banded_signature(
    sig: DataFrame, n_bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band a minhash signature into (doc_id, band, bh) rows — the
    persistable LSH BAND INDEX shape (one row per doc per band; bh is
    the md5 of the band's hash values). ``jobs/dedup_index_job`` writes
    this frame as the corpus index that incremental dedup probes.
    Changing the bh digest or layout requires a BANDING_VERSION bump —
    persisted indexes carry the stamp and must stop refreshing."""
    bands = []
    for b_ in range(n_bands):
        cols = [F.col(f"h{b_ * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.struct(
                F.lit(b_).alias("band"),
                F.md5(F.concat_ws("_", *[c.cast("string") for c in cols])).alias(
                    "bh"
                ),
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def minhash_band_index(
    docs: DataFrame, k: int = 8, n_bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Text → persisted-index rows in one call: shingles → minhash
    signature → banding. Deterministic (affine hash family), so an index
    built today and a signature computed over the same text next month
    agree bit-for-bit."""
    return banded_signature(
        minhash_signatures(docs, k, n_bands * rows_per_band),
        n_bands,
        rows_per_band,
    )


def lsh_candidate_pairs(
    sig: DataFrame, n_bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature, bucket-join on (band, band_hash): docs
    agreeing on ALL rows of any band become a candidate pair."""
    banded = banded_signature(sig, n_bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    k: int = 8,
    n_bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → banded candidates →
    signature-estimated Jaccard ≥ threshold.
    Returns (doc_a, doc_b, est_jaccard)."""
    n_hashes = n_bands * rows_per_band
    sig = minhash_signatures(docs, k, n_hashes)
    cand = lsh_candidate_pairs(sig, n_bands, rows_per_band)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(n_hashes)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(n_hashes)],
    )
    est = None
    for i in range(n_hashes):
        e = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        est = e if est is None else est + e
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("est_jaccard", est / F.lit(float(n_hashes)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def _pruned_verify_inputs(
    docs: DataFrame, cand: DataFrame, k: int
) -> tuple[DataFrame, DataFrame]:
    """Materialize the (small) candidate-pair set and prune the verify
    shingling to candidate DOCS only (r5): without this the verify
    exploded the whole corpus a second time — candidate docs are a
    sliver of it (near-dups ∝ corpus duplication rate). The
    ``localCheckpoint`` is deliberate: ``cand`` feeds both the id list
    and the verify join, and a lazy plan would run the bucket join
    twice; the pair set is pair-count-sized, the same lifecycle as the
    connected-components edge set."""
    cand = cand.localCheckpoint()
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    needed = docs.join(cand_ids, "doc_id", "semi")
    return cand, char_shingles(needed, k)


def lsh_jaccard_pairs(
    docs: DataFrame,
    k: int = 8,
    n_bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """THE at-scale near-dup operator: MinHash-LSH candidate generation
    → EXACT Jaccard verification on candidates only. Returns
    (doc_a, doc_b, n_common, jaccard) for candidate pairs ≥ threshold.

    Cost model at 100 TB: candidates ∝ n_docs × n_bands (bucket join),
    and the exact shingle-overlap verify shingles only candidate DOCS
    and touches only candidate pairs — never the n² of
    ``ngram_jaccard_pairs``, which stays as the small-scale exactness
    oracle."""
    sig = minhash_signatures(docs, k, n_bands * rows_per_band)
    cand = lsh_candidate_pairs(sig, n_bands, rows_per_band)
    cand, sh = _pruned_verify_inputs(docs, cand, k)
    return _exact_jaccard(cand, sh, threshold)


def _exact_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs only.
    ``cand``: (doc_a, doc_b, [extra cols carried through]);
    ``sh``: (doc_id, shingle) covering at least every doc in cand.
    Returns cand's columns + (n_common, jaccard), filtered ≥ threshold."""
    carry = [c for c in cand.columns if c not in ("doc_a", "doc_b")]
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", *carry)
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", *carry, "n_common", "jaccard")
    )


def lsh_scored_pairs(
    docs: DataFrame,
    k: int = 8,
    n_bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates scored BOTH ways — signature-estimated Jaccard
    (the cheap screen) and exact shingle-set Jaccard (the verifier) —
    filtered on the EXACT score. One signature build feeds banding and
    the estimate; the exact verify touches candidates only. Returns
    (doc_a, doc_b, est_jaccard, n_common, jaccard)."""
    n_hashes = n_bands * rows_per_band
    sig = minhash_signatures(docs, k, n_hashes)
    cand = lsh_candidate_pairs(sig, n_bands, rows_per_band)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(n_hashes)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(n_hashes)],
    )
    est = None
    for i in range(n_hashes):
        e = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        est = e if est is None else est + e
    scored = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("est_jaccard", est / F.lit(float(n_hashes)))
        .select("doc_a", "doc_b", "est_jaccard")
    )
    scored, sh = _pruned_verify_inputs(docs, scored, k)
    return _exact_jaccard(scored, sh, threshold)


def probe_band_index(fresh: DataFrame, index: DataFrame) -> DataFrame:
    """Candidate pairs from probing ``fresh`` band rows against a band
    index (both in :func:`minhash_band_index` shape): docs sharing any
    (band, bh) bucket, oriented (doc_a < doc_b) to match every oracle
    and verifier in this module. Shared by
    :func:`incremental_lsh_jaccard_pairs` and ``jobs/dedup_index_job``
    so the orientation invariant has exactly one implementation."""
    p, i = fresh.alias("p"), index.alias("i")
    return (
        p.join(
            i,
            (F.col("p.band") == F.col("i.band"))
            & (F.col("p.bh") == F.col("i.bh"))
            & (F.col("p.doc_id") != F.col("i.doc_id")),
        )
        .select(
            F.least(F.col("p.doc_id"), F.col("i.doc_id")).alias("doc_a"),
            F.greatest(F.col("p.doc_id"), F.col("i.doc_id")).alias("doc_b"),
        )
        .distinct()
    )


def incremental_lsh_jaccard_pairs(
    corpus: DataFrame,
    delta_ids: DataFrame,
    k: int = 8,
    n_bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    index: DataFrame | None = None,
) -> DataFrame:
    """CDC-driven INCREMENTAL near-dup dedup (r4 verdict item 2): find
    every near-dup pair TOUCHING the delta without re-scanning the
    corpus.

    ``delta_ids`` — one-column frame of changed/new doc_ids (in
    production: key column of ``TargetTable.read_changes`` between two
    snapshot versions).
    ``index`` — the persisted corpus band index ((doc_id, band, bh) —
    :func:`minhash_band_index`, built once by ``jobs/dedup_index_job``
    and maintained incrementally). When None it is derived from
    ``corpus`` here (correct, but that re-scans — pass the index at
    scale).

    Shape at 100 TB: delta docs' signatures are recomputed from text
    (O(delta)), probe the index on (band, bh) — a join whose left side
    is delta-sized; exact-Jaccard verification shingles ONLY the
    candidate docs (semi-join on candidate ids — bucket-prunable point
    reads against a keyed table). Daily dedup cost is O(delta +
    candidates), never O(corpus).

    Equivalence: returns exactly ``lsh_jaccard_pairs(corpus)`` filtered
    to pairs with ≥1 endpoint in the delta (pytest-proven)."""
    dids = F.broadcast(
        delta_ids.select(F.col(delta_ids.columns[0]).alias("doc_id")).distinct()
    )
    delta_docs = corpus.join(dids, "doc_id", "semi")
    if index is None:
        index = minhash_band_index(corpus, k, n_bands, rows_per_band)
    dband = minhash_band_index(delta_docs, k, n_bands, rows_per_band)
    cand = probe_band_index(dband, index)
    # candidate docs only — at scale this is a keyed point-read
    # (TargetTable.read_keys bucket pruning), not a corpus scan; the
    # pair set is localCheckpoint-ed so the index probe runs once
    cand, sh = _pruned_verify_inputs(corpus, cand, k)
    return _exact_jaccard(cand, sh, threshold)


# --------------------------------------------------------------- SimHash

def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """32-bit SimHash over whitespace tokens: bit j is the sign of
    Σ_tokens (2·bit_j(hash32(token)) − 1). Near-dups share low hamming
    distance. One explode + one groupBy with `bits` conditional sums.
    Tokens come from the SHARED ``textstats.normalized_text``
    normalization (r5 batch review: this was the one remaining inline
    copy — a normalization edit would have silently left SimHash
    signatures computed on different text than shingles/fingerprints)."""
    from etl_reconciliate_spark.operators.textstats import normalized_text

    toks = docs.select(
        "doc_id", F.explode(F.split(normalized_text(text_col), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    h = hash32(F.col("tok"))
    aggs = [
        F.sum(
            F.when(((h.bitwiseAND(F.lit(1 << j))) != 0), 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    per_doc = toks.groupBy("doc_id").agg(*aggs)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return per_doc.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming, found
    via 4-block bucketing (pigeonhole: ≤3 differing bits → at least one
    of 4 8-bit blocks identical) — candidates ∝ matches, not n²."""
    sh = simhash(docs)
    blocks = [
        F.struct(
            F.lit(i).alias("blk"),
            (F.shiftrightunsigned(F.col("simhash"), i * 8).bitwiseAND(F.lit(255)))
            .alias("bv"),
        )
        for i in range(4)
    ]
    b = sh.select("doc_id", "simhash", F.explode(F.array(*blocks)).alias("bb")).select(
        "doc_id", "simhash", F.col("bb.blk").alias("blk"), F.col("bb.bv").alias("bv")
    )
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sim_a"),
            F.col("r.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


# ------------------------------------------------------------ embeddings

def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-duplicates over `array<float>` embeddings — the
    brute-force O(n²) EXACTNESS BASELINE (native zip_with/aggregate, no
    UDF). The at-scale operator is
    :func:`embedding_lsh_near_dup_pairs` (banded sign-LSH candidates +
    exact re-rank); this one exists to oracle it and for small inputs."""
    def norm(df, suffix):
        v = F.col(vec_col).cast("array<double>")
        return df.select(
            F.col(id_col).alias(f"id_{suffix}"),
            v.alias(f"v_{suffix}"),
            F.sqrt(
                F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
            ).alias(f"n_{suffix}"),
        )

    a, b = norm(emb, "a"), norm(emb, "b")
    dot = F.aggregate(
        F.zip_with(F.col("v_a"), F.col("v_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        # norm floor: a zero vector would give 0/0 = NaN, and Spark
        # orders NaN GREATER than any number, so NaN >= threshold is
        # TRUE — every vector would read as a near-dup of the zero
        # vector (r4 review). Floored, its cosine is 0.0: never a dup.
        .withColumn(
            "cosine",
            dot / (
                F.greatest(F.col("n_a"), F.lit(1e-12))
                * F.greatest(F.col("n_b"), F.lit(1e-12))
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def connected_components(
    pairs: DataFrame,
    ids: DataFrame | None = None,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph: every node gets
    ``cluster_id`` = the MIN id reachable through the pairs. This is the
    transitive-closure dedup semantics — in a chain a~b, b~c (a≁c) all
    three land in ONE cluster with representative ``a``, unlike the
    greedy drop-all-doc_b rule (operators/curate.py) which cannot see
    chains.

    Algorithm: min-label propagation over symmetrized edges (the
    MapReduce-CC setting of Rastogi et al.'s CC-MR / hash-to-min
    family). Each round is one shuffle join (labels ⋈ edges) + one
    map-side-combined ``min`` groupBy; the frontier DataFrame is
    ``localCheckpoint``-ed every round so the plan does not grow with
    the iteration count. Convergence in O(component diameter) rounds —
    near-dup components at corpus scale are overwhelmingly tiny (LSH
    candidates ∝ n_docs × n_bands, and a same-content cluster is a
    clique, diameter 1), so 2-3 rounds is typical. Convergence is
    detected via a monotone invariant: labels only ever decrease, so
    ``sum(label)`` is strictly decreasing until the fixpoint — one tiny
    aggregate per round, no row-level diff join.

    ``pairs``   — (id_a, id_b) near-dup pairs, any orientation.
    ``ids``     — optional one-column DataFrame of ALL node ids;
                  unpaired ids come back as singleton clusters
                  (cluster_id = their own id).
    Returns (id, cluster_id), one row per node.
    """
    e = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    # materialize the symmetrized edge set ONCE: the loop joins `edges`
    # every round, and without this the whole upstream pair-generation
    # lineage (LSH banding + exact-Jaccard verification when called via
    # dedup_clusters) would re-execute per round — measured as the
    # dominant cost of the loop, and at 100 TB a full corpus re-scan
    # per round. Edge-set-sized, same lifecycle as the label frontier.
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    nodes = edges.select(F.col("src").alias("id")).distinct()
    if ids is not None:
        nodes = (
            ids.select(F.col(ids.columns[0]).cast("long").alias("id"))
            .distinct()
            .unionByName(nodes)
            .distinct()
        )
    labels = nodes.select("id", F.col("id").alias("cluster_id")).localCheckpoint()
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    for _ in range(max_iterations):
        proposed = (
            labels.join(edges, labels["id"] == edges["src"])
            .select(F.col("dst").alias("id"), "cluster_id")
        )
        labels = (
            labels.unionByName(proposed)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def dedup_clusters(
    docs: DataFrame,
    k: int = 8,
    n_bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Cluster-level near-dup dedup: LSH→exact-Jaccard pairs
    (:func:`lsh_jaccard_pairs`) → :func:`connected_components` → every
    doc labeled with its cluster representative. Keep rule downstream:
    ``doc_id == cluster_id`` retains exactly one doc per transitive
    near-dup cluster (the min id), the semantics large-corpus dedup
    pipelines standardize on.

    Returns (doc_id, cluster_id) for EVERY doc (singletons included)."""
    pairs = lsh_jaccard_pairs(docs, k, n_bands, rows_per_band, threshold)
    return connected_components(
        pairs.select("doc_a", "doc_b"), ids=docs.select("doc_id")
    ).select(F.col("id").alias("doc_id"), "cluster_id")


def embedding_lsh_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.8,
    n_bands: int = 4,
    planes_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """THE at-scale embedding near-dup operator: banded random-hyperplane
    sign-LSH candidate generation → exact cosine re-rank ≥ threshold.

    Candidate pairs ∝ bucket collisions (n_docs × n_bands bucket join),
    never the n² crossJoin of the brute-force baseline. The planes are
    deterministic driver-side literals (``similarity.plane_coeffs``) and
    every float op folds left-to-right from 0.0, so an oracle engine
    reproduces the exact same candidates AND scores bit-for-bit —
    approximate in recall, deterministic in value."""
    from etl_reconciliate_spark.operators.similarity import (
        plane_sign_band_codes,
    )

    v = F.col(vec_col).cast("array<double>")
    base = emb.select(
        F.col(id_col).alias("id"),
        v.alias("vec"),
        plane_sign_band_codes(v, dim, n_bands, planes_per_band).alias("codes"),
    )
    banded = base.select(
        "id", F.posexplode(F.col("codes")).alias("band", "code")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    vecs = base.select("id", "vec")
    va = vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("v_a"))
    vb = vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("v_b"))
    dot = F.aggregate(
        F.zip_with(F.col("v_a"), F.col("v_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        # same zero-norm NaN guard as embedding_near_dup_pairs
        .withColumn(
            "cosine",
            dot / (
                F.greatest(n("v_a"), F.lit(1e-12))
                * F.greatest(n("v_b"), F.lit(1e-12))
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
