"""Portable deterministic hashing expressions.

``hash32`` produces the SAME value in Spark and DuckDB, so every
hash-based operator (minhash, simhash, LSH bands, fingerprints) is
oracle-checkable:

* Spark : ``conv(substring(md5(x), 1, 8), 16, 10)::long``
* DuckDB: ``('0x' || substr(md5(x), 1, 8))::BIGINT``

At 100 TB you'd swap md5 for ``xxhash64`` (JVM-side, ~10× faster, same
operator shapes) — md5 is the cross-engine-verifiable stand-in; the
seam is this one function.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Bump when ANY hash semantics here change (hash32/hash60 base or the
# minhash affine family): every persisted artifact whose rows embed
# these hashes (the dedup band index's band_hash values) becomes
# incompatible with freshly-computed ones, exactly like a tokenizer
# change — see operators/dedupe_docs.SIGNATURE_VERSION, which folds
# this constant into the version the index job stamps and checks.
HASH_FAMILY_VERSION = 1


def hash32(col: Column, seed: int | None = None) -> Column:
    """Deterministic unsigned 32-bit hash of a column (as long)."""
    c = col.cast("string")
    if seed is not None:
        c = F.concat(F.lit(f"{seed}\x01"), c)
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-side rendering of the same hash (for oracle_sql)."""
    inner = f"CAST({expr} AS VARCHAR)"
    if seed is not None:
        inner = f"concat('{seed}' || chr(1), {inner})"
    return f"CAST(('0x' || substr(md5({inner}), 1, 8)) AS BIGINT)"


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash (as long) — for row digests, where
    32 bits would make block-checksum collisions plausible at 100 TB
    (birthday bound ~2^16 rows/block) while 60 bits pushes the collision
    odds per 1M-row block below 2^-20. 15 hex chars keep the value
    inside signed-64 range in both engines."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hash60_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash60`."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


M32 = 1 << 32


def minhash_coeffs(n: int) -> list[tuple[int, int]]:
    """Deterministic affine coefficients for the minhash family
    ``h_i(x) = (a_i * hash32(x) + b_i) mod 2^32`` — ONE base md5 per
    shingle instead of n seeded md5s (the md5 calls were 16× of the
    minhash cost at sf0.1). a_i odd < 2^31 keeps a_i * hash32 < 2^63,
    inside signed-64 range in both engines; coefficients are md5-derived
    so the oracle side regenerates them identically."""
    import hashlib

    out = []
    for i in range(n):
        a = int(hashlib.md5(f"mh-a:{i}".encode()).hexdigest()[:8], 16) % (1 << 31) | 1
        b = int(hashlib.md5(f"mh-b:{i}".encode()).hexdigest()[:8], 16)
        out.append((a, b))
    return out
