"""Cross-engine-deterministic hashing primitives shared by the dedup /
text / fingerprint operators.

``md5_base`` maps any string to a bigint < 2^31-1 with ONE md5 call,
reproducible in ANSI SQL on any engine — the foundation that lets the
approximate operators (MinHash, SimHash, winnowing) be verified exactly
against a DuckDB oracle. ``xxhash64`` remains the cheap scale path where
cross-engine determinism isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # prime modulus of the md5 universal-hash family


def md5_base(s: Column) -> Column:
    """First 15 hex chars of md5 as a bigint, reduced mod 2^31-1.
    Spark ``conv(substr(md5(t),1,15),16,10)`` ≡ DuckDB
    ``('0x' || substr(md5(t),1,15))::BIGINT`` (verified bit-identical);
    15 hex chars < 2^60 so no engine overflows, and universal-hash
    products ``a_i * (base % p)`` stay < 2^62."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % MERSENNE31


def md5_u60(s: Column) -> Column:
    """First 15 hex chars of md5 as a uniform bigint in [0, 2^60) — the
    UN-reduced base of :func:`md5_base`, shared by every operator that
    needs a cross-engine-reproducible uniform integer (split/shard
    bucketing, KMV sketch hashes). One definition, one SQL twin
    (``('0x' || substr(md5(x), 1, 15))::BIGINT`` in DuckDB) — keeping the
    Spark expression and the oracles from drifting apart."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
