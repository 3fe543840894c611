"""Portable deterministic hashing.

MinHash/SimHash/fingerprint operators need hash values that an external
SQL oracle (DuckDB) can reproduce exactly. Spark's ``hash``/``xxhash64``
aren't portable, so we derive integers from ``md5`` hex — identical in
any engine with md5 + hex parsing. md5 costs more than xxhash64 but these
ops hash short shingle strings, not documents; the cost is per-token
compute with no shuffle impact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def md5_i64(col: Column | str) -> Column:
    """First 15 hex digits of md5 as a non-negative BIGINT (60 bits —
    stays clear of signed-overflow differences between engines)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def md5_i32(col: Column | str) -> Column:
    """First 8 hex digits of md5 as a BIGINT in [0, 2^32)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 8), 16, 10).cast("bigint")
