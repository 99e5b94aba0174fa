"""Canonicalization helpers (SURVEY.md §5.3 determinism discipline).

Shared by every registered query so Spark output hashes equal the DuckDB
oracle's: floats rounded to 4 decimals, timestamps emitted as epoch seconds
(floor) or ISO strings, arrays emitted sorted/joined.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def ident(col: Column | str, alias: str | None = None) -> Column:
    """Pass-through alias helper.

    IMPORTANT determinism finding (verified): ``round(double, n)`` DISAGREES
    between Spark and DuckDB — Spark rounds the shortest-decimal repr
    (BigDecimal.valueOf), DuckDB rounds the binary value, so e.g.
    17947.609949999996 rounds to 17947.61 vs 17947.6099.  Per-row IEEE-754
    arithmetic (+,-,*,/) is bit-deterministic across engines, so the rule is:
    never round doubles for output; make nondeterministic *accumulations*
    exact via DECIMAL (dsum/davg) instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.alias(alias) if alias else c


# Back-compat alias used where a "canonicalize float" marker reads better.
r4 = ident


def epoch_s(col: Column | str, alias: str | None = None) -> Column:
    """Timestamp (tz or ntz) -> epoch seconds as BIGINT, flooring sub-seconds.

    DuckDB twin: ``CAST(floor(epoch(ts)) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.floor(c.cast("timestamp").cast("double")).cast("long")
    return c.alias(alias) if alias else c


def iso_date(col: Column | str, alias: str | None = None) -> Column:
    """Timestamp -> 'YYYY-MM-DD' string.  DuckDB twin: strftime(ts,'%Y-%m-%d')."""
    c = F.date_format(F.col(col) if isinstance(col, str) else col, "yyyy-MM-dd")
    return c.alias(alias) if alias else c


def dsum(col: Column | str, alias: str | None = None, scale: int = 2) -> Column:
    """Exact grouped SUM of a money-like column via DECIMAL, emitted as double.

    Float summation order differs across engines/partitionings; summing in
    DECIMAL(18,s) is exact and associative, so the hash matches bit-for-bit.
    DuckDB twin: ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return c.alias(alias) if alias else c


def davg(col: Column | str, alias: str | None = None, scale: int = 2) -> Column:
    """Deterministic AVG: exact decimal sum, then one IEEE double division.

    DuckDB twin:
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
    return c.alias(alias) if alias else c


#: DuckDB-side epoch-seconds expression (keep in one place for consistency).
def sql_epoch_s(expr: str) -> str:
    return f"CAST(floor(epoch({expr})) AS BIGINT)"


def md5_int(col: Column, hexdigits: int) -> Column:
    """First ``hexdigits`` hex digits of md5(col as string), as BIGINT.

    THE single definition of the engine-neutral hash-integer trick every
    deterministic sampling/bucketing operator builds on (hash splits,
    md5-as-uniform Bernoulli draws, packing buckets, count-min rows):
    md5 is md5 everywhere, so the value — and anything derived from it —
    is identical in Spark and the DuckDB oracle, stable under
    repartitioning, and RNG-free.  DuckDB twin: ``sql_md5_int``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, hexdigits), 16, 10).cast(
        "long"
    )


def sql_md5_int(expr: str, hexdigits: int) -> str:
    """DuckDB twin of ``md5_int``; pass a VARCHAR-typed SQL expression."""
    return (
        f"CAST('0x' || substring(md5({expr}), 1, {hexdigits}) AS BIGINT)"
    )


def surrogate_shuffle_keys(spark) -> bool:
    """Session opt-in for hash-surrogate shuffle keys on string-keyed
    exchanges (``spark.graft.surrogateShuffleKeys``, default false).

    The shingle family (dedup_span_fraction, pipeline_bpe_pairs,
    text_bigram_surprisal) shuffles corpus-scale streams keyed on raw
    n-gram STRINGS (~30-60 B each) that never reach the output; with the
    flag on, those keys are replaced by a 96-bit two-column surrogate
    (``surrogate_key_pair``) right after shingling, so every exchange
    and join moves 16 fixed bytes per key (two BIGINT columns) instead.
    Default OFF: on this
    single-node loopback box shuffle "network" is memory and CPU is the
    scarce resource, so the hash cost only pays off where exchanges
    cross a real network or spill (measured both ways at sf1 —
    tools/scaleup_r10_surrogate.json; an md5-based 120-bit variant was
    measured first and rejected: 0.86x bytes for 1.96x wall).  Flag-on
    is value-identical (the keys are internal — proven by the parity
    tests in tests/test_surrogate_keys.py) up to surrogate collisions:
    at 10^10 distinct shingles the 96-bit birthday bound is ~6e-10.
    """
    return (
        str(spark.conf.get("spark.graft.surrogateShuffleKeys", "false")).lower()
        == "true"
    )


def surrogate_key_pair(col: Column | str) -> tuple[Column, Column]:
    """96-bit-entropy surrogate key: (xxhash64, crc32) of the string.

    Two BIGINT columns — 16 B per key on the wire (crc32 carries 32 bits
    of entropy but serializes as a long).

    Companion of ``surrogate_shuffle_keys``.  Two INDEPENDENT JVM-native
    hash passes (a two-arg xxhash64(s, lit) is NOT independent — Spark
    folds extra columns through the running hash, so the second value is
    a pure function of the first); xxhash64+crc32 differ structurally,
    giving the pair its full 96 bits: birthday bound ~(n^2)/2^97, i.e.
    ~6e-10 at 10^10 distinct keys.  Chosen over an md5-split 120-bit
    variant on measurement: md5 is a crypto hash and cost 1.96x wall at
    sf1 for the same byte saving (tools/scaleup_r10_surrogate.json)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.xxhash64(c), F.crc32(c.cast("binary")).cast("long"))
