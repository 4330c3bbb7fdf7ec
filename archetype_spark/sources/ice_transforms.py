"""Iceberg partition transforms — Column builders + Python twins.

The PUBLIC Iceberg table spec ("Partition Transforms") defines how a
source column derives its partition value: temporal binning (`year`,
`month`, `day`, `hour` — ordinals since the 1970 epoch), hashed
buckets (`bucket[N]` — 32-bit Murmur3-x86 of the value's single-value
binary form, `(hash & Integer.MAX_VALUE) % N`), and width truncation
(`truncate[W]`). Partition pruning at 100 TB lives or dies on these:
a time-range predicate over a `day(ts)`-partitioned table must map to
a day-ordinal range the manifest walk can apply BEFORE any file is
opened, and a key-equality probe over `bucket[N](id)` must hash to
exactly the one bucket a spec-compliant writer used.

Two implementations per transform, kept in lockstep by tests:

- `transform_column`: a pyspark Column expression (pure built-in
  arithmetic — stays inside whole-stage codegen; the murmur3 rounds
  are mask-ladder bigint math because a 32-bit multiply would
  overflow ANSI bigint if done naively).
- `transform_value`: the Python twin, used driver-side to map a
  scan-filter bound onto partition-value space for manifest pruning.

Temporal transforms bin the LOCAL value of a timestamp (timestamp_ntz
is timezone-free by construction; for instant timestamps Spark
renders the session-zone local value — run UTC sessions, which this
repo's harnesses pin). Bucket supports int/long/date/timestamp
sources (the spec promotes all four to a little-endian 8-byte long
before hashing); string/decimal/uuid/binary buckets refuse loudly.

Murmur3 constants and the bucket examples in the tests come from the
public MurmurHash3 reference and the Iceberg spec's Appendix B.
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = datetime.date(1970, 1, 1)
_M32 = 0xFFFFFFFF

_TRANSFORM_RE = re.compile(
    r"^(?:identity|year|month|day|hour|bucket\[(\d+)\]|truncate\[(\d+)\])$"
)


def parse_transform(t: str) -> tuple[str, int | None]:
    """'bucket[16]' -> ('bucket', 16); 'day' -> ('day', None).
    Unknown transforms (incl. `void`) refuse loudly — treating one as
    identity would scatter rows across wrong partitions on write and
    prune wrong files on read."""
    m = _TRANSFORM_RE.match(t)
    if not m:
        raise NotImplementedError(f"Iceberg partition transform {t!r}")
    if t.startswith("bucket"):
        return "bucket", int(m.group(1))
    if t.startswith("truncate"):
        return "truncate", int(m.group(2))
    return t, None


# ------------------------------------------------------------- murmur3 (long)

# 32-bit multiply without bigint overflow: split the 32-bit constant
# into 16-bit halves; (k*lo + ((k*hi & 0xffff) << 16)) & M32 keeps
# every intermediate under 2^48.


def _mul32(col: Column, const: int) -> Column:
    lo, hi = const & 0xFFFF, const >> 16
    return (
        col * F.lit(lo)
        + (col * F.lit(hi)).bitwiseAND(F.lit(0xFFFF)) * F.lit(1 << 16)
    ).bitwiseAND(F.lit(_M32))


def _rotl32(col: Column, r: int) -> Column:
    return (
        col * F.lit(1 << r) + F.shiftright(col, 32 - r)
    ).bitwiseAND(F.lit(_M32))


def with_murmur3_32_long(df, out: str, col: Column):
    """MurmurHash3 x86 32-bit (seed 0) of a bigint's 8-byte
    LITTLE-ENDIAN form — the Iceberg single-value hash for
    int/long/date/timestamp sources (ints promote to long). Adds the
    SIGNED 32-bit hash as int column `out`.

    DataFrame-level on purpose: every murmur round references its
    state twice (rotate = shift-left + shift-right of the SAME
    value), so composing the 20-odd steps as one Column expression
    doubles the tree per step — ~2^20 nodes whose generated code
    OOMs the JVM at codegen. Materializing each round as a named
    projection keeps the plan linear (Catalyst's CollapseProject
    declines to inline non-cheap expressions referenced twice); the
    whole ladder still runs inside one codegen stage."""
    t = f"__mm_{out}"

    def step(d, expr):
        return d.withColumn(t, expr)

    c = F.col(t)
    d = step(df, col.cast("bigint"))
    # unsigned 32-bit halves of the two's-complement little-endian form
    for half in (
        c.bitwiseAND(F.lit(_M32)),
        F.shiftright(c, 32).bitwiseAND(F.lit(_M32)),
    ):
        hname = f"{t}_b"
        d = d.withColumn(hname, half)
        k = F.col(hname)
        d = d.withColumn(hname, _mul32(k, 0xCC9E2D51))
        d = d.withColumn(hname, _rotl32(k, 15))
        d = d.withColumn(hname, _mul32(k, 0x1B873593))
        # h ^= k; h = rotl(h,13)*5 + const — h lives in `out`
        if out not in d.columns:
            d = d.withColumn(out, k)  # h starts at 0: 0 ^ k = k
        else:
            d = d.withColumn(out, F.col(out).bitwiseXOR(k))
        d = d.withColumn(out, _rotl32(F.col(out), 13))
        d = d.withColumn(
            out,
            (_mul32(F.col(out), 5) + F.lit(0xE6546B64)).bitwiseAND(
                F.lit(_M32)
            ),
        )
        d = d.drop(hname)
    h = F.col(out)
    d = d.withColumn(out, h.bitwiseXOR(F.lit(8)))  # len in bytes
    d = d.withColumn(out, h.bitwiseXOR(F.shiftright(h, 16)))
    d = d.withColumn(out, _mul32(h, 0x85EBCA6B))
    d = d.withColumn(out, h.bitwiseXOR(F.shiftright(h, 13)))
    d = d.withColumn(out, _mul32(h, 0xC2B2AE35))
    d = d.withColumn(out, h.bitwiseXOR(F.shiftright(h, 16)))
    # reinterpret the unsigned 32-bit value as signed int32
    d = d.withColumn(
        out,
        F.when(h >= F.lit(1 << 31), h - F.lit(1 << 32))
        .otherwise(h)
        .cast("int"),
    )
    return d.drop(t)


def murmur3_32_long_py(v: int) -> int:
    """Python twin of murmur3_32_long — drives manifest pruning and
    the lockstep tests."""
    v &= (1 << 64) - 1  # two's-complement little-endian long
    h = 0
    for block in (v & _M32, (v >> 32) & _M32):
        k = (block * 0xCC9E2D51) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * 0x1B873593) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    h ^= 8
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


# ------------------------------------------------------------- Column builders

_TEMPORAL_SOURCES = ("date", "timestamp", "timestamptz")
_BUCKET_SOURCES = ("int", "long", "date", "timestamptz")


def _as_hashable_long(col: Column, source_type: str) -> Column:
    """The spec's long promotion for bucket: date -> days from epoch,
    timestamptz -> micros from epoch, int/long -> value."""
    if source_type == "date":
        return F.datediff(col, F.lit(_EPOCH)).cast("bigint")
    if source_type == "timestamptz":
        return F.unix_micros(col)
    return col.cast("bigint")


def transform_column(col: Column, transform: str, source_type: str) -> Column:
    """`transform` applied to source column `col` of Iceberg type
    `source_type` — the derived partition value as a Column."""
    kind, param = parse_transform(transform)
    if kind == "identity":
        return col
    if kind in ("year", "month", "day", "hour"):
        if source_type not in _TEMPORAL_SOURCES:
            raise NotImplementedError(
                f"{kind} transform over Iceberg type {source_type!r}"
            )
        if kind == "year":
            return (F.year(col) - F.lit(1970)).cast("int")
        if kind == "month":
            return (
                (F.year(col) - F.lit(1970)) * F.lit(12) + F.month(col) - F.lit(1)
            ).cast("int")
        day = F.datediff(F.to_date(col), F.lit(_EPOCH))
        if kind == "day":
            return day.cast("int")
        return (day.cast("bigint") * F.lit(24) + F.hour(col)).cast("int")
    if kind == "bucket":
        raise ValueError(
            "bucket needs a DataFrame-level ladder — use "
            "with_transform_column (a single-Column murmur3 "
            "expression blows up exponentially at codegen)"
        )
    # truncate: W * floor(v / W), computed as v - pmod(v, W). For v
    # within W of the int64 lower boundary the mathematical result
    # has no int64 representation (Java Iceberg silently wraps
    # there); ANSI arithmetic errors loudly instead — the better
    # behavior, and unreachable for real truncate widths.
    if source_type in ("int", "long"):
        return (col - F.pmod(col, F.lit(param))).cast(
            "int" if source_type == "int" else "bigint"
        )
    if source_type == "string":
        return F.substring(col, 1, param)
    raise NotImplementedError(
        f"truncate transform over Iceberg type {source_type!r}"
    )


def with_transform_column(
    df, out: str, source: str, transform: str, source_type: str
):
    """Add derived partition column `out` = `transform`(`source`) to
    `df` — the one entry point writers use (handles the bucket hash
    ladder; cheap transforms are a single projection)."""
    kind, param = parse_transform(transform)
    if kind != "bucket":
        return df.withColumn(
            out, transform_column(F.col(source), transform, source_type)
        )
    if source_type not in _BUCKET_SOURCES:
        raise NotImplementedError(
            f"bucket transform over Iceberg type {source_type!r} "
            "(int/long/date/timestamptz supported)"
        )
    d = with_murmur3_32_long(
        df, out, _as_hashable_long(F.col(source), source_type)
    )
    return d.withColumn(
        out,
        F.pmod(
            F.col(out).bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(param)
        ).cast("int"),
    )


def transform_value(value, transform: str, source_type: str):
    """Python twin of transform_column for a single driver-side value
    (a scan-filter bound). Temporal inputs: datetime.date /
    datetime.datetime."""
    kind, param = parse_transform(transform)
    if value is None:
        return None
    if kind == "identity":
        return value
    if kind in ("year", "month", "day", "hour"):
        if isinstance(value, datetime.datetime):
            d, hh = value.date(), value.hour
        elif isinstance(value, datetime.date):
            d, hh = value, 0
        else:
            raise TypeError(
                f"temporal transform bound must be date/datetime, got "
                f"{type(value).__name__}"
            )
        if kind == "year":
            return d.year - 1970
        if kind == "month":
            return (d.year - 1970) * 12 + d.month - 1
        days = (d - _EPOCH).days
        return days if kind == "day" else days * 24 + hh
    if kind == "bucket":
        if isinstance(value, datetime.datetime):
            v = round((value - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
        elif isinstance(value, datetime.date):
            v = (value - _EPOCH).days
        elif isinstance(value, int):
            v = value
        else:
            raise TypeError(
                f"bucket bound must be int/date/datetime, got "
                f"{type(value).__name__}"
            )
        return (murmur3_32_long_py(v) & 0x7FFFFFFF) % param
    # truncate
    if isinstance(value, int):
        return value - (value % param)
    if isinstance(value, str):
        return value[:param]
    raise TypeError(
        f"truncate bound must be int/str, got {type(value).__name__}"
    )


def result_ice_type(transform: str, source_type: str) -> str:
    """The Iceberg type of the derived partition value."""
    kind, _param = parse_transform(transform)
    if kind in ("identity", "truncate"):
        return source_type
    return "int"


def is_order_preserving(transform: str) -> bool:
    """True when the transform is monotone in its source (the spec's
    order-preserving set) — range predicates on the source then map
    to range predicates on the partition value. Bucket is the one
    supported transform that is NOT (equality-only pruning)."""
    return parse_transform(transform)[0] != "bucket"
