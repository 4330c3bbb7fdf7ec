"""Skew mitigation operators (SURVEY §4 scale contract).

AQE's runtime skew-join split (on by default in session.py) is the
first line of defense; these are the explicit constructions for when
the skew is KNOWN ahead of time — a hot grouping key or a hot join
key whose single reducer would otherwise stall the stage:

- `salted_agg`: two-phase aggregation. Rows get a salt in [0, n);
  phase 1 aggregates on (key, salt) — n reducers share each hot key —
  phase 2 combines the partials per key. Only works for decomposable
  aggregates (sum/count/min/max — avg must be carried as sum+count).
- `salted_join`: the fact side salts each row; the dimension side is
  replicated n times (explode of a literal sequence), and the join
  runs on (key, salt) — each hot key's rows spread over n reducers at
  the cost of n-way replication of the other side. Use when the
  replicated side is small-ish but past the broadcast budget (if it
  broadcasts, just broadcast — no salt needed).

Both are pure DataFrame compositions: results are identical to the
unsalted plans (test-pinned), only the shuffle key cardinality
changes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salt: int) -> Column:
    """Deterministic per-row salt: hash of the whole row spread over
    [0, n_salt). Deterministic (test- and retry-stable) while
    decorrelated from the grouping key, which is what spreads a hot
    key's rows across reducers."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt)).cast(
        "int"
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation. `aggs` maps column -> one of
    sum/count/min/max; the output column is named `<fn>_<col>`.
    Phase 1 shuffles on (keys, salt): a key with 10^9 rows lands on
    n_salt reducers instead of one. Phase 2 shuffles n_salt partial
    rows per key — trivial."""
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in fns:
            raise ValueError(f"non-decomposable aggregate {fn!r}; use sum/count/min/max")
    keys = list(keys)
    salted = df.withColumn("_salt", _salt_col(df, n_salt))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[fns[fn](c).alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            combine[fn](f"{fn}_{c}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact rows salt into [0, n_salt); every dim
    row is replicated once per salt value; the join key becomes
    (keys..., salt). Row-identical to fact.join(dim, keys, how) —
    each (fact row, dim row) match pair still meets exactly once,
    in the fact row's salt slice. Supports inner/left joins (the
    replicated side's unmatched rows would appear n_salt times under
    right/outer — rejected)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(keys)
    f = fact.withColumn("_salt", _salt_col(fact, n_salt))
    d = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>")),
    )
    return f.join(d, [*keys, "_salt"], how).drop("_salt")
