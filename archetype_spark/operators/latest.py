"""Latest-state views — the M4 operator the reference promises but
never implements (reference: archetype/core/store.py:18-20,215 has
the docstring intent only).

These windows are THE core read pattern of the event-sourced engine:
an append-only (entity, step)-versioned table resolved to (a) the
latest row per entity, or (b) the latest write per (entity, step) —
which is how upsert (S9) and soft delete (S10) are expressed without
any in-place mutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: list[str], order: list, keep_cols: list[str] | None = None
) -> DataFrame:
    """Generic latest-wins: one row per `keys`, picked by descending
    `order` columns. One shuffle on `keys`; with the table bucketed on
    the same keys it is shuffle-free."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order])
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return out.select(*keep_cols) if keep_cols else out


def latest_state(df: DataFrame, entity_col: str = "entity_id", step_col: str = "step") -> DataFrame:
    """Latest committed step per entity."""
    return latest_per_key(df, [entity_col], [step_col])


def resolve_upserts(df: DataFrame, seq_col: str = "_seq") -> DataFrame:
    """Latest-wins over the append log: the highest write-sequence row
    per (simulation, run, entity_id, step) is the committed version —
    the read-side of MERGE (reference: store.py:258-264 does this with
    LanceDB merge_insert; here the log is immutable and the merge is a
    window)."""
    return latest_per_key(
        df, ["simulation", "run", "entity_id", "step"], [seq_col]
    ).drop(seq_col)
