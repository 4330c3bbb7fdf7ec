"""Deterministic sampling / dataset splitting for training pipelines.

`df.sample()` / `sampleBy()` are seeded but PARTITIONING-dependent:
the same row can land in a different split when the input is
repartitioned, compacted, or re-read at a different parallelism —
poison for train/test hygiene at 100 TB, where the physical layout
changes constantly. The right primitive is a content hash of a
stable row key: assignment depends only on the key's bytes, so it is
reproducible across engines, re-ingests, cluster sizes, and time
(and auditable in SQL — the DuckDB oracle computes the identical
buckets). This is the beyond-reference training-data tier of the
brief; the reference itself has no sampling surface.

Everything is a JVM-side column expression (sha2 + conv) — no UDFs,
no shuffle: split assignment is a narrow map, so it composes with
any downstream groupBy/write without adding an exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, percent) split spec; percents must sum to 100.
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 80),
    ("val", 10),
    ("test", 10),
)


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Uniform deterministic bucket in [0, buckets) from the sha256 of
    the key's string form — the first 4 hex chars (16 bits) mod
    buckets. Portable: DuckDB computes the identical value as
    ('0x' || substr(sha256(CAST(k AS VARCHAR)), 1, 4))::UBIGINT %
    buckets, so split membership can be audited outside Spark."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.sha2(c.cast("string"), 256), 1, 4), 16, 10)
        .cast("int")
        % buckets
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket of `id_col`.

    Buckets [0,80) -> train, [80,90) -> val, [90,100) -> test under
    DEFAULT_SPLITS; custom specs just move the fences. Rows never
    migrate between splits as the corpus grows (assignment is per-key,
    not per-quantile), which is exactly the property a 100 TB ingest
    needs: append-only batches extend each split without touching
    prior assignments."""
    total = sum(p for _, p in splits)
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    b = hash_bucket(id_col)
    fence = 0
    expr = None
    for name, pct in splits:
        fence += pct
        cond = b < F.lit(fence)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(split_col, expr)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 100,
) -> DataFrame:
    """Deterministic per-group downsampling to target mixture rates —
    the domain/language rebalancing step of a training-data pipeline
    (e.g. keep 35% of an over-represented `en`, all of everything
    else), expressed as ONE narrow filter: a row survives iff its
    sha256 hash bucket is below its group's keep-percent.

    Unlike `df.sampleBy()`, membership depends only on the row key's
    bytes: re-ingests, repartitions, and engine changes keep the same
    rows, appended batches are sampled consistently with history, and
    the kept set is auditable in plain SQL. No shuffle, no UDF; the
    CASE over groups folds into the scan's filter, so at 100 TB the
    dropped fraction is discarded at read time rather than carried
    into the pipeline."""
    for g, p in rates.items():
        if not 0 <= p <= 100:
            raise ValueError(f"rate for {g!r} must be in [0, 100], got {p}")
    if not 0 <= default_pct <= 100:
        raise ValueError(f"default_pct must be in [0, 100], got {default_pct}")
    expr = None
    for g, p in sorted(rates.items()):
        cond = F.col(group_col) == F.lit(g)
        expr = F.when(cond, F.lit(p)) if expr is None else expr.when(cond, F.lit(p))
    pct = F.lit(default_pct) if expr is None else expr.otherwise(F.lit(default_pct))
    return df.filter(hash_bucket(id_col) < pct)


def mixture_resample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 100,
) -> DataFrame:
    """`mixture_sample` generalized to rates ABOVE 100%: training
    mixtures upsample under-represented domains by repeating them
    (epochs-per-domain), so a rate of 250 emits two full copies of
    every row plus a deterministic hash-chosen half for the third.
    Adds `dup_idx` (0-based copy index) so downstream shuffles and
    writers see distinct rows; rate <= 100 degrades to exactly
    `mixture_sample` membership with dup_idx=0.

    Scale: copies come from exploding a per-row `sequence(0, n-1)` —
    a narrow generate, no shuffle, no self-join; the copy count is
    data-independent per group (+1 fenced by the same sha256 bucket
    as every sampler here, so the fractional copy set is
    layout-independent and auditable in SQL)."""
    for g, p in rates.items():
        if p < 0:
            raise ValueError(f"rate for {g!r} must be >= 0, got {p}")
    if default_pct < 0:
        raise ValueError(f"default_pct must be >= 0, got {default_pct}")
    expr = None
    for g, p in sorted(rates.items()):
        cond = F.col(group_col) == F.lit(g)
        expr = F.when(cond, F.lit(p)) if expr is None else expr.when(cond, F.lit(p))
    pct = F.lit(default_pct) if expr is None else expr.otherwise(F.lit(default_pct))
    n = (pct / 100).cast("int") + (hash_bucket(id_col) < pct % 100).cast("int")
    return (
        df.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            "dup_idx", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )


def shuffle_key(key: Column | str, seed: int = 0) -> Column:
    """60-bit portable pseudorandom sort key: sha256 of 'seed:key'
    (first 15 hex chars as BIGINT). Any engine reproduces the exact
    ordering — DuckDB:
    ('0x' || substr(sha256(seed || ':' || CAST(k AS VARCHAR)), 1,
    15))::UBIGINT."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(
            F.sha2(F.concat_ws(":", F.lit(str(seed)), c.cast("string")), 256), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    shard_col: str | None = None,
    seed: int = 0,
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Reproducible pseudorandom training order — the writer-stage
    shuffle every LLM run needs (example order affects convergence;
    irreproducible order makes runs uncomparable). Epoch reshuffles
    are just a different `seed`.

    With `shard_col`: adds a per-shard 1-based `rank_col` via a
    PARTITIONED row_number over the hash key (shards shuffle
    independently and interleave at read time — a GLOBAL rank would
    be the single-task window trap, so it is simply not offered).
    Without: returns the frame globally sorted by the key — a
    parallel range-exchange sort, the right shape when the writer
    just needs files in shuffled order rather than explicit ranks."""
    k = shuffle_key(id_col, seed)
    if shard_col is None:
        return df.orderBy(k, F.col(id_col))
    from pyspark.sql import Window

    w = Window.partitionBy(shard_col).orderBy(k, F.col(id_col))
    return df.withColumn(rank_col, F.row_number().over(w).cast("bigint"))


def deterministic_sample(
    df: DataFrame, id_col: str = "doc_id", percent: int = 10
) -> DataFrame:
    """Keep a reproducible ~percent% of rows by hash bucket — the
    layout-independent replacement for df.sample() in pipelines that
    re-read their inputs (same rows survive every run and engine)."""
    if not 0 <= percent <= 100:
        raise ValueError(f"percent must be in [0, 100], got {percent}")
    return df.filter(hash_bucket(id_col) < F.lit(percent))


def temperature_mixture_rates(
    df: DataFrame, group_col: str, alpha_sqrt: bool = True
) -> DataFrame:
    """Derive per-group resampling rates that flatten the corpus
    mixture with temperature alpha = 0.5 — the multilingual/domain
    rebalancing rule (target share ∝ n_g^alpha): over-represented
    groups downsample, under-represented ones upsample, totals stay
    ~corpus-sized. Returns one row per group:
    (group_col, n_g, rate_pct) with rate_pct = floor(100 * t_g / n_g)
    where t_g = N * w_g / sum(w_g) and w_g = round(sqrt(n_g) * 1000).

    Portability is engineered, not hoped for: sqrt is IEEE-exact
    (unlike pow — hence alpha fixed at 0.5), weights quantize to
    integer milli-units with DuckDB ROUND semantics, the products
    100*N*w and sum_w*n_g are exact integers, and the single double
    division of two exact integers is bit-identical everywhere —
    zero float-accumulation anywhere. (Past ~2^53-magnitude products
    — N around 10^12 docs — promote the two products to
    decimal(38,0); the division stays one exact-input op.)

    Scale: one map-side-combinable count per group + a one-row
    broadcast of the totals; G rows out. Feed `temperature_resample`
    (or `mixture_resample` after a G-row collect) to apply."""
    from archetype_spark.queries.relational import round_like_duckdb

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    w = counts.withColumn(
        "_w", round_like_duckdb(F.sqrt("n_g") * 1000, 0).cast("bigint")
    )
    tot = w.agg(
        F.sum("n_g").alias("_n"), F.sum("_w").alias("_sw")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            F.col("n_g").cast("bigint").alias("n_g"),
            F.floor(
                (F.lit(100) * F.col("_n") * F.col("_w")).cast("double")
                / (F.col("_sw") * F.col("n_g")).cast("double")
            )
            .cast("int")
            .alias("rate_pct"),
        )
    )


def temperature_resample(
    df: DataFrame, group_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Apply `temperature_mixture_rates` end-to-end without any
    driver round-trip: the G-row rate table broadcasts back onto the
    corpus and rows repeat/drop exactly as `mixture_resample` would
    (floor(rate/100) full copies + one hash-fenced fractional copy),
    with the same layout-independent sha256 bucket fence. Adds
    (dup_idx, rate_pct)."""
    rates = temperature_mixture_rates(df, group_col)
    pct = F.col("rate_pct")
    n = (pct / 100).cast("int") + (hash_bucket(id_col) < pct % 100).cast("int")
    return (
        df.join(F.broadcast(rates.drop("n_g")), group_col)
        .withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            "dup_idx", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 100,
    id_col: str = "doc_id",
    seed: int = 0,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): keep the k rows minimizing -ln(u)/w, where u is the
    portable 60-bit hash uniform — inclusion probability proportional
    to `weight_col` (quality-weighted data selection), reproducible
    across engines/layouts/epochs (new seed = new draw). Zero-weight
    rows are never sampled and are filtered before the key (their key
    would be +inf).

    The key quantizes to integer micro-units with DuckDB ROUND
    semantics, so selection compares integers in both engines; the
    one float op (ln of a shared exact ratio) carries the usual
    negligible last-ulp-at-a-boundary caveat. The integer hash is
    incremented BEFORE the double cast (adding 1.0 to a 2^60-scale
    double is a no-op — the cast must see the integer sum).

    Scale: a narrow key projection + TakeOrdered top-k (per-partition
    heads then a k-row reduce — never a global sort); the final rank
    window runs over k rows only."""
    from pyspark.sql import Window

    from archetype_spark.queries.relational import round_like_duckdb

    sk = shuffle_key(id_col, seed)
    u = (sk + F.lit(1)).cast("double") / F.lit(float(2**60))
    w = F.col(weight_col).cast("double")
    key_micro = round_like_duckdb(-F.log(u) / w * F.lit(1e6), 0).cast("bigint")
    top = (
        df.filter(w > 0)
        .withColumn("sample_key", key_micro)
        .orderBy("sample_key", id_col)
        .limit(k)
    )
    win = Window.orderBy("sample_key", id_col)
    return top.withColumn(rank_col, F.row_number().over(win).cast("bigint"))


def quality_tiers(
    df: DataFrame,
    n_tiles: int = 3,
    by: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "exact",
) -> DataFrame:
    """CCNet-style quality bucketing: rank each group's documents by
    the shared composite quality score and cut into `n_tiles` equal
    buckets (head / middle / tail for the default 3) — the curriculum
    and selective-sampling stage (CCNet trains on the head, mixes the
    middle, drops the tail). Returns (id_col, by, quality, tier),
    tier 1 = best.

    mode='exact': NTILE over a (quality DESC, id ASC) window per
    group — deterministic, SQL-standard, the ORACLE face. The window
    sorts each group in ONE task, so exact mode is for verification
    and moderate group sizes, not the 100 TB path.

    mode='approx': tier thresholds from percentile_approx (a
    mergeable sketch — bounded memory, fully distributed), broadcast
    back as a G-row table; each row buckets by comparing its score
    against its group's thresholds. This is the scale face: no
    per-group single-task sort anywhere, at the cost of sketch-
    precision tier boundaries (agreement with exact mode is
    test-pinned on this corpus). The same exact/approx duality as
    percentiles (q54 vs percentile_approx) — verify exactly, run
    approximately."""
    if mode not in ("exact", "approx"):
        raise ValueError(f"unknown mode {mode!r}")
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    from archetype_spark.functions.text import quality_score

    d = df.select(
        F.col(id_col), F.col(by), quality_score(text_col).alias("quality")
    )
    if mode == "exact":
        from pyspark.sql import Window

        w = Window.partitionBy(by).orderBy(
            F.desc("quality"), F.asc(id_col)
        )
        return d.withColumn("tier", F.ntile(n_tiles).over(w))
    probs = [1.0 - i / n_tiles for i in range(1, n_tiles)]  # descending cuts
    th = d.groupBy(by).agg(
        F.percentile_approx("quality", probs, 10_000).alias("_th")
    )
    tier = (
        F.lit(1)
        + F.size(F.filter("_th", lambda t: F.col("quality") < t))
    ).cast("int")
    return d.join(F.broadcast(th), by).select(
        id_col, by, "quality", tier.alias("tier")
    )
