"""Deterministic dataset splitting and shard-shuffling for training
pipelines.

`randomSplit`/`sample` depend on partitioning (same seed, different
partition layout → different rows), which breaks reproducibility across
cluster sizes. These operators derive assignment from a content hash of a
stable key instead: the split of a given row is a pure function of
(key, seed) — identical at any partitioning, any cluster size, any engine
restart. That property is load-bearing for 100 TB training pipelines where
the same split must be recomputable months later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkglm_spark.plans.partitioning import require_integral_id
from sparkglm_spark.plans.prefix import global_running_sum

_BUCKETS = 1_000_000  # split resolution: 1e-6 of weight


def _bucket(id_col: str, seed: int, portable: bool = False) -> F.Column:
    if portable:
        # engine-portable affine hash (integer keys): the assignment is
        # reproducible in plain SQL — the property the driver oracle needs
        return hash_sample_expr(id_col, salt=seed % 100_000)
    return F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    portable: bool = False,
) -> dict[str, DataFrame]:
    """Partition-invariant split: {'train': 0.8, 'test': 0.2} → dict of
    disjoint DataFrames covering every row, assignment a pure function of
    (id, seed). Splits are filters over one hash expression — each split
    scans with a pushed-down predicate, no shuffle, no materialized
    assignment table. `portable=True` swaps xxhash64 for the affine hash
    (integer keys only; reproducible in any SQL engine)."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    if portable:
        # the affine hash casts to long: a string key would NULL every
        # bucket (empty splits) with no error — fail at plan time
        require_integral_id(df, id_col, "hash_split(portable=True)")
    b = _bucket(id_col, seed, portable)
    out: dict[str, DataFrame] = {}
    lo = 0.0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        hi = lo + (w / total) * _BUCKETS
        lower = F.lit(int(round(lo)))
        upper = F.lit(_BUCKETS if i == len(items) - 1 else int(round(hi)))
        out[name] = df.where((b >= lower) & (b < upper))
        lo = hi
    return out


def with_split_column(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Same assignment as `hash_split`, as a labeled column (for writing one
    partitioned-by-split dataset instead of filtering per split)."""
    total = sum(weights.values())
    if portable:
        require_integral_id(df, id_col, "with_split_column(portable=True)")
    b = _bucket(id_col, seed, portable)
    expr = None
    lo = 0.0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        hi = lo + (w / total) * _BUCKETS
        upper = _BUCKETS if i == len(items) - 1 else int(round(hi))
        cond = b < F.lit(upper)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn("split", expr)


def with_leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """`with_split_column`, but assignment hashes the near-dup CLUSTER
    label instead of the row id — every member of a duplicate cluster
    lands in the same split. Splitting by row id puts near-identical
    documents on both sides of a train/test boundary, silently
    contaminating evaluation (the same leakage decontamination guards
    against benchmarks, applied to the corpus's own splits).

    `clusters` is a (id_col, cluster_col) assignment (`near_dup_clusters`
    output, or `semantic_dedup_pairs` clusters joined to ids); rows
    absent from it fall back to their own id — the singleton-cluster
    convention, so a partial cluster table degrades gracefully to the
    plain hash split for uncovered rows.

    Plan: ONE id-equi join against the (id, cluster) projection (narrow —
    two keys per row on the wire; AQE broadcasts it when small) + the
    same pure hash projection as `with_split_column`. Assignment stays a
    pure function of (cluster label, seed): identical at any
    partitioning, any cluster size, any engine (`portable=True`)."""
    if cluster_col in df.columns:
        raise ValueError(
            f"input already carries {cluster_col!r} — drop or rename it"
        )
    keyed = df.join(
        clusters.select(F.col(id_col), F.col(cluster_col)), id_col, "left"
    ).withColumn("__lsk", F.coalesce(F.col(cluster_col), F.col(id_col)))
    out = with_split_column(keyed, "__lsk", weights, seed, portable)
    return out.drop("__lsk", cluster_col)


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    seed: int = 42,
    portable: bool = False,
) -> dict[str, DataFrame]:
    """`hash_split` at cluster grain: dict of disjoint DataFrames covering
    every row, no near-dup cluster straddling a boundary (see
    `with_leakage_safe_split` for the plan)."""
    labeled = with_leakage_safe_split(
        df, clusters, weights, id_col, cluster_col, seed, portable
    )
    return {
        name: labeled.where(F.col("split") == name).drop("split")
        for name in weights
    }


def shard_and_shuffle(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 42
) -> DataFrame:
    """Deterministic global shuffle into shards: shard = hash(id, seed) mod
    n, order within shard by a second hash. One repartition-by-shard +
    in-partition sort (`sortWithinPartitions` — no global sort barrier);
    output order is a pure function of (ids, seed)."""
    shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards))
    order = F.xxhash64(F.col(id_col), F.lit(seed + 1))
    return (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", order.asc(), F.col(id_col).asc())
    )


# Affine hash constants chosen for ANSI-safe int64 arithmetic in ANY SQL
# engine (so a DuckDB/warehouse oracle can reproduce the sample bit-for-bit):
# (key mod 2^32) · A + B with A < 2^29 keeps every intermediate < 2^62.
_AFFINE_A = 536_870_923          # prime < 2^29
_AFFINE_B = 976_369_154_383      # arbitrary fixed offset
_AFFINE_P = (1 << 61) - 1        # Mersenne modulus


def hash_sample_expr(key, salt: int = 0) -> F.Column:
    """Uniform bucket in [0, _BUCKETS) from an integer key — engine-portable
    arithmetic only (mod/mul/add), unlike xxhash64. `salt` (0 ≤ salt <
    100000) changes the MULTIPLIER, giving a different permutation — an
    additive salt would only shift every bucket by a constant, making
    "different" samples near-copies. A_salt stays < 2^30, so the product
    stays < 2^62 (ANSI-safe in any engine)."""
    if not 0 <= salt < 100_000:
        raise ValueError("salt must be in [0, 100000)")
    key = F.col(key) if isinstance(key, str) else key
    a_salt = _AFFINE_A + 2 * 1009 * salt  # stays odd, < 2^30
    h = (
        F.pmod(key.cast("long"), F.lit(1 << 32)) * F.lit(a_salt)
        + F.lit(_AFFINE_B)
    ) % F.lit(_AFFINE_P)
    return F.pmod(h, F.lit(_BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep fractions over
    the same portable key hash (rebalancing a skewed corpus — e.g. keep
    100% of a rare language, 5% of the dominant one). A pure filter:
    no shuffle, the predicate pushes below everything, and the kept set
    for a stratum at fraction f is a SUBSET of the kept set at f' > f
    (nested samples — growing a stratum's budget later only ADDS rows,
    it never resamples). Strata not in `fractions` keep
    `default_fraction`."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    require_integral_id(df, key_col, "stratified_hash_sample")
    b = hash_sample_expr(key_col, salt)
    thresh = None
    for s, f in fractions.items():
        t = F.lit(int(round(f * _BUCKETS)))
        cond = F.col(strata_col) == F.lit(s)
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(round(default_fraction * _BUCKETS)))
        if thresh is None
        else thresh.otherwise(F.lit(int(round(default_fraction * _BUCKETS))))
    )
    return df.where(b < thresh)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: int = 0
) -> DataFrame:
    """Deterministic ~`fraction` sample by key hash: partition-invariant,
    re-runnable, and reproducible in plain SQL (the oracle property —
    `sample`/TABLESAMPLE are engine- and partitioning-dependent). Keys,
    not rows, are sampled: every row of a kept key survives, so sampling
    joins/groups stays consistent across tables sharing the key."""
    require_integral_id(df, key_col, "hash_sample")
    return df.where(hash_sample_expr(key_col, salt) < F.lit(int(round(fraction * _BUCKETS))))


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    scale: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic importance sampling: keep a row iff
    hash_bucket(key) < weight·scale·_BUCKETS — i.e. per-row keep
    probability ≈ clamp(weight·scale, 0, 1), the quality-weighted
    curation step of a training-data pipeline (keep all of the best
    documents, downsample the mediocre ones in proportion to score).

    Same contract as the other split.py samplers: a PURE FILTER (no
    shuffle, pushes below everything, engine-portable affine arithmetic),
    partition-invariant and re-runnable, and keep sets are NESTED in
    `scale` — raising the budget only adds rows, never resamples.
    Weights outside [0, 1/scale] clamp (weight ≤ 0 keeps nothing,
    weight·scale ≥ 1 keeps everything); NULL weights drop the row.
    """
    if scale <= 0:
        raise ValueError("scale must be positive")
    require_integral_id(df, key_col, "weighted_hash_sample")
    b = hash_sample_expr(key_col, salt)
    thresh = F.round(F.col(weight_col).cast("double") * F.lit(float(scale) * _BUCKETS))
    return df.where(b < thresh)


def mixture_fractions(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    max_sources: int = 10_000,
) -> dict[str, float]:
    """Per-source keep fractions that turn the corpus into the TARGET
    mixture `weights` (source → relative weight, any positive scale) while
    keeping the maximum possible data: the most-underrepresented source
    keeps ~100% and every other source downsamples to match. With counts
    n_s and weights w_s, T = min_s(n_s / w_s) rows-per-unit-weight is the
    largest feasible mixture; keep_s = w_s · T / n_s.

    One partial-aggregable groupBy(source) count job; the driver sees one
    row per source (bounded by `max_sources` — exceeding it raises, this
    is a curated-source-list operator, not a group-by-arbitrary-key one).
    Sources in `weights` with no rows are ignored with a warning (they
    cannot supply data — the target mixture is met over present sources).

    Fractions are quantized to 1e-6 by FLOOR (not round: floor is
    half-convention-free, so the identical arithmetic in any SQL engine —
    the DuckDB oracle — lands on the identical integer threshold)."""
    import logging
    import math

    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if not w > 0:
            raise ValueError(f"weight for source {s!r} must be > 0 (got {w})")
    counts_df = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n"))
    rows = counts_df.take(max_sources + 1)
    if len(rows) > max_sources:
        raise ValueError(
            f"mixture_fractions: more than {max_sources} distinct sources — "
            "this operator collects one row per source; raise max_sources "
            "only if the source list is genuinely that large"
        )
    counts = {r[0]: r["n"] for r in rows}
    missing = sorted(s for s in weights if not counts.get(s))
    if missing:
        logging.getLogger(__name__).warning(
            "mixture_fractions: weighted sources with no rows ignored: %s",
            missing,
        )
    present = {s: w for s, w in weights.items() if counts.get(s)}
    if not present:
        raise ValueError("no weighted source has any rows")
    t = min(counts[s] / w for s, w in present.items())
    return {
        s: math.floor(w * t / counts[s] * float(_BUCKETS)) / _BUCKETS
        for s, w in present.items()
    }


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
    salt: int = 0,
    max_sources: int = 10_000,
) -> DataFrame:
    """Resample a multi-source corpus to a TARGET mixture — the dataset
    re-weighting step of a training run ("60% web, 30% books, 10% code"):
    derive per-source keep fractions with `mixture_fractions` (max-data
    policy: the scarcest source keeps ~100%), then apply them as the same
    pure-filter deterministic sampler as `stratified_hash_sample` — no
    shuffle, pushdown-friendly, partition-invariant, engine-portable, and
    re-runnable months later on the same data. Sources absent from
    `weights` are dropped (fraction 0); expected output size is
    sum_s(w_s) · min_s(n_s / w_s) rows in the exact target proportions
    (± per-source sampling noise)."""
    fractions = mixture_fractions(df, source_col, weights, max_sources)
    return stratified_hash_sample(
        df, key_col, source_col, fractions, default_fraction=0.0, salt=salt
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str] | str,
    cap: int,
    key_col: str,
    order_col: str | None = None,
    descending: bool = False,
    salt: int = 0,
    broadcast_drop_list: bool = True,
) -> DataFrame:
    """Keep at most `cap` rows per group — the domain-quota curation step
    ("no host contributes more than N documents"), deterministic and
    partition-invariant. Priority within a group: `order_col`
    (asc, or desc with `descending` — e.g. keep the HIGHEST-quality N) or,
    when omitted, the portable affine hash of `key_col` — an unbiased
    pseudo-random N that any SQL engine reproduces. Ties (and the hash
    variant) break on `key_col` asc, so the kept set is a pure function of
    the data. `key_col` must be UNIQUE (an id): the drop list is keyed on
    it, so a duplicated key would discard winner rows sharing a loser's
    key.

    Scale plan (the dedup drop-list idiom): the rank runs over a NARROW
    projection — (group, key, priority), never the text/payload — so the
    one rank shuffle carries ~tens of bytes per row; over-cap keys come
    back as an anti-join (broadcast by default; set
    `broadcast_drop_list=False` when caps bind on a large fraction of a
    huge corpus and the loser list outgrows the driver — the anti-join
    becomes a key-equi shuffle, still never moving content columns). A
    single group's projection rows must fit one task's sort at rank time;
    for degenerate skew (billions of rows in ONE group) prefer
    `stratified_hash_sample` with fraction ≈ cap/n_group as the
    approximate pre-pass."""
    if cap < 0:
        raise ValueError("cap must be >= 0")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if order_col is None:
        require_integral_id(df, key_col, "cap_per_group (hash priority)")
        prio = hash_sample_expr(key_col, salt)
    else:
        # NULLS LAST in BOTH directions: Spark's bare asc() is NULLS
        # FIRST, which would let null-scored rows win quota slots ahead
        # of every real-scored row — the opposite of "keep the best N"
        prio = (
            F.col(order_col).desc_nulls_last()
            if descending
            else F.col(order_col).asc_nulls_last()
        )
    from pyspark.sql import Window

    w = Window.partitionBy(*groups).orderBy(prio, F.col(key_col).asc())
    narrow = [*groups, key_col] + ([order_col] if order_col else [])
    proj = df.select(*narrow)
    losers = (
        proj.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > cap)
        .select(key_col)
    )
    side = F.broadcast(losers) if broadcast_drop_list else losers
    return df.join(side, key_col, "left_anti")


def sample_to_token_budget(
    df: DataFrame,
    token_col: str,
    budget: float,
    key_col: str | None = None,
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Down-sample a corpus to (at most) `budget` total tokens — the
    "train on exactly N tokens" curation step: keep the PREFIX of a
    deterministic order whose cumulative `token_col` stays ≤ budget.

    Order: `order_col` (e.g. a quality score desc-mapped to a column, or
    an id for a reproducible SQL oracle) or, when omitted, the portable
    affine hash of `key_col` — an unbiased pseudo-random prefix, so the
    kept set is a uniform sample at the token (not document) level and a
    pure function of the data. Rows tied on the order value share their
    fate (the RANGE prefix semantics — with a hash order a tie means a
    64-bit collision; with a user order, give a unique column).

    Plan: one bounded validation aggregation (`token_col` must be
    non-null and ≥ 0 — a NULL would silently ride inside the prefix with
    an unchanged running total, and a negative count breaks the
    prefix-≤-budget semantics), then
    `plans.prefix.global_running_sum` over the order column with
    `token_col` as the value — the range-partitioned prefix (no
    single-partition sort), then a filter. Content columns ride ONLY the
    range exchange; nothing row-level is collected. Appends `cum_tokens`
    (the inclusive running total, ≤ budget on every kept row) so the
    realized total is `max(cum_tokens)` without another pass."""
    if not budget > 0:
        raise ValueError(f"budget must be > 0, got {budget!r}")
    tok = F.col(token_col).cast("double")
    chk = df.agg(
        F.sum(
            F.when(tok.isNull() | F.isnan(tok), 1).otherwise(0)
        ).alias("nulls"),
        F.min(tok).alias("mn"),
    ).collect()[0]
    if chk["nulls"]:
        raise ValueError(
            f"{chk['nulls']} rows have null/NaN {token_col!r} — such token "
            "counts cannot participate in a token budget (NaN would poison "
            "every later running total)"
        )
    if chk["mn"] is not None and float(chk["mn"]) < 0:
        raise ValueError(f"{token_col!r} has negative values (min {chk['mn']})")
    if order_col is None:
        if key_col is None:
            raise ValueError("pass order_col or key_col (hash order)")
        require_integral_id(df, key_col, "sample_to_token_budget (hash order)")
        work = df.withColumn("__ord", hash_sample_expr(key_col))
        ord_name = "__ord"
    else:
        work = df
        ord_name = order_col
    cum = global_running_sum(
        work.withColumn("__tok", F.col(token_col).cast("double")),
        ord_name,
        ["__tok"],
        num_partitions=num_partitions,
    )
    out = (
        cum.where(F.col("__tok_cum") <= F.lit(float(budget)))
        .withColumnRenamed("__tok_cum", "cum_tokens")
        .drop("__tok")
    )
    return out.drop("__ord") if order_col is None else out
