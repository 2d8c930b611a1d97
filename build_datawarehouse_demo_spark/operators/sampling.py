"""Deterministic sampling & dataset splitting for training-data
pipelines.

`df.sample()` uses Spark's per-partition RNG: not reproducible across
partitionings, engines, or reruns — useless for "which exact documents
were in the training set?" questions. These operators key every
decision off md5 of a stable id (operators/dedup.py:hash32 — the same
engine-portable hash as the dedup family), so a sample is a pure
function of the data: re-runnable anywhere, joinable years later,
oracle-checkable.

Scale shape: a narrow filter/projection — no shuffle, no state; the
predicate rides to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.dedup import hash32

# hash32 yields 32-bit values; bucket to per-mille for rate precision
_BUCKETS = 1000


def _bucket(id_col: Column, seed: int, purpose: str = "") -> Column:
    """Per-mille bucket of an id. `purpose` salts the hash so different
    operators never share bucket assignments at the same seed — without
    it, a default-seed 10% sample would coincide EXACTLY with the val
    split (both 'buckets < 100'), the leakage this module exists to
    prevent."""
    keyed = F.concat(F.lit(f"{purpose}:"), id_col.cast("string")) if purpose else id_col.cast("string")
    return F.pmod(hash32(keyed, seed=seed), F.lit(_BUCKETS))


def sample_by_hash(df: DataFrame, id_col: str, rate: float, seed: int = 0) -> DataFrame:
    """Deterministic ~rate sample: keep rows whose id-hash bucket falls
    below rate·1000. Same ids are kept on every run, every engine.
    Rows with a NULL id are dropped (a null hash satisfies no
    comparison) — consistent across the sampler family.
    """
    return df.filter(_bucket(F.col(id_col), seed, purpose="sample") < round(rate * _BUCKETS))


def stratified_sample_by_hash(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, float], seed: int = 0
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of rare
    languages, 10% of the head language). Strata missing from `rates`
    are dropped — pass rate 1.0 to keep whole; an empty `rates` drops
    everything. Purpose-salted independently of sample_by_hash: the
    two operators at the same seed must draw INDEPENDENT buckets, not
    nested subsets of each other."""
    threshold: Column = F.lit(0)
    for value, rate in sorted(rates.items()):
        threshold = F.when(F.col(strata_col) == value, F.lit(round(rate * _BUCKETS))).otherwise(
            threshold
        )
    return df.filter(_bucket(F.col(id_col), seed, purpose="strat") < threshold)


def reservoir_sample_per_group(
    df: DataFrame, group_col: str, id_col: str, k: int, seed: int = 0
) -> DataFrame:
    """Deterministic fixed-size sample: exactly min(k, |group|) rows
    per group, chosen uniformly by ranking the purpose-salted id hash.

    The distributed answer to reservoir sampling — same marginal
    distribution (each member equally likely under the random-oracle
    hash), but a pure function of the data: re-runnable, engine-
    portable, oracle-checkable, and streaming-friendly (a new row
    displaces the current max-hash member iff its hash is smaller).

    Scale shape: one shuffle on group_col for the rank window. For
    heavy groups, pre-filter with an approximate per-group hash
    threshold before the window to cap state (not needed here; noted
    for the 100 TB path). Hash ties are broken by id so the window
    order is total; NULL ids are dropped (no stable identity = no
    stable sample membership).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    h = hash32(F.concat(F.lit("reservoir:"), F.col(id_col).cast("string")), seed=seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.where(F.col(id_col).isNotNull())
        .withColumn("__rs_rank", F.row_number().over(w))
        .where(F.col("__rs_rank") <= k)
        .drop("__rs_rank")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a stable split label from its id hash.

    Disjoint and exhaustive by construction; membership never changes
    when the dataset grows (a row's split depends only on its own id) —
    the property that prevents train/test leakage across dataset
    versions. The hash is salted with 'split' so split assignments are
    independent of any sample_by_hash draw at the same seed.
    """
    if not (0 <= val_frac and 0 <= test_frac and val_frac + test_frac <= 1):
        raise ValueError(
            f"val_frac={val_frac} and test_frac={test_frac} must be >= 0 and sum to <= 1"
        )
    b = _bucket(F.col(id_col), seed, purpose="split")
    # round, not int(): float repr can land just under the product
    # (0.3*1000 = 299.999…) and int() would undershoot by a bucket.
    val_hi = round(val_frac * _BUCKETS)
    test_hi = val_hi + round(test_frac * _BUCKETS)
    return df.withColumn(
        split_col,
        # null id -> null split, EXPLICITLY: the otherwise() branch
        # would silently funnel null-id rows into 'train' while the
        # samplers drop them — an unlabeled row must look unlabeled.
        F.when(F.col(id_col).isNull(), F.lit(None).cast("string"))
        .when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def weighted_reservoir_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic WEIGHTED fixed-size sample: min(k, |group|) rows
    per group with inclusion probability proportional to weight — the
    Efraimidis–Spirakis A-ES scheme (Inf. Proc. Letters 2006) with the
    random draw replaced by the engine-portable id hash.

    A-ES ranks rows by u^(1/w) for u ~ U(0,1]; equivalently (and
    numerically safer) by ln(u)/w descending. u here is
    (hash32(id)+1) / 2^32 ∈ (0, 1] — a pure function of the data, so
    the sample is re-runnable, engine-portable, and oracle-checkable
    (same rationale as reservoir_sample_per_group; a true RNG would
    make the op untestable). This is the quality-weighted corpus
    sampling step of a training-data pipeline: w = a quality score,
    and high-quality documents are proportionally more likely to make
    the cut while low-quality ones still have mass.

    Rows with NULL id, NULL weight, or weight <= 0 are dropped (zero
    weight = zero inclusion probability; no stable identity = no
    stable membership). Scale shape: one narrow pass for the key, one
    shuffle on group_col for the rank window — identical to the
    uniform reservoir.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    h = hash32(
        F.concat(F.lit("wreservoir:"), F.col(id_col).cast("string")), seed=seed
    )
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        key.desc(), F.col(id_col).asc()
    )
    return (
        df.where(
            F.col(id_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col).cast("double") > 0)
        )
        .withColumn("__wr_rank", F.row_number().over(w))
        .where(F.col("__wr_rank") <= k)
        .drop("__wr_rank")
    )


def sample_temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    budget: int,
    temperature: float = 2.0,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual/multi-source
    rebalancing every LLM data pipeline runs): each source s gets a
    quota ∝ n_s^(1/T) of the total ``budget`` — T=1 reproduces natural
    proportions, T→∞ tends to uniform across sources, the standard
    way to up-sample tail sources without flattening the head — then
    the quota is filled with a DETERMINISTIC uniform per-source draw
    (md5-hash rank, engine-portable like every sampler here).

    Only temperature=2.0 (quota ∝ sqrt(n_s)) is currently supported:
    sqrt is correctly-rounded under IEEE 754 in every engine, so the
    quota arithmetic is bit-reproducible for the oracle; a general
    pow(n, 1/T) differs in the last ulp between libm implementations
    and could flip a floor() at a quota boundary. The share is
    additionally rounded to 6dp before the floor to squash summation-
    order ulps in Σ√n. Output: sampled rows + (rnk, quota).

    Scale shape: one count aggregate per source (tiny), the scalar
    Σ√n broadcast by crossJoin, quotas broadcast into the rank filter,
    ONE shuffle on source_col for the rank window.
    """
    if temperature != 2.0:
        raise NotImplementedError(
            "only temperature=2.0 (sqrt weighting) is supported: sqrt is "
            "correctly rounded per IEEE 754, so quotas are engine-"
            "reproducible; pow(n, 1/T) is not"
        )
    from pyspark.sql import Window

    # null-id rows leave BEFORE counting: quotas must be proportional
    # to the DRAWABLE population, or a source with many null ids would
    # be over-quota'd against rows the rank window can never pick
    # (review finding r8; same filter-first discipline as
    # weighted_reservoir_per_group)
    df = df.where(F.col(id_col).isNotNull())
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(F.sum(F.sqrt(F.col("__n"))).alias("__tw"))
    quotas = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.floor(
                F.round(
                    F.lit(float(budget)) * F.sqrt(F.col("__n")) / F.col("__tw"), 6
                )
            )
            .cast("int")
            .alias("quota"),
        )
    )
    h = hash32(F.concat(F.lit("temp:"), F.col(id_col).cast("string")), seed=seed)
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("int"))
        .join(F.broadcast(quotas), source_col)
        .where(F.col("rnk") <= F.col("quota"))
    )
