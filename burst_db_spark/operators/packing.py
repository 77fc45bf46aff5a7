"""Dataset-assembly operators for LLM training pipelines: deterministic
split assignment and sequence packing into fixed context windows.

Both are pure column/window math — no Python in the hot path, one
shuffle each — and both use the repo's engine-portable md5 hash family
so a DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from burst_db_spark.operators.text import token_count


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of the key —
    stable across runs, engines, and cluster sizes (never use
    engine-private hash() for split assignment: re-runs must land every
    document in the same split)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    return (h % n_buckets).cast("int")


def assign_split(
    df: DataFrame,
    key: str,
    weights: dict[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment by hashed key percentile.

    ``weights`` maps split name → percent (must sum to 100); default
    98/1/1. Hash-based assignment is the 100 TB pattern: no global sort,
    no sampling state, any worker can recompute any row's split."""
    weights = weights or {"train": 98, "val": 1, "test": 1}
    if sum(weights.values()) != 100:
        raise ValueError("split weights must sum to 100")
    bucket = hash_bucket(F.col(key), 100)
    expr: Column | None = None
    acc = 0
    for name, w in weights.items():
        acc += w
        cond = bucket < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    granularity: int = 10_000,
    salt: str = "strat",
    bucket_col: str = "sample_bucket",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-mixing
    primitive of a training-data pipeline (e.g. keep 50% of English, 20%
    of everything else).

    Each row's fate is a pure function of (salt, key): md5 → bucket in
    [0, granularity) → keep iff bucket < fraction·granularity for its
    stratum. Unlike ``df.sampleBy`` (seeded Bernoulli per partition,
    resample on retry/re-run), this survives re-runs, engine changes,
    and cluster resizes unchanged — a map-side filter, zero shuffles,
    no sampling state. The salt decorrelates it from
    ``assign_split`` so sampling never biases split membership.
    """
    thresholds = {s: int(round(f * granularity)) for s, f in fractions.items()}
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % granularity
    )
    thresh: Column = F.lit(int(round(default_fraction * granularity)))
    for name, t in thresholds.items():
        thresh = F.when(F.col(strata_col) == name, F.lit(t)).otherwise(thresh)
    return df.withColumn(bucket_col, b.cast("int")).where(F.col(bucket_col) < thresh)


def temperature_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    alpha: float = 0.5,
    granularity: int = 10_000,
    salt: str = "temp",
    bucket_col: str = "sample_bucket",
) -> DataFrame:
    """Temperature-based corpus rebalancing: keep stratum s with
    probability (n_s / max_n)^alpha — the multilingual-LM mixing rule
    that upweights tail languages (alpha<1 flattens the distribution;
    alpha=1 keeps it; alpha=0 uniform). Fractions are computed
    RELATIONALLY (group counts → broadcast max → per-stratum threshold),
    no driver round-trip, and the keep decision is the same salted-md5
    bucket as ``stratified_sample`` — deterministic across runs and
    engines. alpha=0.5 uses sqrt, which IEEE requires to be correctly
    rounded, so thresholds are bit-identical in the oracle."""
    if alpha != 0.5:
        raise NotImplementedError(
            "only alpha=0.5 (sqrt) is oracle-portable; pow(x, a) is not "
            "correctly-rounded across engines"
        )
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    mx = counts.agg(F.max("__n").alias("__mx"))
    thr = counts.crossJoin(F.broadcast(mx)).select(
        strata_col,
        F.floor(F.sqrt(F.col("__n") / F.col("__mx")) * granularity)
        .cast("int")
        .alias("__thr"),
    )
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % granularity
    )
    return (
        df.withColumn(bucket_col, b.cast("int"))
        .join(F.broadcast(thr), strata_col)
        .where(F.col(bucket_col) < F.col("__thr"))
        .drop("__thr")
    )


def cap_per_group(
    df: DataFrame,
    key: str,
    group_col: str,
    k: int,
    salt: str = "cap",
) -> DataFrame:
    """Per-group contribution cap — the web-corpus "at most N documents
    per domain" rule. Survivors are the k rows with the smallest salted
    md5 of their key: a deterministic reservoir, so re-runs, engine
    changes, and late-arriving reprocessing pick the identical sample
    (a seeded random sample would re-roll). One bounded window per
    group; groups larger than k never materialize more than their rank
    prefix past the exchange (WindowGroupLimit prunes map-side)."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(key).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shard_col: Column | None = None,
    context: int = 4096,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out
    back-to-back per shard (deterministic id order) and cut into
    ``context``-token windows — the standard LLM pretraining packing,
    where a document may straddle a chunk boundary.

    Per doc: ``start_offset`` (exclusive running token count),
    ``first_chunk``/``last_chunk`` (the context windows it lands in).
    One window shuffle per shard; shards are independent, so at 100 TB
    the layout parallelizes across shards instead of one global sort."""
    shard = shard_col if shard_col is not None else (F.col(id_col) % 8)
    d = df.select(
        F.col(id_col),
        shard.cast("int").alias("shard"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / context).cast("bigint").alias("first_chunk"),
        F.floor((F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / context)
        .cast("bigint")
        .alias("last_chunk"),
    )


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    strata_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsamp",
) -> DataFrame:
    """Deterministic weighted sampling without replacement, k per
    stratum — the Efraimidis–Spirakis A-ES scheme (exponential races):
    each row draws u from (0,1) as a pure function of (salt, key) and
    ranks by ln(u)/weight (monotone with u^(1/weight)); the top-k per
    stratum is a weighted sample without replacement, rows winning with
    probability proportional to weight.

    The curation use: sample documents proportional to a quality or
    length weight instead of uniformly, reproducibly — a re-run, an
    engine swap, or a cluster resize selects the SAME rows (unlike
    rand()-seeded sampling). Plan: map-side key math + ONE window
    shuffle on the stratum (same shape as top-k-per-group); no state.

    ``weight_col`` must be strictly positive (ln(u)/w is undefined at
    w=0 and order-inverted for w<0) — standard A-ES precondition.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    from pyspark.sql import Window

    rk = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(strata_col).orderBy(
        F.desc("__aes_key"), F.col(key)
    )
    return (
        df.withColumn("__aes_key", rk)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__aes_key", "__rn")
    )


def epoch_shuffle(
    df: DataFrame,
    key: str,
    seed: str,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic corpus shuffle + fixed-size epoch sharding — the
    standard pretraining-epoch op: a seeded global permutation of the
    corpus, cut into ``n_shards`` near-equal dataloader shards, with NO
    global sort anywhere in the plan.

    The permutation key is md5(seed:key) — change the seed, get an
    independent permutation (one per epoch); re-run the job or resize
    the cluster, get the identical one (the same engine-portable idiom
    as :func:`assign_split`). The trick that avoids a global total-order
    exchange: the top 32 bits of the key split the HASH SPACE into
    ``n_shards`` contiguous ranges, so

      global position  =  (rows in lower hash ranges)  +  rank within
                          own range

    — one hash partition on the range id + a per-range local sort
    (WindowGroupLimit-friendly), plus a bounded side-pass: the per-range
    COUNTS (``n_shards`` rows, model-state-sized, same class as the
    Bloom bitset) turned into cumulative offsets and broadcast back.
    At 100 TB the only data-sized movement is the one hash exchange;
    md5 is uniform, so ranges stay balanced with no planned skew.

    Output per row: ``hash_shard`` (the physical range the row sorted
    in), ``epoch_pos`` (1-based position in the global permutation —
    hash-checkable against a plain ``row_number() OVER (ORDER BY
    md5(...))``), and ``shard`` (the FIXED-SIZE dataloader shard:
    ``(epoch_pos-1)·n_shards / N``, sizes differing by at most one row).
    """
    rk = F.md5(F.concat_ws(":", F.lit(seed), F.col(key).cast("string")))
    h = F.conv(F.substring(rk, 1, 8), 16, 10).cast("bigint")
    d = df.select(
        F.col(key),
        rk.alias("__rk"),
        F.shiftright(h * n_shards, 32).cast("int").alias("hash_shard"),
    )
    w = Window.partitionBy("hash_shard").orderBy("__rk", key)
    ranked = d.withColumn("__pos", F.row_number().over(w).cast("bigint"))
    counts = d.groupBy("hash_shard").agg(F.count("*").alias("__n"))
    w_off = Window.orderBy("hash_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "hash_shard",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("__off"),
        F.sum("__n").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("bigint").alias("__total"),
    )
    pos = F.col("__off") + F.col("__pos")
    return (
        ranked.join(F.broadcast(offsets), "hash_shard")
        .select(
            F.col(key),
            F.col("hash_shard"),
            pos.alias("epoch_pos"),
            F.col("__total"),
        )
        # integer DIV, not double /: bit-exact at any corpus size (a
        # double quotient can mis-floor near shard boundaries past 2^53)
        .withColumn(
            "shard",
            F.expr(f"CAST((epoch_pos - 1) * {n_shards} DIV __total AS INT)"),
        )
        .drop("__total")
    )


def grouped_hash_rank(
    df: DataFrame,
    key: str,
    seed: str,
    part_cols: list[str],
    n_shards: int = 8,
    out_col: str = "rank",
) -> DataFrame:
    """Per-group deterministic permutation rank WITHOUT per-group global
    sorts: the :func:`epoch_shuffle` hash-range decomposition generalized
    to partition columns. Rank of a row within its ``part_cols`` group =
    rows of the group in lower hash ranges + rank within its own range;
    the windows partition on (group, hash_shard), so even a group holding
    most of the corpus never sorts in one task — the 100 TB answer to
    `row_number() OVER (PARTITION BY source ORDER BY md5(...))`, whose
    per-source partitions go hot when sources are few and large. The
    offsets side-pass is groups x shards rows (model-state-sized).
    """
    rk = F.md5(F.concat_ws(":", F.lit(seed), F.col(key).cast("string")))
    h = F.conv(F.substring(rk, 1, 8), 16, 10).cast("bigint")
    d = df.withColumn("__ghr_rk", rk).withColumn(
        "__ghr_shard", F.shiftright(h * n_shards, 32).cast("int")
    )
    w = Window.partitionBy(*part_cols, "__ghr_shard").orderBy("__ghr_rk", key)
    ranked = d.withColumn("__ghr_pos", F.row_number().over(w).cast("bigint"))
    counts = d.groupBy(*part_cols, "__ghr_shard").agg(
        F.count("*").alias("__ghr_n")
    )
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("__ghr_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *part_cols,
        "__ghr_shard",
        F.coalesce(F.sum("__ghr_n").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("__ghr_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), [*part_cols, "__ghr_shard"])
        .withColumn(out_col, F.col("__ghr_off") + F.col("__ghr_pos"))
        .drop("__ghr_rk", "__ghr_shard", "__ghr_pos", "__ghr_off")
    )


def interleave_by_weight(
    df: DataFrame,
    key: str,
    source_col: str,
    weights: dict[str, int],
    seed: str = "mix0",
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic weighted multi-source interleave — the corpus
    MIXING SCHEDULE of a training run: source s with integer weight w_s
    contributes its k-th document (in a seeded per-source permutation)
    at virtual time t = k · (D / w_s), D = lcm of all weights. Reading
    the corpus in ``vtime`` order yields the classic stride-scheduling
    interleave: every window of the stream contains sources in
    proportion to their weights (deficit bounded by one stride), with
    no randomness to drift between runs, engines, or cluster sizes.

    All arithmetic is INTEGER (D/w_s divides exactly), so the schedule
    is bit-portable and oracle-checkable; ties at equal vtime are
    resolved by (source, rank) — a total order. Per-source ranks come
    from :func:`grouped_hash_rank` (hash-range decomposition, no hot
    per-source sort partitions). The output is (key, source, src_rank,
    vtime); a dataloader range-reads by vtime, and epoch N simply
    changes the seed. Rows whose source is not in ``weights`` are
    DROPPED (weight zero = not in the mix).
    """
    import math

    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    lcm = 1
    for w in weights.values():
        lcm = lcm * w // math.gcd(lcm, w)
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, lcm // w) for s, w in weights.items()],
        f"{source_col} string, __stride long",
    )
    ranked = grouped_hash_rank(
        df.where(F.col(source_col).isin(list(weights))),
        key,
        seed,
        [source_col],
        n_shards,
        out_col="src_rank",
    )
    return (
        ranked.join(F.broadcast(wdf), source_col)
        .select(
            F.col(key),
            F.col(source_col),
            F.col("src_rank"),
            (F.col("src_rank") * F.col("__stride")).alias("vtime"),
        )
    )
