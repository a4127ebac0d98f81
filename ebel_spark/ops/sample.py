"""Deterministic corpus sampling / splitting / packing operators.

A 100 TB training-data pipeline needs reproducible, cluster-independent
answers to "which split is this document in?", "how do we downweight
over-represented sources?", and "how do documents pack into fixed token
budgets?".  Everything here is driven by content hashes (md5 bucket in
[0, N_BUCKETS)) or per-key window algebra, so:

* no RNG state — the same row lands in the same split on any cluster, any
  partitioning, any run (the property `random()`-based sampling lacks);
* no shuffle for split/sample assignment (pure row-local column algebra —
  narrow, whole-stage-codegen);
* packing windows are PARTITIONed by a corpus key (`source`), never global,
  so the sort parallelizes per key instead of serializing on one task.

All operators are expressible in ANSI SQL and carry full-value DuckDB
oracles in ebel_spark/queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

#: bucket resolution for hash-based assignment; 10k gives 0.01% grain
N_BUCKETS = 10_000


def hash_bucket(col: Column, salt: str = "") -> Column:
    """Stable bucket in [0, N_BUCKETS): first 8 hex chars of
    md5(salt || key) as a 32-bit int, mod N_BUCKETS.

    Distinct salts give independent assignments (the split decision must
    not correlate with the sampling decision for the same key)."""
    key = F.concat(F.lit(salt), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % N_BUCKETS
    )


def hash_order(col: Column, salt: str = "") -> Column:
    """Full-width deterministic ORDER key: the 32-hex md5 string of
    salt || key (lowercase hex compares identically in Spark and DuckDB).

    `hash_bucket` is for threshold/assignment decisions, where 10k-bucket
    grain is the documented resolution; this is for ORDERING rows by hash
    (shuffle position, slice priority, pack stream).  At 10k grain every
    bucket holds ~n/10000 rows whose ties fall back to id-ascending runs
    — same-source, same-crawl-batch neighbors pack adjacently at web
    scale.  128 bits leaves no meaningful tie mass at any corpus size."""
    return F.md5(F.concat(F.lit(salt), col.cast("string")))


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.98,
    val: float = 0.01,
) -> DataFrame:
    """Deterministic train/val/test split by id hash.

    Row-local (no shuffle); membership is a pure function of the id, so
    incremental corpus additions never reassign existing documents —
    the property that keeps eval sets stable across corpus refreshes."""
    b = hash_bucket(F.col(id_col), salt="split:")
    t_hi = int(train * N_BUCKETS)
    v_hi = t_hi + int(val * N_BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def weighted_sample(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic per-group downsampling (corpus mixing): keep a row iff
    its hash bucket falls under the group's weight.

    `weights` maps group value -> keep fraction in [0, 1].  The when-chain
    stays JVM-side (no Python, no map-type lookup), and the hash salt is
    disjoint from split_assign's so mixing never biases splits."""
    b = hash_bucket(F.col(id_col), salt="mix:")
    expr = F.lit(default_weight)
    for k, w in sorted(weights.items(), reverse=True):
        expr = F.when(F.col(key_col) == k, F.lit(w)).otherwise(expr)
    return df.where(b < (expr * N_BUCKETS).cast("long"))


def pack_bins(
    df: DataFrame,
    cost_col: Column,
    budget: int,
    part_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing: assign documents to fixed-budget bins by running
    cost within each corpus partition.

    bin_id = floor(exclusive-prefix-sum(cost) / budget): a document opens
    a new bin when its starting offset crosses a budget boundary (the
    contiguous-fill packing used to build fixed-token training shards —
    deterministic, single window pass, no driver loop).

    The window partitions by `part_col`; the per-key sort parallelizes
    across keys, so at 100 TB this is a normal hash-partitioned window,
    not a global sort."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(cost_col).over(w), F.lit(0)).cast("long")
    return df.select(
        part_col,
        order_col,
        cost_col.cast("long").alias("cost"),
        F.floor(prefix / budget).cast("long").alias("bin_id"),
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shuf:",
) -> DataFrame:
    """Reproducible global shuffle for training-order shard writes:
    shard = id-hash mod n_shards, position = rank of (hash, id) within
    the shard.  Reading shards 0..n-1 each in position order replays one
    fixed pseudo-random permutation of the corpus — on any cluster, any
    partitioning, any run (the property a `rand()` sort lacks).

    Scale shape: the window partitions BY SHARD, so the per-shard sorts
    run in parallel — a global row_number over the hash order would
    serialize the whole corpus through one task.  At 100 TB, n_shards is
    the write parallelism; each shard is one training-data file.

    Position order uses the full-width `hash_order` key: the 10k-bucket
    `hash_bucket` grain would tie ~n/10000 rows per bucket and replay
    them id-ascending — materially non-random at web scale."""
    h = hash_bucket(F.col(id_col), salt=salt)
    w = Window.partitionBy("shard").orderBy("ord", id_col)
    return (
        df.withColumn("shard", (h % n_shards).cast("int"))
        .withColumn("ord", hash_order(F.col(id_col), salt=salt))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("ord")
    )


def seq_pack(
    df: DataFrame,
    cost_col: Column,
    seq_len: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "pack:",
) -> DataFrame:
    """Concat-and-chunk context-window packing: lay the corpus out as one
    deterministic pseudo-random token stream per shard and chunk the
    stream into fixed `seq_len` windows, reporting for every document the
    exact window span it occupies — INCLUDING documents that straddle a
    window boundary (the GPT-style packing `pack_bins` deliberately does
    not model; there a document is atomic and opens a new bin).

    Per document: its shard, stream start offset, the first/last window
    index it touches, its offset inside the first window, and the number
    of windows it spans.  A downstream shard writer can materialize
    window i of a shard by streaming exactly the rows with
    seq_first <= i <= seq_last in stream order — no second pass.

    Scale shape: shard = id-hash mod n_shards makes every shard an
    independent stream, so the ONE window pass (exclusive prefix sum of
    cost, partitioned by shard, ordered by (hash, id)) parallelizes
    across shards instead of serializing a global cumsum; everything
    after the prefix sum is row-local column algebra.  n_shards is the
    write parallelism at 100 TB, exactly as in `shuffle_shards` — and as
    there, the stream order key is the full-width `hash_order`, not the
    10k-grain bucket, so the stream never degenerates into id-ascending
    runs."""
    h = hash_bucket(F.col(id_col), salt=salt)
    w = (
        Window.partitionBy("shard")
        .orderBy("ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cost = cost_col.cast("long")
    start = F.coalesce(F.sum("cost").over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("shard", (h % n_shards).cast("int"))
        .withColumn("ord", hash_order(F.col(id_col), salt=salt))
        .withColumn("cost", cost)
        .withColumn("start_off", start)
        .select(
            id_col, "shard", "cost", "start_off",
            F.floor(F.col("start_off") / seq_len)
             .cast("long").alias("seq_first"),
            F.floor(
                F.greatest(F.col("start_off") + F.col("cost") - 1,
                           F.col("start_off")) / seq_len)
             .cast("long").alias("seq_last"),
            (F.col("start_off") % seq_len).cast("long").alias("seq_off"),
            F.when(
                F.col("cost") > 0,
                F.floor((F.col("start_off") + F.col("cost") - 1) / seq_len)
                - F.floor(F.col("start_off") / seq_len) + 1)
             .otherwise(F.lit(0)).cast("long").alias("n_seqs"),
        )
    )


def budget_slice(
    df: DataFrame,
    cost_col: Column,
    budget: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "slice:",
) -> DataFrame:
    """Per-source token-budget slice: order each source's documents by a
    deterministic id-hash priority and keep rows while the running token
    total stays within `budget` — the "give me N tokens per domain" mixing
    primitive for assembling a training corpus from over-represented
    sources.

    The inclusive running sum is one window pass partitioned by source
    (parallel across sources, never a global sort); the hash priority
    makes the slice a uniform random-without-replacement subset that is
    stable across runs and engines.  Priority is the full-width
    `hash_order` key: at 10k-bucket grain the budget boundary would fall
    inside a bucket whose ties resolve id-ascending, biasing the
    boundary toward low ids."""
    pri = hash_order(F.col(id_col), salt=salt)
    w = (
        Window.partitionBy(part_col)
        .orderBy(pri.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(cost_col.cast("long")).over(w)
    return (
        df.select(
            part_col, id_col,
            cost_col.cast("long").alias("cost"),
            cum.alias("cum_cost"))
        .filter(F.col("cum_cost") <= budget)
    )


def weighted_topk_sample(
    df: DataFrame,
    weight_col: Column,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wrs:",
) -> DataFrame:
    """Efraimidis-Spirtes weighted sampling WITHOUT replacement: draw a
    deterministic uniform u in (0, 1) from each row's id hash, score it
    ln(u) / weight, and keep the global top-k scores - inclusion
    probability proportional to weight, exactly k rows, single pass.

    The randomness is pseudo-random from md5(salt || id), so the sample is
    reproducible and SQL-twinnable.  The score is rounded (9 dp) before
    ranking with the id as tiebreaker, so the top-k cut is stable across
    engines whose ln() differs in the last ulp.

    Scale shape: orderBy().limit(k) plans as TakeOrderedAndProject -
    per-partition top-k heaps then a driver merge of k*n_partitions rows,
    never a full sort or shuffle of the corpus.
    """
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    u = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
         + F.lit(0.5)) / F.lit(float(1 << 32))
    score = F.round(F.log(u) / weight_col.cast("double"), 9)
    return (
        df.withColumn("weight", weight_col.cast("long"))
        .withColumn("score", score)
        .orderBy(F.desc("score"), F.col(id_col).asc())
        .limit(k)
    )


def gumbel_topk_sample(
    df: DataFrame,
    logweight_col: Column,
    k: int,
    id_col: str = "doc_id",
    salt: str = "gum:",
) -> DataFrame:
    """Gumbel-top-k sampling over LOG weights (the Gumbel-max trick):
    perturb each row's log-weight with deterministic Gumbel noise
    g = -ln(-ln(u)) and keep the global top-k of (log_w + g) — exactly
    the without-replacement sample with inclusion probability
    proportional to exp(log_w), i.e. Efraimidis-Spirtes expressed in log
    space, which is how DSIR-style importance RESAMPLING consumes its
    log-ratio weights without ever exponentiating them (exp overflows
    for long on-target documents; the Gumbel form never does).

    Same engineering contract as weighted_topk_sample: u is pseudo-random
    from md5(salt || id) so the draw is reproducible and SQL-twinnable,
    the key is rounded (9 dp) with the id as tiebreaker so the k-cut is
    stable across engines, and orderBy().limit(k) plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    u = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
         + F.lit(0.5)) / F.lit(float(1 << 32))
    gkey = F.round(logweight_col.cast("double") - F.log(-F.log(u)), 9)
    return (
        df.withColumn("gumbel_key", gkey)
        .orderBy(F.desc("gumbel_key"), F.col(id_col).asc())
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_target: int,
    salt: str = "strat:",
) -> DataFrame:
    """Exact-size proportional stratified sample: select EXACTLY
    ``n_target`` rows with per-stratum quotas computed by the
    largest-remainder (Hamilton) method — base quota
    ``n_target * n_s // N`` per stratum, the leftover seats going to the
    strata with the largest integer remainders (ties to the smaller
    stratum value).  Rows within a stratum are chosen by deterministic
    md5 hash order, so the sample is a pure function of ids — stable
    across clusters, partitionings and reruns.

    Scale shape: quota arithmetic is ALL-INTEGER (no float rounding
    drift between engines) on the strata table, which is
    vocabulary-sized (languages/sources) — the unpartitioned
    leftover-ranking window is over that tiny table, never over rows.
    Row selection is one per-stratum row_number window (parallel per
    stratum; a single giant stratum inherits the same per-key-sort
    caveat as every windowed operator here).

    Requires n_target <= count(df) — enforced lazily: an assert_true on
    the broadcast total fails the job loudly at execution time if the
    precondition is violated (r3 ADVICE: callers rely on the exact-size
    guarantee, so a silent short sample is worse than an error).  Given
    the precondition, quotas never exceed stratum sizes.
    Returns (id_col, stratum_col) of the selected rows.
    """
    s = df.select(
        F.col(id_col), F.col(stratum_col),
        hash_order(F.col(id_col), salt=salt).alias("_h"),
    )
    counts = s.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_s"))
    tot = counts.agg(F.sum("n_s").alias("n_all"))
    # assert_true returns NULL on success; folding it (coalesced to 0)
    # into `base` keeps the check inside a live expression so column
    # pruning cannot drop it, at zero cost on the vocabulary-sized table.
    chk = F.coalesce(
        F.assert_true(
            F.lit(n_target) <= F.col("n_all"),
            F.lit(f"stratified_sample: n_target={n_target} exceeds count(df)"),
        ).cast("long"),
        F.lit(0),
    )
    q0 = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            stratum_col,
            (F.expr(f"{n_target} * n_s div n_all") + chk).alias("base"),
            F.expr(f"{n_target} * n_s % n_all").alias("rem"),
        )
    )
    all_w = Window.partitionBy(F.lit(1))
    rank_w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("rem"), F.asc(stratum_col))
    quotas = q0.select(
        stratum_col,
        (F.col("base")
         + F.when(
             F.row_number().over(rank_w)
             <= F.lit(n_target) - F.sum("base").over(all_w), 1)
         .otherwise(0)).alias("quota"),
    )
    rn_w = Window.partitionBy(stratum_col).orderBy(F.asc("_h"),
                                                   F.asc(id_col))
    return (
        s.join(F.broadcast(quotas), stratum_col)
        .withColumn("_rn", F.row_number().over(rn_w))
        .filter(F.col("_rn") <= F.col("quota"))
        .select(id_col, stratum_col)
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    n_target: int,
    weight_scale: int = 1_000_000,
    salt: str = "tmix:",
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-LM sampling
    rule of Conneau & Lample 2019 / mT5 at alpha = 0.5): source s is
    drawn with probability proportional to sqrt(n_s) instead of n_s,
    upweighting low-resource sources.  Seats are assigned by the same
    largest-remainder (Hamilton) quota arithmetic as stratified_sample,
    but over weights w_s = floor(sqrt(n_s) * weight_scale) — sqrt is
    IEEE-correctly-rounded on every engine and the floor makes the
    weight an exact integer, so quotas are all-integer and
    engine-identical (general pow() is NOT correctly rounded, which is
    why alpha is fixed at 0.5 here).  Rows within a source are chosen
    by deterministic hash order.

    A heavily upweighted small source can be awarded more seats than it
    has rows; its quota is capped at n_s (the emitted rows then
    undershoot n_target — callers needing exactness redistribute or
    lower n_target; the cap is mirrored in the SQL twin).

    Returns (id_col, source_col) of the selected rows.
    """
    s = df.select(
        F.col(id_col), F.col(source_col),
        hash_order(F.col(id_col), salt=salt).alias("_h"),
    )
    counts = s.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_s"))
    w = counts.select(
        source_col, "n_s",
        F.floor(F.sqrt(F.col("n_s")) * F.lit(weight_scale))
        .cast("long").alias("w"),
    )
    tot = w.agg(F.sum("w").alias("w_all"))
    q0 = (
        w.crossJoin(F.broadcast(tot))
        .select(
            source_col, "n_s",
            F.expr(f"{n_target} * w div w_all").alias("base"),
            F.expr(f"{n_target} * w % w_all").alias("rem"),
        )
    )
    all_w = Window.partitionBy(F.lit(1))
    rank_w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("rem"), F.asc(source_col))
    quotas = q0.select(
        source_col,
        F.least(
            F.col("n_s"),
            F.col("base")
            + F.when(
                F.row_number().over(rank_w)
                <= F.lit(n_target) - F.sum("base").over(all_w), 1)
            .otherwise(0)).alias("quota"),
    )
    rn_w = Window.partitionBy(source_col).orderBy(F.asc("_h"),
                                                  F.asc(id_col))
    return (
        s.join(F.broadcast(quotas), source_col)
        .withColumn("_rn", F.row_number().over(rn_w))
        .filter(F.col("_rn") <= F.col("quota"))
        .select(id_col, source_col)
    )
