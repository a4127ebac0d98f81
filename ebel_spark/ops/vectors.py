"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline — broadcast the (small) query
  set against the corpus, dot products in column algebra (zip_with +
  aggregate, whole-stage codegen), top-k per query via window rank.
- random-hyperplane LSH: the scale path — bucket join on sign-bit keys,
  exact re-rank inside buckets only.  Hyperplanes are seeded and shipped
  as literal arrays (no Python in the hot path).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row (self-matches
    excluded).  Ties break by corpus id ascending for determinism."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("corpus_id"),
                      F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("q_vec"),
                                             F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)]


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket key from random hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec_col, lit_plane) > 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
    nbits: int = 12, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket, exact cosine
    re-rank inside the bucket.  Recall grows with fewer bits / multi-probe;
    nbits trades bucket size against recall."""
    planes = hyperplanes(dim, nbits, seed)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("c_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("q_vec"),
                                             F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _l2sq(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def _nearest_lists(vec_col, centroids: list[list[float]], nprobe: int):
    """Array of the `nprobe` nearest centroid indices (squared-L2,
    ties break toward the lower index) — pure column algebra."""
    entries = [
        F.struct(
            _l2sq(vec_col, F.array(*[F.lit(float(x)) for x in c])).alias("d"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(centroids)
    ]
    ranked = F.array_sort(F.array(*entries))
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])


# fixed-point scale for the centroid update: per-element floor(x * SCALE)
# is a row-local map, and LONG sums are exact, so the aggregate is
# independent of partitioning / summation order — the one thing a float
# avg() cannot promise on a distributed reduce.  1e6 keeps ~6 fractional
# digits, far below any assignment-flipping distance gap.
IVF_SCALE = 1_000_000.0


def ivf_train_centroids(
    corpus: DataFrame, nlist: int, dim: int, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: seed centroids are the `nlist`
    corpus vectors with the smallest xxhash64(id) (a seeded sample that
    needs no Date/Random), refined with `iters` Lloyd rounds — assignment
    is a map-only pass against broadcast literal centroids, the update is
    one partial-aggregated groupBy over EXACT scaled-integer sums, so the
    trained model is bit-identical under any partitioning (a float avg()
    would depend on partial-aggregation order; this is what lets the
    approximate probe path carry a full-value driver-side oracle twin).
    The returned model is nlist×dim floats (driver-sized by construction);
    at 100 TB you train on exactly this plan over a sampled corpus and
    only the tiny model ever leaves the executors.

    The Lloyd assignment rides the centroids as broadcast DATA (a tiny
    nlist-row DataFrame cross join), not as literals baked into the
    expression tree: literal centroids change every iteration, so Janino
    recompiled the giant nlist×dim codegen method per round — measured
    ~8 s/round compile vs ~2 s execute at nlist=8, dim=64.  With
    centroids as data the generated code is centroid-independent and
    compiles once per session across all iterations AND all IVF queries.
    min(struct(d, list_id)) keeps the exact lower-index tie-break and the
    same per-pair fold arithmetic as _nearest_lists, so the trained model
    (and its Python oracle twin) is unchanged."""
    base = corpus.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("v"))
    spark = corpus.sparkSession
    seed_rows = (
        base.withColumn("h", F.xxhash64(F.col("id").cast("string")))
        .orderBy("h", "id").limit(nlist).select("v").collect()
    )
    cents = [[float(x) for x in r.v] for r in seed_rows]
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "list_id int, cvec array<double>")
        dist = F.aggregate(
            F.zip_with(F.col("v"), F.col("cvec"),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, t: acc + t)
        assigned = (
            base.crossJoin(F.broadcast(cdf))
            .withColumn("d", dist)
            .groupBy("id")
            .agg(F.min(F.struct(F.col("d"), F.col("list_id"))).alias("m"),
                 F.first("v").alias("v"))
            .select(F.col("m.list_id").alias("list_id"), "v")
        )
        sums = (
            assigned.groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 *[F.sum(F.floor(F.col("v")[i] * IVF_SCALE).cast("long"))
                   .alias(f"s{i}") for i in range(dim)])
            .collect()
        )
        new = {
            int(r.list_id):
                [int(r[f"s{i}"]) / (IVF_SCALE * int(r.n))
                 for i in range(dim)]
            for r in sums
        }
        # empty lists keep their previous centroid
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return cents


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
    nlist: int = 8, nprobe: int = 2, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """IVF-flat approximate top-k: corpus rows live in their nearest-centroid
    inverted list; each query probes its `nprobe` nearest lists and exact
    cosine re-ranks only inside them.  Candidate generation is an equi-join
    on list_id — never all-pairs — so the probe cost scales with
    nprobe/nlist of the corpus.  nprobe == nlist degrades gracefully to the
    exact brute-force result (the pytest invariant)."""
    cents = ivf_train_centroids(corpus, nlist, dim, iters=iters,
                                id_col=id_col, vec_col=vec_col)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("c_vec"),
        _nearest_lists(F.col(vec_col), cents, 1)[0].alias("list_id"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        F.explode(_nearest_lists(F.col(vec_col), cents, nprobe))
        .alias("list_id"))
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("q_vec"),
                                             F.col("c_vec")), decimals))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def embedding_cosine_dup_pairs(
    df: DataFrame, threshold: float = 0.95, dim: int = 64,
    nbits: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold) via LSH bucket
    self-join + exact verification."""
    planes = hyperplanes(dim, nbits, seed)
    from .dedup import _pin
    # both self-join sides read this — pin so the nbits dot-products per
    # row run once (see dedup._pin)
    b = _pin(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                       lsh_bucket(F.col(vec_col), planes).alias("bucket")))
    left = b.select("bucket", F.col("id").alias("a"), F.col("v").alias("va"))
    right = b.select("bucket", F.col("id").alias("b"), F.col("v").alias("vb"))
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def ivf_dup_pairs(
    df: DataFrame, threshold: float = 0.45, dim: int = 64,
    nlist: int = 8, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Semantic near-duplicate pairs via the IVF coarse quantizer: every
    vector lands in its nearest-centroid list (k-means clusters as the
    semantic blocking key), candidate pairs come from a list_id equi-join
    (never all-pairs), and exact cosine verifies inside each list.

    This is the clustering counterpart of the hyperplane-LSH pair
    generator (embedding_cosine_dup_pairs): LSH buckets are random and
    oblivious; IVF lists adapt to the corpus density, so recall per
    candidate is higher when duplicates cluster semantically.  At 100 TB
    the quantizer trains on a sample (driver holds only nlist×dim
    floats) and the self-join shuffles once on list_id; a hot list is
    AQE-splittable."""
    cents = ivf_train_centroids(df, nlist, dim, iters=iters,
                                id_col=id_col, vec_col=vec_col)
    from .dedup import _pin
    # both self-join sides read the assignment — pin so the nlist
    # distance evaluations per row run once
    b = _pin(df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        _nearest_lists(F.col(vec_col), cents, 1)[0].alias("list_id")))
    left = b.select("list_id", F.col("id").alias("a"),
                    F.col("v").alias("va"))
    right = b.select("list_id", F.col("id").alias("b"),
                     F.col("v").alias("vb"))
    return (
        left.join(right, "list_id")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos_raw", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos_raw") >= threshold)
        .select("a", "b", F.round("cos_raw", decimals).alias("cosine"))
    )
