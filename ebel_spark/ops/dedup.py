"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB case:
- exact dedup is a hash groupBy (map-side combine collapses duplicates
  before the shuffle);
- MinHash-LSH banding turns all-pairs similarity into an equi-join on
  (band_idx, band_hash) — candidates only ever meet inside a bucket;
- SimHash uses the pigeonhole principle over 16-bit chunks so near-dup
  candidates (hamming <= 3) share at least one of 4 chunk keys;
- n-gram Jaccard uses rare-shingle blocking (document-frequency capped) as
  the inverted index.

Verification of candidates is always exact (set Jaccard / hamming) —
LSH/blocking only bounds the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import shingles, tokens


def _pin(df: DataFrame) -> DataFrame:
    """Persist a multi-consumer intermediate (MEMORY_AND_DISK).

    The shingle/signature tables below feed 2-4 plan branches; without a
    persist each branch re-runs the expensive per-row expressions
    (shingling regex, k-permutation hashing, simhash vote fold) —
    measured 2-3x wall on the minhash operator.  MEMORY_AND_DISK spills
    per executor on a real cluster, which is the intended 100 TB
    behavior; blocks age out LRU when the query's DataFrames are
    released."""
    from pyspark import StorageLevel
    return df.persist(StorageLevel.MEMORY_AND_DISK)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Assign every row its duplicate-group canonical id (min id with the
    same sha256(text)).  `is_dup` marks rows that would be dropped."""
    h = F.sha2(F.col(text_col), 256)
    hashed = df.select(F.col(id_col).alias("id"), h.alias("text_sha"))
    canon = hashed.groupBy("text_sha").agg(F.min("id").alias("canonical_id"))
    return (
        hashed.join(canon, "text_sha")
        .select(
            "id", "text_sha", "canonical_id",
            (F.col("id") != F.col("canonical_id")).alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(sh_col, k: int = 32):
    """k-permutation MinHash over a shingle array column (seeded xxhash64)."""
    return F.array(*[
        F.array_min(F.transform(sh_col, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(k)
    ])


def _exact_jaccard(a_col, b_col):
    inter = F.size(F.array_intersect(a_col, b_col))
    union = F.size(F.array_union(a_col, b_col))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 32, bands: int = 8, shingle_n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (a < b) with exact shingle-set Jaccard >=
    threshold, candidates generated via LSH banding (k/bands rows/band)."""
    assert k % bands == 0
    rows = k // bands
    base = _pin(df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    ).filter(F.size("sh") > 0))
    sig = base.withColumn("sig", minhash_signature(F.col("sh"), k))
    # band rows carry ONLY (id, band key) — the shingle arrays would
    # otherwise be shuffled `bands` times over
    banded = sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(F.array_join(
                    F.transform(F.slice("sig", b * rows + 1, rows),
                                lambda x: x.cast("string")), ",",
                )).alias("band_hash"),
            )
            for b in range(bands)
        ])).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")

    left = banded.select("band_idx", "band_hash", F.col("id").alias("a"))
    right = banded.select("band_idx", "band_hash", F.col("id").alias("b"))
    cand = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    # exact verification: join the shingle sets back once per side
    sh_a = base.select(F.col("id").alias("a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "a").join(sh_b, "b")
        .withColumn("jaccard",
                    F.round(_exact_jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text_col):
    """64-bit SimHash over tokens, entirely in column algebra: per bit,
    sum +1/-1 votes of each token hash; bit set iff the vote is positive."""
    toks = tokens(text_col)
    # shiftright/shiftleft with a *column* shift amount need call_function
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("int"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    F.call_function("shiftright", F.xxhash64(t), i)
                    .bitwiseAND(F.lit(1)) * 2 - 1
                ).cast("int"),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(63)),
            lambda v, i: F.when(
                v > 0,
                F.call_function("shiftleft", F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def _hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance <= max_hamming.
    Candidate blocking: 4 chunks of 16 bits — any pair within hamming 3
    shares at least one identical chunk (pigeonhole)."""
    base = _pin(df.select(F.col(id_col).alias("id"),
                          simhash64(F.col(text_col)).alias("sim")))
    chunks = base.select(
        "id", "sim",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright("sim", c * 16).bitwiseAND(F.lit(0xFFFF))
                .alias("chunk"),
            ) for c in range(4)
        ])).alias("c"),
    ).select("id", "sim", "c.chunk_idx", "c.chunk")
    left = chunks.select("chunk_idx", "chunk", F.col("id").alias("a"),
                         F.col("sim").alias("sim_a"))
    right = chunks.select("chunk_idx", "chunk", F.col("id").alias("b"),
                          F.col("sim").alias("sim_b"))
    return (
        left.join(right, ["chunk_idx", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("hamming", _hamming64(F.col("sim_a"), F.col("sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard with rare-shingle blocking
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str,
    shingle_n: int = 3, threshold: float = 0.5, max_df: int = 50,
) -> DataFrame:
    """All pairs with word-shingle Jaccard >= threshold.  Blocking: inverted
    index on shingles whose document frequency <= max_df (a hot shingle
    would create a quadratic bucket — the cap IS the skew guard; pairs that
    only share ultra-common shingles are below threshold anyway when
    documents are longer than max_df shingles)."""
    base = _pin(df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    ).filter(F.size("sh") > 0))
    inv = base.select("id", F.explode("sh").alias("shingle"))
    rare = (
        inv.groupBy("shingle").count()
        .filter((F.col("count") > 1) & (F.col("count") <= max_df))
        .select("shingle")
    )
    inv = inv.join(F.broadcast(rare), "shingle")
    cand = (
        inv.alias("l").join(inv.alias("r"), "shingle")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    sh_a = base.select(F.col("id").alias("a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "a").join(sh_b, "b")
        .withColumn("jaccard",
                    F.round(_exact_jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
