"""Skew-resilient join/aggregation utilities.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.get_spark`) splits oversized partitions at runtime, but only for
sort-merge joins and only per-shuffle-block.  These utilities are the
deterministic, plan-level versions for the cases AQE cannot fix:

- `salted_join`: a fact table whose join key has a few pathological
  heavy hitters (one user id with 10^8 events) joined against a
  medium-sized table that is too big to broadcast.  Salting scatters
  each hot key across `n_salts` reducers by replicating the RIGHT side
  rows `n_salts`x — right-side volume trades for left-side balance.

The salt is a deterministic hash of the left row's tiebreaker column, so
results are reproducible across runs/partitionings (no `rand()`).

The same two-phase pattern for AGGREGATION skew lives where it is used:
`graph.materialize_edges` (salted doc-set merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left` (large, skewed on `on`) with `right` (medium:
    too big to broadcast, small enough to replicate n_salts times).

    left gets salt = pmod(xxhash64(salt_from), n_salts) — any column
    unique-ish per row works as `salt_from`; right is exploded once per
    salt value.  The join key becomes (on, salt), so a heavy hitter's
    rows spread over n_salts reducers instead of one.

    Result is row-identical to `left.join(right, on, how)` for inner and
    left joins (each left row still matches exactly the same right rows,
    via its one salt replica).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int"))
    r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return l.join(r, [on, "__salt"], how).drop("__salt")
