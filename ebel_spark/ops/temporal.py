"""Temporal joins for event streams: backward as-of join.

A large-scale pipeline constantly needs "attach the most recent state row
at or before this event's timestamp, per key" (feature lookups, dim
snapshots, last-touch attribution).  The naive formulation is a range
join — every left row against every earlier right row in the key — which
is quadratic in the per-key bucket and a shuffle-explosion at 100 TB.

The scalable shape used here: tag both sides, union them, hash-partition
by key ONCE, sort each partition by (ts, tag), and carry every right-side
payload forward with a running ``last(..., ignorenulls=True)`` window.
O(n log n) per key, a single shuffle, no pair materialization.  (Same
idiom Flink/kdb use for as-of; Spark has no built-in as-of join.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts: str,
    right_payload: Sequence[str],
    prefix: str = "r_",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the payload of the
    latest right row with ``right.ts <= left.ts`` (inclusive) sharing the
    ``by`` key; left rows with no prior right row keep NULL payloads.

    ``prefix + ts`` carries the matched right timestamp.  ``tolerance_s``
    (optional) voids matches older than the window, like pandas
    ``merge_asof(tolerance=...)``.

    Determinism: if the right side can hold several rows at the same
    (key, ts), pre-aggregate it to one row per (key, ts) — the winner
    among exact ties is otherwise sort-unstable (same caveat as pandas).
    """
    by = list(by)
    pcols = [prefix + c for c in right_payload] + [prefix + ts]
    clash = set(pcols) & set(left.columns)
    if clash:
        raise ValueError(
            f"left side already has prefixed payload columns: {clash}")
    rsel = right.select(
        *by,
        F.col(ts),
        *[F.col(c).alias(prefix + c) for c in right_payload],
    ).withColumn(prefix + ts, F.col(ts)).withColumn("_tag", F.lit(0))
    lsel = left.withColumn("_tag", F.lit(1))
    u = lsel.unionByName(rsel, allowMissingColumns=True)
    # right rows (_tag 0) sort before left rows at equal ts => inclusive <=
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumns({
        c: F.last(F.when(F.col("_tag") == 0, F.col(c)),
                  ignorenulls=True).over(w)
        for c in pcols
    })
    out = filled.filter(F.col("_tag") == 1).drop("_tag")
    if tolerance_s is not None:
        too_old = F.col(prefix + ts) < (
            F.col(ts) - F.expr(f"INTERVAL {int(tolerance_s)} SECONDS"))
        out = out.withColumns({
            c: F.when(too_old, F.lit(None)).otherwise(F.col(c))
            for c in pcols
        })
    return out
