"""Output sinks: parquet (sandbox default) and Iceberg (the 100 TB path).

The north rule targets Iceberg tables — partition evolution, snapshot
isolation, and MERGE-based resume are what make a 10^12-file pipeline
restartable without rewriting whole directories.  This sandbox ships no
Iceberg runtime jars, so:

- ``fmt="parquet"`` (default) writes directory tables under ``out_dir`` —
  byte-compatible with everything the tests and the driver check;
- ``fmt="iceberg"`` emits the same tables through the DataFrameWriterV2
  API against a configured catalog.  It requires the
  ``iceberg-spark-runtime`` jar on the cluster (spark-submit --packages
  org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>) and a catalog
  conf, e.g.::

      spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
      spark.sql.catalog.lake.type=hadoop
      spark.sql.catalog.lake.warehouse=s3://bucket/warehouse

  `require_iceberg` probes the catalog up front and raises a clear error
  instead of a deep Spark stack when the runtime is absent.

Lineage upsert: on parquet the pipeline overwrites the whole (small)
lineage table; on Iceberg `upsert_lineage` issues a MERGE keyed on
file_sha, the idempotent-resume primitive at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def require_iceberg(spark: SparkSession, catalog: str) -> None:
    """Fail fast with an actionable message if the catalog isn't usable."""
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()
    except Exception as ex:  # noqa: BLE001 - any failure means "not usable"
        raise RuntimeError(
            f"Iceberg catalog '{catalog}' is not available: {ex}\n"
            "Add the iceberg-spark-runtime jar and spark.sql.catalog."
            f"{catalog}.* configs to the spark-submit command."
        ) from ex


def write_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    out_dir: str,
    fmt: str = "parquet",
    catalog: str | None = None,
    partition_by: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write one output table and return a re-readable handle to it."""
    if fmt == "parquet":
        path = os.path.join(out_dir, name)
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(path)
        return spark.read.parquet(path)
    if fmt == "iceberg":
        if not catalog:
            raise ValueError("iceberg sink needs a catalog name")
        table = f"{catalog}.{name.replace('/', '.')}"
        wt = df.writeTo(table)
        if partition_by:
            from pyspark.sql import functions as F
            wt = wt.partitionedBy(F.col(partition_by))
        if mode == "append":
            # append requires the table to exist; first writer creates
            # it.  Existence is probed explicitly: a try/except around
            # append() would swallow REAL append failures (schema
            # mismatch, catalog hiccup) and re-raise as a bogus
            # "table already exists" from create().
            if spark.catalog.tableExists(table):
                wt.append()
            else:
                wt.create()
        else:
            wt.createOrReplace()
        return spark.read.table(table)
    raise ValueError(f"unknown sink format: {fmt}")


def upsert_lineage(
    spark: SparkSession,
    lineage: DataFrame,
    catalog: str,
    table: str = "lineage",
    run_id: str = "run",
) -> None:
    """MERGE the per-file lineage rows into the Iceberg lineage table —
    the resume primitive at 10^12-file scale (replaces the parquet
    overwrite, which would rewrite the whole table every run).  Creates
    the table on first use; the staging view is run-scoped so concurrent
    pipelines on one session never collide, and dropped afterwards."""
    target = f"{catalog}.{table}"
    if not spark.catalog.tableExists(target):
        lineage.writeTo(target).create()
        return
    view = f"_lineage_updates_{run_id}"
    lineage.createOrReplaceTempView(view)
    try:
        spark.sql(f"""
            MERGE INTO {target} t
            USING {view} s
            ON t.file_sha = s.file_sha
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """)
    finally:
        spark.catalog.dropTempView(view)


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 64,
    path: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Write a hash-bucketed (and bucket-sorted) parquet table.

    Bucketing is the co-located-join primitive for the repeatedly-joined
    graph tables (nodes ⋈ edges on node id): two tables bucketed on the
    same key with the same bucket count join WITHOUT a shuffle on either
    side — at 10^12-edge scale that deletes the dominant exchange from
    every downstream graph query.  (Iceberg expresses the same layout as
    a `bucket(N, key)` partition transform.)"""
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
    return spark.table(table)


def write_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    partitions: int | None = None,
) -> None:
    """Write a range-clustered parquet table: `repartitionByRange` on
    `cols` (range-partitioned via a sampled boundary sort) plus
    `sortWithinPartitions`, so every output file covers a narrow,
    pairwise-disjoint range of the cluster key.

    This is the data-skipping layout: parquet stores per-file and
    per-row-group min/max statistics, and a reader filtering on the
    cluster key prunes whole files from the scan (Spark shows it as
    PushedFilters + skipped row groups).  On a 100 TB time-keyed table
    clustered by timestamp, a one-day query reads ~1/365th of the files
    instead of all of them — the single biggest scan-cost lever after
    partition pruning, and what Iceberg/Delta expose as sort-order /
    z-order table properties.  (For multi-column predicates an
    interleaved key can replace `cols`; single-key range clustering is
    the common case for time-series.)
    """
    w = df.repartitionByRange(*([partitions] if partitions else []),
                              *[F.col(c) for c in cols])
    w.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def write_metrics_table(
    spark: SparkSession,
    metrics: dict,
    out_dir: str,
) -> None:
    """Append this run's metrics to the queryable metrics table
    (`<out>/metrics`, one row per stage/counter) — the north rule's
    "lineage + metrics tables" companion to the per-run JSON file.
    Append-mode parquet: each run adds a few dozen rows keyed by run_id,
    so the table accumulates a queryable history across resumes."""
    run_id = str(metrics.get("run_id", ""))
    rows = [(run_id, f"stage.{k}", float(v))
            for k, v in metrics.get("stages", {}).items()]
    rows += [(run_id, k, float(v)) for k, v in metrics.items()
             if isinstance(v, (int, float))]
    if not rows:
        return
    mdf = spark.createDataFrame(rows, "run_id string, metric string, "
                                      "value double")
    mdf.coalesce(1).write.mode("append").parquet(
        os.path.join(out_dir, "metrics"))
