"""Driver contract for the spark-graft builder (PySpark target).

entry():      flagship BEL knowledge-graph construction over sf0.001 —
              loads the documents parquet, derives a deterministic BEL
              source-file table from it (one file per doc row), runs
              parse -> context fold -> triple extraction and returns the
              triples DataFrame.
queries():    operator inventory from SURVEY.md §2 + training-data ops,
              one callable per operator family.
oracle_sql(): a DuckDB twin for EVERY query.  Iterative graph
              algorithms (PageRank/BFS/LPA/k-core) are twinned by
              unrolling the fixpoint into chained MATERIALIZED CTEs;
              hash-based ops by a golden-tested pure-Python xxhash64
              twin; the IVF-ANN probe path by retraining the coarse
              quantizer driver-side (its Lloyd update sums exact scaled
              integers, so the model is partitioning-independent and
              bit-reproducible outside Spark) and re-running the
              inverted-list probe join + re-rank in SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ebel_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BEL triple extraction.

    The documents table seeds a deterministic BEL corpus (content is a pure
    function of doc_id), which flows through the full parse -> fold ->
    canonicalize path; returns (file row id, subject, predicate, object,
    citation, evidence) triples.
    """
    import hashlib
    from typing import Iterator

    import pandas as pd

    from ebel_spark import parse as P
    from ebel_spark.corpus import CorpusProfile, _Vocab, make_bel_file
    from ebel_spark.namespaces import build_dimensions
    from ebel_spark.schemas import SOURCE_SCHEMA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    profile = CorpusProfile(n_files=0, statements_per_file=25)
    vocab = _Vocab(build_dimensions(), profile)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"repo": [], "path": [], "commit": [], "lang": [],
                    "content": []}
            for did in pdf["doc_id"]:
                did = int(did)
                rows["repo"].append("synthetic/corpus-%03d" % (did % 10))
                rows["path"].append("docs/doc-%06d.bel" % did)
                rows["commit"].append(
                    hashlib.sha1(b"doc-%d" % did).hexdigest())
                rows["lang"].append("bel")
                rows["content"].append(make_bel_file(did, vocab, profile))
            yield pd.DataFrame(rows)

    src = docs.select("doc_id").mapInPandas(gen, SOURCE_SCHEMA)
    parsed = P.parse_sources(src)
    st = P.statements_table(parsed)
    return st.filter(
        F.col("relation").isNotNull() & ~F.col("nested")
    ).select(
        "file_sha", "stmt_idx", "subject_bel", "relation", "object_bel",
        "citation_type", "citation_ref", "evidence", "pmid",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    ebel_spark/queries.py for the inventory mapping)."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    operators: the BEL parse pipeline, MinHash/SimHash/LSH, Pandas-UDF
    multimodal features)."""
    return Q.oracle_sql()
