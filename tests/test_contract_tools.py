"""The local gate replica (scripts/check_contract.py) must be at least as
strict as the driver's hash comparison: DuckDB HUGEINT / DECIMAL results
at equal VALUES still hash differently from Spark long/double (the r2
doc_budget_slice red row), so the replica flags dtype-family mismatches
instead of string-normalizing them away."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "check_contract",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "check_contract.py"))
cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cc)


class TestDtypeCanary:
    def test_uncast_hugeint_window_sum_is_flagged(self):
        # the exact r2 failure shape: DuckDB sum(BIGINT) OVER (...) ->
        # HUGEINT against Spark's bigint
        mism = cc.dtype_mismatches(
            ["doc_id", "cum_cost"], ["bigint", "bigint"],
            ["doc_id", "cum_cost"], ["BIGINT", "HUGEINT"])
        assert mism == [("cum_cost", "int", "hugeint")]

    def test_uncast_decimal_sum_is_flagged(self):
        mism = cc.dtype_mismatches(
            ["k", "total"], ["string", "double"],
            ["k", "total"], ["VARCHAR", "DECIMAL(38,2)"])
        assert mism == [("total", "float", "decimal")]

    def test_matching_families_pass(self):
        assert cc.dtype_mismatches(
            ["a", "b", "c", "d"],
            ["bigint", "double", "string", "array<string>"],
            ["a", "b", "c", "d"],
            ["INTEGER", "DOUBLE", "VARCHAR", "VARCHAR[]"]) == []


class TestScaleReplicaGenerator:
    def test_replica_tags_survive_tokenizer_and_stay_disjoint(self, spark):
        # the r5 rehearsal lesson, pinned: replica tags must ride INSIDE
        # the [a-z0-9]+ token (a separator tag becomes its own
        # interleaved token, degrades n-gram shingles and manufactures
        # quadratic near-dup candidates).  Two builds must also be
        # byte-deterministic.
        import importlib.util as _ilu
        import os as _os
        spec = _ilu.spec_from_file_location(
            "scale_queries",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), "scripts",
                "scale_queries.py"))
        sq = _ilu.module_from_spec(spec)
        spec.loader.exec_module(sq)

        from ebel_spark.ops.text import tokens
        from pyspark.sql import functions as F

        import tempfile
        import shutil
        d1 = tempfile.mkdtemp(prefix="sqrep1_")
        try:
            sq.build_scaled_dir(spark, "/root/testdata/sf0.001", d1, 3)
            docs = spark.read.parquet(f"{d1}/documents.parquet")
            assert docs.count() % 3 == 0
            # replica-1 tokens all end with the tag and are DISJOINT
            # from replica-0's token vocabulary
            n_docs = docs.count() // 3
            t0 = (docs.filter(F.col("doc_id") < n_docs)
                  .select(F.explode(tokens(F.col("text"))).alias("t")))
            t1 = (docs.filter((F.col("doc_id") >= n_docs)
                              & (F.col("doc_id") < 2 * n_docs))
                  .select(F.explode(tokens(F.col("text"))).alias("t")))
            assert t1.filter(~F.col("t").endswith("xr1")).count() == 0
            assert t0.join(t1, "t", "left_semi").count() == 0
        finally:
            shutil.rmtree(d1, ignore_errors=True)
