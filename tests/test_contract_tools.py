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
