"""Adversarial-input robustness: at 10^12 files, one pathological row must
degrade to an error row, never a task-killing exception."""

import pytest
from hypothesis import given, settings, strategies as st

from ebel_spark.belc.scriptproc import process_file

HDR = ('SET DOCUMENT Name = "t"\n'
       'DEFINE NAMESPACE H AS URL "http://x/h.belns"\n'
       'SET Citation = {"PubMed", "T", "1"}\n')


class TestPathologicalInputs:
    @pytest.mark.parametrize("content", [
        "",
        "\x00\x01\xff garbage }{",
        "(" * 100_000,
        "x" * 1_000_000,
        HDR + "complex(" * 1500 + "p(H:A)" + ")" * 1500 + " -> p(H:B)\n",
        HDR + "p(H:A) -> " + "(p(H:B) -> " * 1500 + "p(H:C)" + ")" * 1500
        + "\n",
        HDR + 'SET Evidence = "unterminated\n',
        HDR + "p(H:A) \\",  # trailing continuation at EOF
    ], ids=["empty", "binary-junk", "paren-bomb", "huge-line",
            "deep-complex", "deep-nested-stmt", "unterminated-quote",
            "trailing-backslash"])
    def test_never_raises(self, content):
        r = process_file(content)
        assert isinstance(r["ok"], bool)
        assert isinstance(r["syntax_errors"], list)
        for e in r["syntax_errors"]:
            assert isinstance(e["line"], int)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=400))
    def test_fuzz_arbitrary_text(self, content):
        r = process_file(content)
        assert isinstance(r["ok"], bool)
        # a file is either ok or carries at least the shape of an error list
        assert isinstance(r["statements"], list)

    @settings(max_examples=100, deadline=None)
    @given(st.text(
        alphabet='pgra(),:"-> =\n\\#{}SETDOCUMENTH', max_size=600))
    def test_fuzz_bel_shaped_text(self, content):
        """Fuzz with BEL-alphabet soup — exercises the statement/term
        parsers rather than dying at the first character."""
        r = process_file(HDR + content)
        assert isinstance(r["ok"], bool)


def test_spark_udf_contains_deep_nesting(spark):
    """The parse UDF must turn an adversarial file into an error row, not
    a task failure."""
    from pyspark.sql import functions as F

    from ebel_spark import parse as P
    from ebel_spark.schemas import SOURCE_SCHEMA

    bad = HDR + "complex(" * 1500 + "p(H:A)" + ")" * 1500 + " -> p(H:B)\n"
    good = HDR + "p(H:A) -> p(H:B)\n"
    src = spark.createDataFrame(
        [("r", "bad.bel", "c" * 40, "bel", bad),
         ("r", "good.bel", "c" * 40, "bel", good)],
        SOURCE_SCHEMA)
    parsed = P.parse_sources(src).collect()
    by_path = {r.path: r for r in parsed}
    assert not by_path["bad.bel"].ok
    assert by_path["bad.bel"].n_syntax_errors >= 1
    assert by_path["good.bel"].ok
    assert by_path["good.bel"].n_statements == 1
