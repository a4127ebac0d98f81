"""Repair operator tests (reference validate.py:141-222 semantics)."""

from ebel_spark.belc.scriptproc import process_file
from ebel_spark.repair import repair_content, repair_relation_terms

HEADER = (
    'SET DOCUMENT Name = "t"\n'
    'DEFINE NAMESPACE HGNC AS URL "http://x/h.belns"\n'
    'SET Citation = {"PubMed", "T", "1"}\n'
)


class TestRepairContent:
    def test_relation_term_map(self):
        assert repair_relation_terms(
            "p(HGNC:A) directly_increases p(HGNC:B)"
        ) == "p(HGNC:A) directlyIncreases p(HGNC:B)"
        assert repair_relation_terms("x has_components y") == "x hasComponents y"
        assert repair_relation_terms("x has_component y") == "x hasComponent y"
        assert repair_relation_terms("x positive_correlation y") == "x pos y"

    def test_prognostic_biomarker_matches_reference_order(self):
        # the reference replaces 'biomarker_for' first (dict insertion
        # order), so the longer spelling comes out half-repaired — still
        # invalid BEL, and parity requires reproducing exactly that
        assert repair_relation_terms(
            "x prognostic_biomarker_for y"
        ) == "x prognostic_biomarkerFor y"

    def test_snake_relation_parses_clean_after_repair(self):
        bel = HEADER + "p(HGNC:A) directly_increases p(HGNC:B)\n"
        before = process_file(bel)
        assert not before["ok"] or not any(
            s["relation"] == "directly_increases" for s in before["statements"]
        )
        after = process_file(repair_content(bel))
        assert after["ok"], after["syntax_errors"]
        assert after["statements"][0]["relation"] == "directly_increases"

    def test_repair_diff_matches_reference_ndiff(self):
        import difflib
        from ebel_spark.repair import repair_diff
        bel = HEADER + "p(HGNC:A) directly_increases p(HGNC:B)\n"
        repaired = repair_content(bel)
        got = repair_diff(bel, repaired)
        # the reference writes exactly "\n".join(difflib.ndiff(...))
        # (validate.py:186-187)
        assert got == "\n".join(difflib.ndiff(bel.split("\n"),
                                              repaired.split("\n")))
        assert "- p(HGNC:A) directly_increases p(HGNC:B)" in got
        assert "+ p(HGNC:A) directlyIncreases p(HGNC:B)" in got
        # unchanged file -> no diff export (reference guard
        # validate.py:184: only written when content != new_content)
        clean = HEADER + "p(HGNC:A) increases p(HGNC:B)\n"
        assert repair_content(clean) == clean
        assert repair_diff(clean, clean) is None

    def test_repair_sources_diff_column(self, spark):
        from ebel_spark.repair import repair_sources
        dirty = HEADER + "p(HGNC:A) directly_increases p(HGNC:B)\n"
        clean = HEADER + "p(HGNC:A) increases p(HGNC:B)\n"
        df = spark.createDataFrame(
            [("r", "a.bel", dirty), ("r", "b.bel", clean)],
            ["repo", "path", "content"])
        out = {r.path: r for r in
               repair_sources(df, diff=True).collect()}
        assert "directlyIncreases" in out["a.bel"].content
        assert out["a.bel"].repair_diff.startswith("  SET DOCUMENT")
        assert out["b.bel"].repair_diff is None
        # diff=False keeps the input schema untouched
        assert "repair_diff" not in repair_sources(df).columns

    def test_evidence_rewrap(self):
        bel = (
            HEADER
            + 'SET Evidence = "first   line \\\n   second line"\n'
            + "p(HGNC:A) increases p(HGNC:B)\n"
        )
        repaired = repair_content(bel)
        assert "SET Support = " in repaired
        r = process_file(repaired)
        assert r["ok"], r["syntax_errors"]
        assert r["statements"][0]["evidence"] == "first line second line"
