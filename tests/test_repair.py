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
