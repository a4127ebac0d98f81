"""BEL source repair: snake_cased relation terms + evidence re-wrapping.

Re-expresses /root/reference/ebel/validate.py:160-222 as (a) a pure-python
per-file function (`repair_content`) usable inside the Arrow-batched parse
path, and (b) DataFrame operators:

- `repair_relations(df)` — JVM-side chain of literal replaces (the
  reference uses plain str.replace, validate.py:219-221; eBEL terms are
  unique enough that word boundaries are not needed for parity).
- `repair_sources(df)` — full repair incl. the evidence re-wrap regexes
  (textwrap.fill has no JVM twin) via mapInPandas.
"""

from __future__ import annotations

import re
from textwrap import fill
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

# reference validate.py:196-215 (replace_ebel_relation_terms)
EBEL_TO_BEL_RELATIONS: dict[str, str] = {
    "analogous_to": "analogousTo",
    "biomarker_for": "biomarkerFor",
    "causes_no_change": "causesNoChange",
    "directly_decreases": "directlyDecreases",
    "directly_increases": "directlyIncreases",
    "equivalent_to": "eq",
    "has_component": "hasComponent",
    "has_components": "hasComponents",
    "has_member": "hasMember",
    "has_members": "hasMembers",
    "is_a": "isA",
    "negative_correlation": "neg",
    "positive_correlation": "pos",
    "prognostic_biomarker_for": "prognosticBiomarkerFor",
    "rate_limiting_step_of": "rateLimitingStepOf",
    "sub_process_of": "subProcessOf",
    "transcribed_to": "transcribedTo",
    "translated_to": "translatedTo",
}

# reference validate.py:166-169: SET blocks whose quoted text gets re-wrapped
_EVIDENCE_BLOCK_RE = re.compile(
    r"\n((SET\s+(DOCUMENT\s+Description|Evidence|SupportingText|Support)"
    r'\s*=\s*)"(((?<=\\)"|[^"])+)"\s*\n*)'
)


def repair_relation_terms(content: str) -> str:
    """validate.py:196-222: plain replaces in the reference's DICT
    INSERTION ORDER — parity demands it: the reference replaces
    'biomarker_for' before 'prognostic_biomarker_for', so the latter
    becomes 'prognostic_biomarkerFor' (still unparseable) rather than
    the valid 'prognosticBiomarkerFor' a longest-first order would give.
    Repaired-corpus statement/error counts must match the reference
    bug-for-bug.  (The prefix spellings — has_component(s)/has_member(s)
    — come out identical either way: replacing the prefix leaves the
    trailing 's' intact.)"""
    for ebel_term, bel_term in EBEL_TO_BEL_RELATIONS.items():
        content = content.replace(ebel_term, bel_term)
    return content


def repair_content(content: str) -> str:
    """Full file repair (validate.py:141-190): relation terms + re-wrapped
    evidence/description blocks (collapse continuations, squeeze whitespace,
    unescape, refill with trailing-backslash line joins)."""
    new_content = repair_relation_terms(content)
    for m in _EVIDENCE_BLOCK_RE.findall(content):
        if m[2].startswith("DOCUMENT"):
            new_prefix = "SET DOCUMENT Description = "
        else:
            new_prefix = "SET Support = "
        text = re.sub(r"(\\?[\r\n]+)|\\ ", " ", m[3].strip())
        text = re.sub(r"\s{2,}", " ", text)
        text = re.sub(r"(\\)(\w)", r"\g<2>", text)
        text = fill(text, break_long_words=False).replace("\n", " \\\n")
        new_content = new_content.replace(
            m[0], new_prefix + '"' + text + '"\n\n')
    return new_content


def repair_diff(content: str, repaired: str) -> str | None:
    """The reference `repair --diff` export (validate.py:186-187): an
    ndiff of original vs repaired lines, produced only when the repair
    changed something (the reference writes `<path>.diff2repaired` only
    inside its `content != new_content` guard)."""
    if content == repaired:
        return None
    import difflib
    return "\n".join(difflib.ndiff(content.split("\n"),
                                   repaired.split("\n")))


def repair_relations(df: DataFrame, content_col: str = "content") -> DataFrame:
    """JVM-side relation-term repair (codegen chain of literal replaces),
    in the same reference insertion order as repair_relation_terms."""
    col = F.col(content_col)
    for ebel_term, bel_term in EBEL_TO_BEL_RELATIONS.items():
        col = F.replace(col, F.lit(ebel_term), F.lit(bel_term))
    return df.withColumn(content_col, col)


def repair_sources(df: DataFrame, content_col: str = "content",
                   diff: bool = False,
                   diff_col: str = "repair_diff") -> DataFrame:
    """Full repair over the source table (Arrow-batched; the evidence
    re-wrap needs textwrap.fill).  With ``diff=True`` a `repair_diff`
    string column carries the reference's `--diff` ndiff export
    (validate.py:186-187) — null for unchanged files; write it with the
    rest of the row instead of the reference's per-file
    `.diff2repaired` side files."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    schema = df.schema
    if diff:
        schema = StructType(list(schema.fields)
                            + [StructField(diff_col, StringType())])

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            orig = [c or "" for c in pdf[content_col]]
            rep = [repair_content(c) for c in orig]
            pdf[content_col] = rep
            if diff:
                pdf[diff_col] = [repair_diff(o, r)
                                 for o, r in zip(orig, rep)]
            yield pdf

    return df.mapInPandas(fn, schema)
