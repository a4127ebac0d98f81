"""Clean-room recursive-descent parser for BEL 2.1 scripts.

Produces the same JSON intermediate representation as the reference
(e-bel/ebel) compiler: a 3-element structure
``[{"document": ...}, {"definitions": [...]}, {"statements_and_sets": [...]}]``
(shape oracle: /root/reference/tests/data/import_tests/basic_import_test.bel.json,
built by /root/reference/ebel/transformers.py:72-800).

This is NOT a port of the reference's Lark/LALR pipeline — it is a direct
recursive-descent implementation of the BEL 2.1 grammar
(/root/reference/ebel/grammar/grammar_bel_2_1.bnf) designed to run fast inside
Arrow-batched pandas UDFs: one ``parse_script`` call per file row, no global
state, plain dict/list output.

Error semantics mirror the reference (/root/reference/ebel/parser.py:287-336):
if the script has any syntax error, only syntax errors are reported (with the
line number of the last physical line of the offending logical line); else
semantic validation runs downstream (as Spark joins, see ebel_spark.validate).
"""

from __future__ import annotations

import re
from typing import Any, Optional

from .scan import BelSyntaxIssue, Scanner
from .vocab import (
    AMINO_ACIDS,
    DOCUMENT_KEYS,
    FROM_LOC,
    FUNC_IR,
    FUNC_SPELLINGS,
    FUSION_SPELLINGS,
    MA_DEFAULTS,
    MA_SPELLINGS,
    MOD_SPELLINGS,
    PMOD_QUOTED,
    PMOD_UNQUOTED,
    PRODUCTS,
    REACTANTS,
    RELATION_BASIC,
    RELATION_BIOMARKER,
    RELATION_PROCESS,
    RELATION_SPELLINGS,
    TO_LOC,
)

# --------------------------------------------------------------------------
# token regexes (anchored .match at position)
# --------------------------------------------------------------------------

_RE_WORD = re.compile(r"[A-Za-z][A-Za-z0-9_\-]*")
_RE_KEYWORD = re.compile(r"\w+")                      # KEYWORD: /(\w+)/
_RE_NS_KEYWORD = re.compile(r'[^:,\s)("]+')           # NAMESPACE_KEYWORD
_RE_SIMPLE_NAME = re.compile(r'[^",\s)(]+')           # STRING_SIMPLE
_RE_REL_SYMBOL = re.compile(r"->|=>|=\||--|-\||:>|>>")
_RE_BARE_VALUE = re.compile(r'[^" \t\n\r]+')          # WORD (document values)
_RE_INT = re.compile(r"\d+")
_RE_FRAG_RANGE = re.compile(r"(?:\d+_(?:\d+|\*|\?)|\?_(?:\d+|\*)|\?)$")
_RE_FUSION_RANGE = {
    "gene": re.compile(r"(?:(?:c\.|g\.|m\.|n\.|o\.)\d+_\d+|\?)$"),
    "rna": re.compile(r"(?:r\.\d+_\d+|\?)$"),
    "protein": re.compile(r"(?:p\.\d+_\d+|\?)$"),
}

_SIMPLE_KINDS = frozenset({
    "abundance", "population", "gene", "micro_rna", "rna", "protein",
    "complex", "composite", "fusion_gene", "fusion_rna", "fusion_protein",
})
_BASIC_KINDS = _SIMPLE_KINDS | {"act"}
_PROCESS_KINDS = frozenset({"bp", "path"})
_PAT_KINDS = frozenset({"bp", "path", "act", "tloc", "deg", "rxn"})
_ACT_INNER_KINDS = frozenset({
    "protein", "complex", "rna", "gene", "micro_rna",
    "fusion_gene", "fusion_rna", "fusion_protein",
})
_ORTHO_KINDS = frozenset({"gene", "rna", "fusion_gene", "fusion_rna"})


def _fn(ftype: str, name: str) -> dict:
    return {"function": {"type": ftype, "name": name}}


def _fn_rule(rule: str) -> dict:
    t, n = FUNC_IR[rule]
    return _fn(t, n)


# --------------------------------------------------------------------------
# deterministic ordering of term parameters
# (mirrors the reference's namedtuple/list sorting, transformers.py:150,
#  301,306,549,554,663,667)
# --------------------------------------------------------------------------

def term_sort_key(obj: Any):
    """Comparable key equivalent to the reference's tuple ordering."""
    if isinstance(obj, dict):
        if "function" in obj:
            f = obj["function"]
            return (f["type"], f["name"])
        if "fusion_range" in obj and len(obj) == 1:
            return (obj["fusion_range"],)
        if set(obj) == {"namespace", "name"}:
            return (obj["namespace"] or "", obj["name"] or "")
        if "hgvs" in obj:
            return (obj["hgvs"],)
        if "range" in obj:
            return (obj["range"], obj.get("descriptor") or "")
        if "position" in obj:  # pmod payload
            return (
                obj.get("namespace") or "", obj.get("name") or "",
                obj.get("type") or "", obj.get("amino_acid") or "",
                obj.get("position") or 0,
            )
        if "default" in obj:  # ma payload
            return (
                obj.get("namespace") or "", obj.get("name") or "",
                obj.get("default") or "",
            )
        return tuple(sorted(obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(term_sort_key(x) for x in obj)
    if obj is None:
        return ("",)
    return obj


def _sorted_terms(terms: list) -> list:
    return sorted(terms, key=term_sort_key)


# --------------------------------------------------------------------------
# result container
# --------------------------------------------------------------------------

class ParseResult:
    """Output of one whole-script parse."""

    __slots__ = (
        "document", "definitions", "statements_and_sets",
        "syntax_errors", "ns_entries", "anno_entries", "defs",
    )

    def __init__(self):
        self.document: dict = {}
        self.definitions: list = []
        self.statements_and_sets: list = []
        #: [{error_class, line, column, entry, hint}]
        self.syntax_errors: list[dict] = []
        #: namespace usages: (keyword, name, line, col)
        self.ns_entries: list[tuple[str, str, int, int]] = []
        #: annotation usages: (keyword, value, line, col)
        self.anno_entries: list[tuple[str, str, int, int]] = []
        #: definitions: (is_anno, keyword, def_type, value, value_list, line)
        self.defs: list[tuple[bool, str, str, Optional[str], list, int]] = []

    @property
    def ok(self) -> bool:
        return not self.syntax_errors

    def tree(self) -> Optional[list]:
        """Reference-shaped 3-part JSON object (None if syntax errors)."""
        if not self.ok:
            return None
        return [
            {"document": dict(sorted(self.document.items()))},
            {"definitions": self.definitions},
            {"statements_and_sets": self.statements_and_sets},
        ]


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

_SEC_DOC, _SEC_DEFS, _SEC_STMTS = 0, 1, 2

_EVIDENCE_KEYS = ("Support", "SupportingText", "Evidence")


class BelScriptParser:
    def __init__(self, text: str):
        if not text.endswith("\n"):
            text += "\n"
        self.s = Scanner(text)
        self.r = ParseResult()
        self.section = _SEC_DOC

    # ---- public ----------------------------------------------------------

    def parse(self) -> ParseResult:
        s = self.s
        while True:
            s.skip_inline_ws()
            if s.eof():
                break
            if s.at_eol():
                s.consume_eol()
                continue
            c = s.peek()
            if c == "#":
                s.skip_to_next_logical_line()
                s.consume_eol()
                continue
            entry_line = s.line
            try:
                self._parse_entry()
                s.skip_inline_ws()
                if s.peek() == "#":
                    s.fail("unexpected '#'")
                if not s.at_eol():
                    s.fail("unexpected trailing input")
                s.consume_eol()
            except BelSyntaxIssue as exc:
                s.skip_to_next_logical_line()
                # the reference reports the LAST physical line of a merged
                # logical line (ebel/parser.py:250-256)
                self.r.syntax_errors.append({
                    "error_class": "BelSyntaxError_unexpected_token",
                    "line": max(exc.line, s.line),
                    "column": exc.column,
                    "entry": exc.entry,
                    "hint": exc.message,
                })
                s.consume_eol()
                if entry_line == 1 and not self.r.document:
                    # keep section state permissive after an early error
                    pass
            except RecursionError:
                # adversarially deep term nesting (e.g. 1500 nested
                # complex()) must degrade to a per-line syntax error, not
                # kill the Spark task: at 10^12 files pathological inputs
                # are a certainty and a repeated task failure aborts the
                # whole job
                s.skip_to_next_logical_line()
                self.r.syntax_errors.append({
                    "error_class": "BelSyntaxError_unexpected_token",
                    "line": s.line,
                    "column": 1,
                    "entry": "",
                    "hint": "term nesting exceeds the supported depth",
                })
                s.consume_eol()
        return self.r

    # ---- entry dispatch ----------------------------------------------------

    def _parse_entry(self) -> None:
        s = self.s
        word = s.match(_RE_WORD)
        if word is None:
            # could be a relation symbol or garbage at line start
            s.fail("unexpected input")
        if word == "SET":
            self._parse_set()
        elif word == "UNSET":
            self._parse_unset()
        elif word == "DEFINE":
            if self.section == _SEC_STMTS:
                s.fail("DEFINE after statements section")
            self.section = _SEC_DEFS
            self._parse_define()
        else:
            self.section = _SEC_STMTS
            self._parse_statement(word)

    # ---- SET family --------------------------------------------------------

    def _parse_set(self) -> None:
        s = self.s
        s.skip_inline_ws()
        key = s.match(_RE_KEYWORD)
        if key is None:
            s.fail("expected keyword after SET")
        if key == "DOCUMENT":
            if self.section != _SEC_DOC:
                s.fail("SET DOCUMENT outside document section")
            self._parse_document_prop()
            return
        self.section = _SEC_STMTS
        if key == "Citation":
            self._parse_citation()
        elif key in _EVIDENCE_KEYS:
            self._parse_evidence()
        elif key == "STATEMENT_GROUP":
            self._parse_statement_group()
        else:
            self._parse_set_annotation(key)

    def _expect_eq(self) -> None:
        s = self.s
        s.skip_inline_ws()
        s.expect_char("=", "SET")
        s.skip_inline_ws()

    def _parse_document_prop(self) -> None:
        s = self.s
        s.skip_inline_ws()
        key = s.match(_RE_WORD)
        if key is None or key not in DOCUMENT_KEYS:
            s.fail("unknown document property", key or "")
        self._expect_eq()
        if s.peek() == '"':
            value, _, _ = s.read_quoted(escapes=True)
        else:
            value = s.match(_RE_BARE_VALUE)
            if value is None:
                s.fail("expected document property value")
        self.r.document[DOCUMENT_KEYS[key]] = value

    def _parse_citation(self) -> None:
        # grammar_bel_2_1.bnf:417-424; 2-field special case: field2 = ref
        s = self.s
        self._expect_eq()
        s.expect_char("{", "citation")
        fields: list[str] = []
        while True:
            s.skip_inline_ws()
            fields.append(s.read_quoted(escapes=True)[0])
            s.skip_inline_ws()
            c = s.peek()
            if c == ",":
                s.expect_char(",")
                continue
            if c == "}":
                s.expect_char("}")
                break
            s.fail("expected ',' or '}' in citation")
        if len(fields) < 2 or len(fields) > 6:
            s.fail("citation needs 2-6 fields")
        c_type = fields[0]
        if len(fields) == 2:
            cit = {"type": c_type, "title": "", "ref": fields[1],
                   "pub_date": "", "author_list": "", "comment": ""}
        else:
            cit = {
                "type": c_type,
                "title": fields[1],
                "ref": fields[2],
                "pub_date": fields[3] if len(fields) > 3 else "",
                "author_list": fields[4] if len(fields) > 4 else "",
                "comment": fields[5] if len(fields) > 5 else "",
            }
        self._append_set_entry({"citation": cit})

    def _parse_evidence(self) -> None:
        s = self.s
        self._expect_eq()
        if s.peek() != '"':
            s.fail("expected quoted evidence text")
        value, _, _ = s.read_quoted(escapes=True)
        self._append_set_entry({"evidence": value})

    def _parse_statement_group(self) -> None:
        s = self.s
        self._expect_eq()
        value, _, _ = s.read_quoted(escapes=True)
        self._append_set_entry({"statement_group": value})

    def _parse_set_annotation(self, keyword: str) -> None:
        s = self.s
        self._expect_eq()
        entries: list[str] = []
        if s.peek() == "{":
            s.expect_char("{")
            while True:
                s.skip_inline_ws()
                val, line, col = s.read_quoted(escapes=True)
                entries.append(val)
                self.r.anno_entries.append((keyword, val, line, col))
                s.skip_inline_ws()
                c = s.peek()
                if c == ",":
                    s.expect_char(",")
                    continue
                if c == "}":
                    s.expect_char("}")
                    break
                s.fail("expected ',' or '}' in annotation set")
        elif s.peek() == '"':
            val, line, col = s.read_quoted(escapes=True)
            entries.append(val)
            self.r.anno_entries.append((keyword, val, line, col))
        else:
            s.fail("expected quoted value or list after SET " + keyword)
        self._append_set_entry({"set": {keyword: sorted(entries)}})

    def _parse_unset(self) -> None:
        s = self.s
        s.skip_inline_ws()
        keywords: list[str] = []
        if s.peek() == "{":
            s.expect_char("{")
            while True:
                s.skip_inline_ws()
                kw = s.match(_RE_KEYWORD)
                if kw is None:
                    s.fail("expected keyword in UNSET list")
                keywords.append(kw)
                s.skip_inline_ws()
                c = s.peek()
                if c == ",":
                    s.expect_char(",")
                    continue
                if c == "}":
                    s.expect_char("}")
                    break
                s.fail("expected ',' or '}' in UNSET list")
        else:
            kw = s.match(_RE_KEYWORD)
            if kw is None:
                s.fail("expected keyword after UNSET")
            keywords.append(kw)
        self._append_set_entry({"unset": sorted(keywords)})

    def _append_set_entry(self, entry: dict) -> None:
        """Group consecutive SET/UNSET entries into one ``sets`` dict
        (LALR groups maximal runs, grammar_bel_2_1.bnf:384-385)."""
        sas = self.r.statements_and_sets
        if sas and isinstance(sas[-1], dict) and "sets" in sas[-1]:
            sas[-1]["sets"].append(entry)
        else:
            sas.append({"sets": [entry]})

    # ---- DEFINE ------------------------------------------------------------

    def _parse_define(self) -> None:
        s = self.s
        s.skip_inline_ws()
        word = s.match(_RE_WORD)
        if word == "DEFAULT":
            s.skip_inline_ws()
            word = s.match(_RE_WORD)
        if word not in ("NAMESPACE", "ANNOTATION"):
            s.fail("expected NAMESPACE or ANNOTATION after DEFINE")
        is_anno = word == "ANNOTATION"
        s.skip_inline_ws()
        def_line = s.line
        keyword = s.match(_RE_KEYWORD)
        if keyword is None:
            s.fail("expected keyword in DEFINE")
        s.skip_inline_ws()
        as_kw = s.match(_RE_WORD)
        if as_kw != "AS":
            s.fail("expected AS in DEFINE")
        s.skip_inline_ws()
        ref_type = s.match(_RE_WORD)
        value: Optional[str] = None
        value_list: list[str] = []
        if ref_type == "URL":
            s.skip_inline_ws()
            value, _, _ = s.read_quoted(escapes=False)
            if not re.match(r"(https?|ftp)://", value) and not value.startswith("file://"):
                s.fail("invalid URL in DEFINE", value[:20])
            def_type = "FILE" if value.startswith("file://") else "URL"
            if def_type == "FILE":
                value = value[len("file://"):]
            ir_type = "URL"   # reference emits type URL for both
        elif ref_type == "PATTERN":
            s.skip_inline_ws()
            value, _, _ = s.read_quoted(escapes=True)
            def_type = ir_type = "PATTERN"
        elif ref_type == "LIST":
            s.skip_inline_ws()
            s.expect_char("{", "LIST definition")
            while True:
                s.skip_inline_ws()
                val, _, _ = s.read_quoted(escapes=True)
                value_list.append(val)
                s.skip_inline_ws()
                c = s.peek()
                if c == ",":
                    s.expect_char(",")
                    continue
                if c == "}":
                    s.expect_char("}")
                    break
                s.fail("expected ',' or '}' in LIST definition")
            def_type = ir_type = "LIST"
            value = None
        else:
            s.fail("expected URL, PATTERN or LIST in DEFINE")

        props = {
            "keyword": keyword,
            "type": ir_type,
            "value": value,
            "value_list": sorted(value_list),
        }
        self.r.definitions.append(
            {"annotation" if is_anno else "namespace": props}
        )
        self.r.defs.append(
            (is_anno, keyword, def_type, value, list(value_list), def_line)
        )

    # ---- statements ---------------------------------------------------------

    def _parse_statement(self, first_word: str) -> None:
        s = self.s
        subj, skind = self._parse_sub_obj_from(first_word)
        s.skip_inline_ws()

        stmt: list
        if s.at_eol() or self._at_stmt_comment():
            stmt = [{"subject": subj}]
        else:
            rel = self._parse_relation()
            s.skip_inline_ws()
            stmt = self._parse_statement_tail(subj, skind, rel)

        comment = self._maybe_stmt_comment()
        if comment is not None:
            stmt.append({"statement_comment": comment})
        self.r.statements_and_sets.append({"statement": stmt})

    def _at_stmt_comment(self) -> bool:
        return self.s.text.startswith("//", self.s.pos)

    def _maybe_stmt_comment(self) -> Optional[str]:
        s = self.s
        s.skip_inline_ws()
        if not self._at_stmt_comment():
            return None
        s._advance(2)
        start = s.pos
        s.skip_to_next_logical_line()
        raw = s.text[start:s.pos]
        return re.sub(r"\\\s*\n\s*", " ", raw).strip()

    def _parse_relation(self) -> str:
        s = self.s
        sym = s.match(_RE_REL_SYMBOL)
        if sym is not None:
            return RELATION_SPELLINGS[sym]
        word = s.match(_RE_WORD)
        if word is None or word not in RELATION_SPELLINGS:
            s.fail("expected relation", word or "")
        return RELATION_SPELLINGS[word]

    def _parse_statement_tail(self, subj: list, skind: str, rel: str) -> list:
        """Apply the statement-alternative type constraints
        (grammar_bel_2_1.bnf:47-73)."""
        s = self.s

        def _obj_term(allowed: Optional[frozenset] = None, what: str = "object"):
            word = s.match(_RE_WORD)
            if word is None:
                s.fail(f"expected {what}")
            term, kind = self._parse_sub_obj_from(word)
            if allowed is not None and kind not in allowed:
                s.fail(f"{kind} not allowed as {what} of {rel}", word)
            return term, kind

        if rel in RELATION_BASIC:
            if s.peek() == "(":
                # nested statement: subject rel ( nsubj nrel nobj )
                s.expect_char("(")
                s.skip_inline_ws()
                nsubj, _ = _obj_term(None, "nested subject")
                s.skip_inline_ws()
                nrel = self._parse_relation()
                if nrel not in RELATION_BASIC:
                    s.fail("nested relation must be basic", nrel)
                s.skip_inline_ws()
                nobj, _ = _obj_term(None, "nested object")
                s.skip_inline_ws()
                s.expect_char(")", "nested statement")
                return [
                    {"subject": subj},
                    {"relation": rel},
                    {"nested_subject": nsubj},
                    {"nested_relation": {"relation": nrel}},
                    {"nested_object": nobj},
                ]
            if rel == "has_member":
                obj, _ = _obj_term()
            else:
                obj, _ = _obj_term()
            return [{"subject": subj}, {"relation": rel}, {"object": obj}]

        if rel in RELATION_BIOMARKER:
            obj, _ = _obj_term(_PROCESS_KINDS)
            return [{"subject": subj}, {"relation": rel}, {"object": obj}]

        if rel in RELATION_PROCESS:
            if skind not in _PAT_KINDS:
                s.fail(f"subject of {rel} must be a process/activity/transformation")
            obj, _ = _obj_term(_PROCESS_KINDS)
            return [{"subject": subj}, {"relation": rel}, {"object": obj}]

        if rel == "analogous_to":
            if skind not in _BASIC_KINDS:
                s.fail("subject of analogousTo must be an abundance or activity")
            obj, _ = _obj_term(_BASIC_KINDS)
            return [{"subject": subj}, {"relation": rel}, {"object": obj}]

        if rel == "orthologous":
            if skind not in _ORTHO_KINDS:
                s.fail("subject of orthologous must be a gene or rna")
            obj, _ = _obj_term(_ORTHO_KINDS)
            return [{"subject": subj}, {"relation": rel}, {"object": obj}]

        if rel == "transcribed_to":
            if skind != "gene":
                s.fail("subject of transcribedTo must be a gene")
            obj, _ = _obj_term(frozenset({"rna"}))
            return [{"subject": subj}, {"relation": rel}, {"object": obj}]

        if rel == "translated_to":
            if skind != "rna":
                s.fail("subject of translatedTo must be an rna")
            obj, _ = _obj_term(frozenset({"protein"}))
            return [{"subject": subj}, {"relation": rel}, {"object": obj}]

        if rel in ("has_component", "has_components"):
            if skind != "complex":
                s.fail(f"subject of {rel} must be a complex")
            if rel == "has_component":
                obj, _ = _obj_term()
            else:
                obj = self._parse_list_object()
            return [{"subject": subj}, {"relation": rel}, {"object": obj}]

        if rel == "has_members":
            obj = self._parse_list_object()
            return [{"subject": subj}, {"relation": rel}, {"object": obj}]

        s.fail("unsupported relation", rel)

    def _parse_list_object(self) -> list:
        s = self.s
        s.skip_inline_ws()
        word = s.match(_RE_WORD)
        if word != "list":
            s.fail("expected list(...)", word or "")
        s.expect_char("(", "list")
        terms = []
        while True:
            s.skip_inline_ws()
            w = s.match(_RE_WORD)
            if w is None:
                s.fail("expected term in list()")
            term, _ = self._parse_sub_obj_from(w)
            terms.append(term)
            s.skip_inline_ws()
            c = s.peek()
            if c == ",":
                s.expect_char(",")
                continue
            if c == ")":
                s.expect_char(")")
                break
            s.fail("expected ',' or ')' in list()")
        return [_fn_rule("list"), _sorted_terms(terms)]

    # ---- terms ---------------------------------------------------------------

    def _parse_sub_obj_from(self, word: str) -> tuple[list, str]:
        """Parse a full _sub_obj whose function spelling was already read."""
        s = self.s
        rule = FUNC_SPELLINGS.get(word)
        if rule is None:
            s.fail("unknown BEL function", word)
        s.skip_inline_ws()
        s.expect_char("(", word)
        if rule == "abundance":
            term = self._finish_simple_abundance("abundance", ("var", "loc"))
        elif rule == "population":
            term = self._finish_simple_abundance("population", ("var", "loc"))
        elif rule == "micro_rna":
            term = self._finish_simple_abundance("micro_rna", ("var", "loc"))
        elif rule == "rna":
            term, rule = self._finish_bio_abundance("rna", ("var", "loc"))
        elif rule == "gene":
            term, rule = self._finish_bio_abundance("gene", ("var", "loc", "gmod"))
        elif rule == "protein":
            term, rule = self._finish_bio_abundance(
                "protein", ("pmod", "var", "frag", "loc"))
        elif rule == "complex":
            term, rule = self._finish_complex()
        elif rule == "composite":
            term = self._finish_composite()
        elif rule in ("bp", "path"):
            nn = self._parse_nn()
            term = [_fn_rule(rule), [nn]]
            self._close_paren(rule)
        elif rule == "act":
            term = self._finish_act()
        elif rule == "tloc":
            term = self._finish_tloc()
        elif rule in ("sec", "deg", "surf"):
            inner, _ = self._parse_inner_term(_SIMPLE_KINDS, rule)
            term = [_fn_rule(rule), [inner]]
            self._close_paren(rule)
        elif rule == "rxn":
            term = self._finish_rxn()
        elif rule == "list":
            s.fail("list() only allowed as hasMembers/hasComponents object")
        else:
            s.fail("unknown function rule", rule)
        return term, rule

    def _close_paren(self, what: str) -> None:
        self.s.skip_inline_ws()
        self.s.expect_char(")", what)

    def _parse_inner_term(self, allowed: frozenset, context: str) -> tuple[list, str]:
        s = self.s
        s.skip_inline_ws()
        word = s.match(_RE_WORD)
        if word is None:
            s.fail(f"expected term in {context}()")
        term, kind = self._parse_sub_obj_from(word)
        if kind not in allowed:
            s.fail(f"{kind} not allowed inside {context}()", word)
        return term, kind

    # nn := NAMESPACE ':' (quoted | simple) ; records usage for validation
    def _parse_nn(self) -> dict:
        s = self.s
        s.skip_inline_ws()
        ns = s.match(_RE_NS_KEYWORD)
        if ns is None:
            s.fail("expected namespace keyword")
        s.expect_char(":", "namespace:name")
        if s.peek() == '"':
            name, line, col = s.read_quoted(escapes=False)
        else:
            line, col = s.line, s.col
            name = s.match(_RE_SIMPLE_NAME)
            if name is None:
                s.fail("expected name after namespace")
        self.r.ns_entries.append((ns, name, line, col))
        return {"namespace": ns, "name": name}

    def _finish_simple_abundance(self, rule: str, mods: tuple) -> list:
        nn = self._parse_nn()
        changes = self._parse_changes(mods, rule)
        self._close_paren(rule)
        params: list = [nn]
        if changes:
            params.append(changes)
        return [_fn_rule(rule), params]

    def _finish_bio_abundance(self, rule: str, mods: tuple) -> tuple[list, str]:
        """g/r/p bodies: either fus(...) or nn [changes]."""
        s = self.s
        save = s.pos
        word = s.match(_RE_WORD)
        if word in FUSION_SPELLINGS and self._peek_is("("):
            term = self._finish_fusion(rule)
            self._close_paren(rule)
            fr = {"gene": "gene_fusion", "rna": "rna_fusion",
                  "protein": "protein_fusion"}[rule]
            return term, FUNC_IR[fr][1]  # fusion_<x>
        # rewind: it was a namespace keyword, not fus(
        s.pos = save
        return self._finish_simple_abundance(rule, mods), rule

    def _peek_is(self, c: str) -> bool:
        s = self.s
        save = s.pos
        s.skip_inline_ws()
        hit = s.peek() == c
        s.pos = save
        return hit

    def _parse_changes(self, mods: tuple, context: str) -> list:
        """(',' modifier(...))* — returns the reference-shaped sorted unique
        list of [function, [payload]] entries (transformers.py:547-554)."""
        s = self.s
        found: list[tuple] = []
        while True:
            s.skip_inline_ws()
            if s.peek() != ",":
                break
            save = s.pos
            s.expect_char(",")
            s.skip_inline_ws()
            word = s.match(_RE_WORD)
            rule = MOD_SPELLINGS.get(word or "")
            if rule is None or not self._peek_is("("):
                s.pos = save
                break
            if rule not in mods:
                s.fail(f"{word}() not allowed in {context}()", word)
            s.skip_inline_ws()
            s.expect_char("(", word)
            payload = getattr(self, "_parse_" + rule)()
            self._close_paren(word)
            found.append(([FUNC_IR[rule][0], FUNC_IR[rule][1]], payload))
        if not found:
            return []
        uniq: dict = {}
        for f, payload in found:
            uniq[term_sort_key((f, payload))] = (f, payload)
        out = []
        for k in sorted(uniq):
            f, payload = uniq[k]
            out.append([_fn(f[0], f[1]), [payload]])
        return out

    # modifier payload parsers ------------------------------------------------

    def _parse_pmod(self) -> dict:
        ns, name, ptype = "", "", ""
        s = self.s
        s.skip_inline_ws()
        if s.peek() == '"':
            val, line, col = s.read_quoted(escapes=True)
            code = PMOD_QUOTED.get(val)
            if code is None:
                s.fail("unknown quoted pmod type", val)
            ptype = code
        else:
            save = s.pos
            word = s.match(_RE_NS_KEYWORD)
            if word is None:
                s.fail("expected pmod type or namespace")
            if s.peek() == ":":
                s.pos = save
                nn = self._parse_nn()
                ns, name = nn["namespace"], nn["name"]
            elif word in PMOD_UNQUOTED:
                ptype = PMOD_UNQUOTED[word]
            else:
                s.fail("unknown pmod type", word)
        amino, pos = self._parse_aa_position()
        return {"namespace": ns, "name": name, "type": ptype,
                "amino_acid": amino, "position": pos}

    def _parse_aa_position(self) -> tuple[str, int]:
        s = self.s
        amino, pos = "", 0
        s.skip_inline_ws()
        if s.peek() == ",":
            s.expect_char(",")
            s.skip_inline_ws()
            word = s.match(_RE_WORD)
            if word is None or word not in AMINO_ACIDS:
                s.fail("unknown amino acid", word or "")
            amino = AMINO_ACIDS[word]
            s.skip_inline_ws()
            if s.peek() == ",":
                s.expect_char(",")
                s.skip_inline_ws()
                num = s.match(_RE_INT)
                if num is None:
                    s.fail("expected position integer")
                pos = int(num)
        return amino, pos

    def _parse_gmod(self) -> dict:
        # transformers.py:556-567: only nn is honoured; type form gets
        # placeholder namespace/name
        s = self.s
        ns, name = "TestNS", "TestName"
        s.skip_inline_ws()
        if s.peek() == '"':
            val, _, _ = s.read_quoted(escapes=True)
            if val not in PMOD_QUOTED:
                s.fail("unknown quoted gmod type", val)
        else:
            save = s.pos
            word = s.match(_RE_NS_KEYWORD)
            if word is None:
                s.fail("expected gmod type or namespace")
            if s.peek() == ":":
                s.pos = save
                nn = self._parse_nn()
                ns, name = nn["namespace"], nn["name"]
            elif word not in PMOD_UNQUOTED:
                s.fail("unknown gmod type", word)
        self._parse_aa_position()
        return {"namespace": ns, "name": name}

    def _parse_var(self) -> dict:
        s = self.s
        s.skip_inline_ws()
        if s.peek() != '"':
            s.fail("var() requires a quoted HGVS expression")
        val, _, _ = s.read_quoted(escapes=True)
        return {"hgvs": val}

    def _parse_frag(self) -> dict:
        s = self.s
        s.skip_inline_ws()
        if s.peek() != '"':
            s.fail("frag() requires a quoted range")
        val, line, col = s.read_quoted(escapes=True)
        if not _RE_FRAG_RANGE.match(val):
            raise BelSyntaxIssue("invalid fragment range", line, col, val)
        descriptor = ""
        s.skip_inline_ws()
        if s.peek() == ",":
            s.expect_char(",")
            s.skip_inline_ws()
            descriptor, _, _ = s.read_quoted(escapes=True)
        return {"range": val, "descriptor": descriptor}

    def _parse_loc(self) -> dict:
        return self._parse_nn()

    # compound terms ------------------------------------------------------------

    def _finish_complex(self) -> tuple[list, str]:
        """complex(nn [loc]) or complex(member, member, ...)."""
        s = self.s
        s.skip_inline_ws()
        save = s.pos
        word = s.match(_RE_WORD)
        if word is not None and word in FUNC_SPELLINGS and self._peek_is("("):
            # complex_list of _basic_subobj entries
            members = []
            term, kind = self._parse_sub_obj_from(word)
            if kind not in _BASIC_KINDS:
                s.fail(f"{kind} not allowed in complex()", word)
            members.append(term)
            while True:
                s.skip_inline_ws()
                c = s.peek()
                if c == ",":
                    s.expect_char(",")
                    term, kind = self._parse_inner_term(_BASIC_KINDS, "complex")
                    members.append(term)
                elif c == ")":
                    s.expect_char(")")
                    break
                else:
                    s.fail("expected ',' or ')' in complex()")
            # complex_list keeps the sorted member list as ONE nested param
            # (transformers.py:294-301)
            return [_fn("list", "complex"), [_sorted_terms(members)]], "complex"
        # named complex: nn [, loc(...)] — loc is dropped from the IR
        # (transformers.py:290-292 keeps only n[0])
        s.pos = save
        nn = self._parse_nn()
        self._parse_changes(("loc",), "complex")
        self._close_paren("complex")
        return [_fn("abundance", "complex"), [nn]], "complex"

    def _finish_composite(self) -> list:
        s = self.s
        members = []
        term, kind = self._parse_inner_term(_SIMPLE_KINDS, "composite")
        members.append(term)
        while True:
            s.skip_inline_ws()
            c = s.peek()
            if c == ",":
                s.expect_char(",")
                term, kind = self._parse_inner_term(_BASIC_KINDS, "composite")
                members.append(term)
            elif c == ")":
                s.expect_char(")")
                break
            else:
                s.fail("expected ',' or ')' in composite()")
        return [_fn("list", "composite"), _sorted_terms(members)]

    def _finish_act(self) -> list:
        s = self.s
        inner, _ = self._parse_inner_term(_ACT_INNER_KINDS, "act")
        params: list = [inner]
        s.skip_inline_ws()
        if s.peek() == ",":
            s.expect_char(",")
            s.skip_inline_ws()
            word = s.match(_RE_WORD)
            if word not in MA_SPELLINGS:
                s.fail("expected ma() in act()", word or "")
            s.skip_inline_ws()
            s.expect_char("(", "ma")
            params.append(self._parse_ma_payload())
            self._close_paren("ma")
        self._close_paren("act")
        return [_fn("process", "activity"), params]

    def _parse_ma_payload(self) -> dict:
        s = self.s
        s.skip_inline_ws()
        save = s.pos
        word = s.match(_RE_NS_KEYWORD)
        if word is not None and s.peek() == ":":
            s.pos = save
            nn = self._parse_nn()
            return {"namespace": nn["namespace"], "name": nn["name"],
                    "default": None}
        if word is not None and word in MA_DEFAULTS:
            return {"namespace": None, "name": None,
                    "default": MA_DEFAULTS[word]}
        s.fail("unknown molecular activity", word or "")

    def _finish_tloc(self) -> list:
        s = self.s
        inner, _ = self._parse_inner_term(_BASIC_KINDS, "tloc")
        s.skip_inline_ws()
        s.expect_char(",", "tloc")
        from_loc = self._parse_tloc_loc(FROM_LOC, "from_location")
        s.skip_inline_ws()
        s.expect_char(",", "tloc")
        to_loc = self._parse_tloc_loc(TO_LOC, "to_location")
        self._close_paren("tloc")
        return [_fn_rule("tloc"), [inner, from_loc, to_loc]]

    def _parse_tloc_loc(self, spelling: str, rule: str) -> list:
        s = self.s
        s.skip_inline_ws()
        word = s.match(_RE_WORD)
        if word != spelling:
            s.fail(f"expected {spelling}()", word or "")
        s.skip_inline_ws()
        s.expect_char("(", spelling)
        nn = self._parse_nn()
        self._close_paren(spelling)
        return [_fn_rule(rule), [nn]]

    def _finish_rxn(self) -> list:
        s = self.s
        reactants = self._parse_rxn_side(REACTANTS, "reactants")
        s.skip_inline_ws()
        s.expect_char(",", "rxn")
        products = self._parse_rxn_side(PRODUCTS, "products")
        self._close_paren("rxn")
        return [_fn_rule("rxn"), [reactants, products]]

    def _parse_rxn_side(self, spelling: str, rule: str) -> list:
        s = self.s
        s.skip_inline_ws()
        word = s.match(_RE_WORD)
        if word != spelling:
            s.fail(f"expected {spelling}() in rxn()", word or "")
        s.skip_inline_ws()
        s.expect_char("(", spelling)
        members = []
        term, _ = self._parse_inner_term(_SIMPLE_KINDS, spelling)
        members.append(term)
        while True:
            s.skip_inline_ws()
            c = s.peek()
            if c == ",":
                s.expect_char(",")
                term, _ = self._parse_inner_term(_SIMPLE_KINDS, spelling)
                members.append(term)
            elif c == ")":
                s.expect_char(")")
                break
            else:
                s.fail(f"expected ',' or ')' in {spelling}()")
        return [_fn_rule(rule), _sorted_terms(members)]

    def _finish_fusion(self, kind: str) -> list:
        """fus(nn, "range", nn, "range") inside g/r/p — the wrapper function
        is folded into the fusion rule (grammar_bel_2_1.bnf:240-262)."""
        s = self.s
        s.skip_inline_ws()
        s.expect_char("(", "fus")
        rng_re = _RE_FUSION_RANGE[kind]
        label = {"gene": "gene", "rna": "rna", "protein": "protein"}[kind]

        def one(idx: int) -> list:
            nn = self._parse_nn()
            s.skip_inline_ws()
            s.expect_char(",", "fus")
            s.skip_inline_ws()
            val, line, col = s.read_quoted(escapes=True)
            if not rng_re.match(val):
                raise BelSyntaxIssue("invalid fusion range", line, col, val)
            return [f"{label}{idx}", [nn, {"fusion_range": val}]]

        p1 = one(1)
        s.skip_inline_ws()
        s.expect_char(",", "fus")
        p2 = one(2)
        self._close_paren("fus")
        rule = {"gene": "gene_fusion", "rna": "rna_fusion",
                "protein": "protein_fusion"}[kind]
        return [_fn_rule(rule), [p1, p2]]


def parse_script(text: str) -> ParseResult:
    """Parse a whole BEL 2.1 script; never raises on bad input."""
    return BelScriptParser(text).parse()
