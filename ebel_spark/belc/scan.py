"""Character scanner for the clean-room BEL 2.1 parser.

Tracks 1-based (line, column) positions like the reference's lexer so
validation-error positions agree with the reference test oracles
(/root/reference/tests/test_grammar/test_validate.py:30-44).

Whitespace model (cf. /root/reference/ebel/grammar/grammar_bel_2_1.bnf:676):
spaces, tabs and form-feeds are insignificant; a backslash followed by a
newline is a line continuation (insignificant); newlines otherwise terminate
entries.

Performance: the scanner keeps only an integer ``pos``; ``line``/``col`` are
derived on demand by bisecting a lazily-built newline index.  Position
queries happen once per recorded token or error, while advances happen once
per *character* — tracking (line, col) eagerly made ``_advance`` the single
hottest function of the whole pipeline (and an allocation-heavy one, which
is what limits multi-core scaling of the parse stage).  All skipping /
quoted-string reads are single compiled-regex calls.
"""

from __future__ import annotations

import re
from bisect import bisect_right

_NL_RE = re.compile(r"\n")
_NLCHAR_RE = re.compile(r"[\r\n]")
# inline ws and backslash-newline continuations, greedily in one match;
# \r\n | \r | \n matches CR-only line endings too (reference parser.py:251
# accepts all three)
_WS_RE = re.compile(r"(?:[ \t\f]+|\\[ \t]*(?:\r\n|\r|\n))+")
# quoted-string bodies: with escapes, \" and \\ pairs never close the string
_QUOTED_ESC_RE = re.compile(r'(?:\\["\\]|[^"])*')
_QUOTED_RAW_RE = re.compile(r'[^"]*')


class BelSyntaxIssue(Exception):
    """Raised on a syntax error; carries position + offending text."""

    def __init__(self, message: str, line: int, column: int, entry: str = ""):
        super().__init__(message)
        self.message = message
        self.line = line
        self.column = column
        self.entry = entry


class Scanner:
    __slots__ = ("text", "n", "pos", "_line_starts")

    def __init__(self, text: str):
        self.text = text
        self.n = len(text)
        self.pos = 0
        self._line_starts: list[int] | None = None

    # -- positions (lazy) ----------------------------------------------------

    def _ls(self) -> list[int]:
        ls = self._line_starts
        if ls is None:
            ls = [0]
            ls.extend(m.end() for m in _NL_RE.finditer(self.text))
            self._line_starts = ls
        return ls

    @property
    def line(self) -> int:
        return bisect_right(self._ls(), self.pos)

    @property
    def col(self) -> int:
        ls = self._ls()
        return self.pos - ls[bisect_right(ls, self.pos) - 1] + 1

    # -- low level ---------------------------------------------------------

    def eof(self) -> bool:
        return self.pos >= self.n

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < self.n else ""

    def _advance(self, k: int = 1) -> None:
        p = self.pos + k
        self.pos = p if p < self.n else self.n

    # -- whitespace / newlines ----------------------------------------------

    def skip_inline_ws(self) -> None:
        """Skip spaces/tabs/form-feeds and backslash-newline continuations."""
        m = _WS_RE.match(self.text, self.pos)
        if m:
            self.pos = m.end()

    def at_eol(self) -> bool:
        return self.pos >= self.n or self.text[self.pos] in "\r\n"

    def consume_eol(self) -> None:
        """Consume a single newline (\\n, \\r\\n or \\r)."""
        t, p, n = self.text, self.pos, self.n
        if p >= n:
            return
        c = t[p]
        if c == "\r":
            self.pos = p + (2 if p + 1 < n and t[p + 1] == "\n" else 1)
        elif c == "\n":
            self.pos = p + 1

    def skip_to_next_logical_line(self) -> None:
        """Error recovery: skip past the next newline that is not a
        backslash continuation (mirrors the reference's logical-line merge,
        /root/reference/ebel/parser.py:250-256)."""
        t, n = self.text, self.n
        pos = self.pos
        while True:
            m = _NLCHAR_RE.search(t, pos)
            if not m:
                self.pos = n
                return
            i = m.start()
            j = i - 1
            while j >= 0 and t[j] in " \t":
                j -= 1
            if j >= 0 and t[j] == "\\":
                # continuation newline: step past it and keep scanning
                pos = i + (2 if t[i] == "\r" and i + 1 < n
                           and t[i + 1] == "\n" else 1)
                continue
            self.pos = i
            return

    # -- token reading -------------------------------------------------------

    def match(self, pattern: re.Pattern) -> str | None:
        """Match a compiled regex at the current position; advance on hit."""
        m = pattern.match(self.text, self.pos)
        if not m:
            return None
        self.pos = m.end()
        return m.group(0)

    def expect_char(self, c: str, what: str = "") -> None:
        if self.pos < self.n and self.text[self.pos] == c:
            self.pos += 1
            return
        self.fail(f"expected '{c}'" + (f" in {what}" if what else ""))

    def read_quoted(self, escapes: bool = True) -> tuple[str, int, int]:
        """Read a double-quoted token.  Returns (raw inner text, line, col)
        of the first inner character (token positions in the reference are
        those of the inner token, e.g. NAME_WITHOUT_QUOTES).

        With ``escapes`` the sequence ``\\"`` does not close the string and is
        kept verbatim in the value (cf. STRING terminal,
        grammar_bel_2_1.bnf:669).  Newlines are allowed inside (cf. EVI_TEXT,
        grammar_bel_2_1.bnf:407).
        """
        self.expect_char('"', "quoted value")
        tline, tcol = self.line, self.col
        m = (_QUOTED_ESC_RE if escapes else _QUOTED_RAW_RE).match(
            self.text, self.pos)
        end = m.end()
        if end >= self.n or self.text[end] != '"':
            self.pos = end
            self.fail("unterminated string")
        value = self.text[self.pos:end]
        self.pos = end + 1
        return value, tline, tcol

    def fail(self, message: str, entry: str = "") -> None:
        if not entry:
            entry = self.text[self.pos:self.pos + 5]
        raise BelSyntaxIssue(message, self.line, self.col, entry)
