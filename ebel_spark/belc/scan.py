"""Character scanner for the clean-room BEL 2.1 parser.

Tracks 1-based (line, column) positions like the reference's lexer so
validation-error positions agree with the reference test oracles
(/root/reference/tests/test_grammar/test_validate.py:30-44).

Whitespace model (cf. /root/reference/ebel/grammar/grammar_bel_2_1.bnf:676):
spaces, tabs and form-feeds are insignificant; a backslash followed by a
newline is a line continuation (insignificant); newlines otherwise terminate
entries.
"""

from __future__ import annotations

import re


class BelSyntaxIssue(Exception):
    """Raised on a syntax error; carries position + offending text."""

    def __init__(self, message: str, line: int, column: int, entry: str = ""):
        super().__init__(message)
        self.message = message
        self.line = line
        self.column = column
        self.entry = entry


class Scanner:
    __slots__ = ("text", "n", "pos", "line", "col")

    def __init__(self, text: str):
        self.text = text
        self.n = len(text)
        self.pos = 0
        self.line = 1
        self.col = 1

    # -- low level ---------------------------------------------------------

    def eof(self) -> bool:
        return self.pos >= self.n

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < self.n else ""

    def _advance(self, k: int = 1) -> None:
        t = self.text
        p = self.pos
        end = p + k
        if end > self.n:
            end = self.n
        if k == 1:
            if t[p] == "\n":
                self.line += 1
                self.col = 1
            else:
                self.col += 1
            self.pos = end
            return
        nl = t.count("\n", p, end)
        if nl:
            self.line += nl
            self.col = end - t.rindex("\n", p, end)
        else:
            self.col += end - p
        self.pos = end

    # -- whitespace / newlines ----------------------------------------------

    def skip_inline_ws(self) -> None:
        """Skip spaces/tabs/form-feeds and backslash-newline continuations."""
        t, n = self.text, self.n
        while self.pos < n:
            c = t[self.pos]
            if c in " \t\f":
                self._advance()
            elif c == "\\":
                # line continuation: backslash, optional inline ws, newline
                j = self.pos + 1
                while j < n and t[j] in " \t":
                    j += 1
                if j < n and t[j] in "\r\n":
                    if t[j] == "\r" and j + 1 < n and t[j + 1] == "\n":
                        j += 1
                    self._advance(j + 1 - self.pos)
                else:
                    return
            else:
                return

    def at_eol(self) -> bool:
        return self.eof() or self.text[self.pos] in "\r\n"

    def consume_eol(self) -> None:
        """Consume a single newline (\\n, \\r\\n or \\r)."""
        if self.eof():
            return
        c = self.text[self.pos]
        if c == "\r":
            if self.pos + 1 < self.n and self.text[self.pos + 1] == "\n":
                self._advance(2)
            else:
                self._advance(1)
        elif c == "\n":
            self._advance(1)

    def skip_to_next_logical_line(self) -> None:
        """Error recovery: skip past the next newline that is not a
        backslash continuation (mirrors the reference's logical-line merge,
        /root/reference/ebel/parser.py:250-256)."""
        t, n = self.text, self.n
        while self.pos < n:
            c = t[self.pos]
            if c in "\r\n":
                # was this newline preceded by a backslash (+ inline ws)?
                j = self.pos - 1
                while j >= 0 and t[j] in " \t":
                    j -= 1
                if j >= 0 and t[j] == "\\":
                    self.consume_eol()
                    continue
                return
            self._advance()

    # -- token reading -------------------------------------------------------

    def match(self, pattern: re.Pattern) -> str | None:
        """Match a compiled regex at the current position; advance on hit."""
        m = pattern.match(self.text, self.pos)
        if not m:
            return None
        s = m.group(0)
        self._advance(len(s))
        return s

    def expect_char(self, c: str, what: str = "") -> None:
        if self.peek() != c:
            self.fail(f"expected '{c}'" + (f" in {what}" if what else ""))
        self._advance()

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
        t, n = self.text, self.n
        start = self.pos
        while self.pos < n:
            c = t[self.pos]
            if c == "\\" and escapes and self.pos + 1 < n and t[self.pos + 1] in '"\\':
                self._advance(2)
                continue
            if c == '"':
                value = t[start:self.pos]
                self._advance()
                return value, tline, tcol
            self._advance()
        self.fail("unterminated string")

    def fail(self, message: str, entry: str = "") -> None:
        if not entry:
            entry = self.text[self.pos:self.pos + 5]
        raise BelSyntaxIssue(message, self.line, self.col, entry)
