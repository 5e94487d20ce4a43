"""Tokenizer for the SQL dialect.

The reference parses by word-scanning helpers
(core:serialization/serializer/OStringSerializerHelper.java,
core:sql/OSQLHelper.java); we use a conventional tokenizer feeding a
recursive-descent parser — same grammar, cleaner machinery.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from orientdb_spark.errors import OCommandSQLParsingException

# token kinds
IDENT = "IDENT"
NUMBER = "NUMBER"
STRING = "STRING"
RID = "RID"
ATTR = "ATTR"  # @rid, @class, ...
PARAM = "PARAM"  # ?
PUNCT = "PUNCT"
EOF = "EOF"


@dataclass
class Token:
    kind: str
    value: object
    pos: int

    def is_kw(self, *words: str) -> bool:
        return self.kind == IDENT and str(self.value).lower() in words


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<rid>\#?\d+:\d+)
  | (?P<number>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<attr>@[A-Za-z_][A-Za-z0-9_]*)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_$]*)
  | (?P<punct><=|>=|<>|!=|\|\||&&|[(),\[\]=<>.:*/+\-%?])
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise OCommandSQLParsingException("Unexpected character", text, pos)
        kind = m.lastgroup
        raw = m.group()
        if kind == "ws":
            pass
        elif kind == "rid":
            c, p = raw.lstrip("#").split(":")
            tokens.append(Token(RID, (int(c), int(p)), pos))
        elif kind == "number":
            val = float(raw) if ("." in raw or "e" in raw or "E" in raw) else int(raw)
            tokens.append(Token(NUMBER, val, pos))
        elif kind == "string":
            body = raw[1:-1]
            body = body.replace("\\'", "'").replace('\\"', '"').replace("\\\\", "\\")
            tokens.append(Token(STRING, body, pos))
        elif kind == "attr":
            tokens.append(Token(ATTR, raw.lower(), pos))
        elif kind == "ident":
            tokens.append(Token(IDENT, raw, pos))
        elif kind == "punct":
            if raw == "?":
                tokens.append(Token(PARAM, "?", pos))
            else:
                tokens.append(Token(PUNCT, raw, pos))
        pos = m.end()
    tokens.append(Token(EOF, None, n))
    return tokens
