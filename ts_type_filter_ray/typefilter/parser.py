"""Hand-written tokenizer + recursive-descent parser for the reference's
TypeScript-subset grammar (``ts_type_filter/parser.py:16-69``); Lark is
unavailable in this environment, so the grammar is re-expressed directly.

Grammar (unchanged semantics):
  lines      := (define | comment)*
  define     := "type" NAME type_params? "=" type ";"?
  type_params:= "<" param_def ("," param_def)* ">"
  param_def  := NAME ("extends" type)?
  type       := "|"? array ("|" array)*           (leading | allowed)
  array      := primary ("[" "]")*
  primary    := literal | LITERAL<...> | "never" | "any" | type_ref
              | struct | "(" type ")"
  type_ref   := NAME ("<" type ("," type)* ">")?
  struct     := "{" [field ((","|";") field)*] (","|";")? "}"
  field      := NAME "?"? ":" type
  literal    := number | string | "true" | "false"

Hint comments: ``parse`` first strips non-hint comments
(:func:`strip_ts_comments`, mirroring ``parser.py:272-331``); surviving
``// Hint:`` / ``/* Hint: */`` comments become plain strings in the
returned list, exactly as the reference's transformer emits them
(``parser.py:91-110,125-141``).
"""

from __future__ import annotations

import ast as pyast
import re

from .ast import (Any, Array, Define, Literal, Never, ParamDef, Struct, Type,
                  Union)

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+)
  | (?P<LINE_COMMENT>//[^\n]*)
  | (?P<BLOCK_COMMENT>/\*[\s\S]*?\*/)
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP><|>|\[|\]|\{|\}|\(|\)|\||,|;|:|\?|=)
""", re.VERBOSE)


class ParseError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ParseError(f"unexpected character {text[pos]!r} at {pos}")
        kind = m.lastgroup
        if kind != "WS":
            tokens.append((kind, m.group()))
        pos = m.end()
    tokens.append(("EOF", ""))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self._toks = tokens
        self._i = 0

    def _peek(self, ahead: int = 0) -> tuple[str, str]:
        return self._toks[min(self._i + ahead, len(self._toks) - 1)]

    def _next(self) -> tuple[str, str]:
        tok = self._toks[self._i]
        self._i += 1
        return tok

    def _expect(self, kind: str, value: str | None = None) -> str:
        k, v = self._next()
        if k != kind or (value is not None and v != value):
            raise ParseError(f"expected {value or kind}, got {v!r}")
        return v

    def _at(self, kind: str, value: str | None = None) -> bool:
        k, v = self._peek()
        return k == kind and (value is None or v == value)

    def _eat(self, kind: str, value: str | None = None) -> bool:
        if self._at(kind, value):
            self._next()
            return True
        return False

    # -- top level -----------------------------------------------------

    def lines(self) -> list:
        out = []
        while not self._at("EOF"):
            k, v = self._peek()
            if k == "LINE_COMMENT":
                self._next()
                if v.startswith("// Hint: "):
                    out.append("//" + v[8:])
                continue
            if k == "BLOCK_COMMENT":
                self._next()
                if v.startswith("/* Hint: "):
                    out.append("/*" + v[8:-2] + "*/")
                continue
            out.append(self.define())
        return out

    def define(self) -> Define:
        self._expect("NAME", "type")
        name = self._expect("NAME")
        params: list[ParamDef] = []
        if self._at("OP", "<"):
            params = self.type_params()
        self._expect("OP", "=")
        body = self.type()
        self._eat("OP", ";")
        return Define(name, params, body, None)

    def type_params(self) -> list[ParamDef]:
        self._expect("OP", "<")
        params = [self.param_def()]
        while self._eat("OP", ","):
            params.append(self.param_def())
        self._expect("OP", ">")
        return params

    def param_def(self) -> ParamDef:
        name = self._expect("NAME")
        extends = None
        if self._at("NAME", "extends"):
            self._next()
            extends = self.type()
        return ParamDef(name, extends)

    # -- types ---------------------------------------------------------

    def type(self):
        self._eat("OP", "|")  # leading | allowed
        members = [self.array_type()]
        while self._eat("OP", "|"):
            members.append(self.array_type())
        if len(members) == 1:
            return members[0]
        return Union(*members)

    def array_type(self):
        t = self.primary()
        while self._at("OP", "["):
            self._next()
            self._expect("OP", "]")
            t = Array(t)
        return t

    def primary(self):
        k, v = self._peek()
        if k == "NUMBER":
            self._next()
            try:
                return Literal(int(v))
            except ValueError:
                return Literal(float(v))
        if k == "STRING":
            self._next()
            return Literal(pyast.literal_eval(v))
        if k == "NAME":
            if v == "true":
                self._next()
                return Literal(True)
            if v == "false":
                self._next()
                return Literal(False)
            if v == "never":
                self._next()
                return Never()
            if v == "any":
                self._next()
                return Any
            if v == "LITERAL" and self._peek(1) == ("OP", "<") \
                    and self._peek(2)[0] == "STRING":
                return self.literalex()
            return self.type_ref()
        if k == "OP" and v == "{":
            return self.struct()
        if k == "OP" and v == "(":
            self._next()
            t = self.type()
            self._expect("OP", ")")
            return t
        raise ParseError(f"unexpected token {v!r}")

    def literalex(self) -> Literal:
        # LITERAL<"text", ["alias", ...], pinned>
        self._expect("NAME", "LITERAL")
        self._expect("OP", "<")
        text = pyast.literal_eval(self._expect("STRING"))
        self._expect("OP", ",")
        aliases: list[str] = []
        if self._eat("OP", "["):
            if not self._at("OP", "]"):
                aliases.append(pyast.literal_eval(self._expect("STRING")))
                while self._eat("OP", ","):
                    aliases.append(pyast.literal_eval(self._expect("STRING")))
            self._expect("OP", "]")
        else:  # single unbracketed string (grammar's inlined single item)
            aliases.append(pyast.literal_eval(self._expect("STRING")))
        self._expect("OP", ",")
        flag = self._expect("NAME")
        if flag not in ("true", "false"):
            raise ParseError(f"expected true/false, got {flag!r}")
        self._expect("OP", ">")
        return Literal(text, aliases, flag == "true")

    def type_ref(self) -> Type:
        name = self._expect("NAME")
        args = None
        if self._at("OP", "<"):
            self._next()
            args = [self.type()]
            while self._eat("OP", ","):
                args.append(self.type())
            self._expect("OP", ">")
        return Type(name, args)

    def struct(self) -> Struct:
        self._expect("OP", "{")
        fields: dict = {}
        while not self._at("OP", "}"):
            name = self._expect("NAME")
            if self._eat("OP", "?"):
                name += "?"
            self._expect("OP", ":")
            fields[name] = self.type()
            if not (self._eat("OP", ",") or self._eat("OP", ";")):
                break
        self._expect("OP", "}")
        return Struct(fields)


def strip_ts_comments(source_text: str) -> str:
    """Comment stripping with string-literal protection, preserving
    ``// Hint:`` line comments and ``/* Hint: */`` block comments
    (behavior of reference ``parser.py:272-331``)."""
    strings: list[str] = []

    def protect(m: re.Match) -> str:
        strings.append(m.group(0))
        return f"\x00S{len(strings) - 1}\x00"

    text = re.sub(r'"(?:[^"\\]|\\.)*"', protect, source_text)
    text = re.sub(r"'(?:[^'\\]|\\.)*'", protect, text)
    text = re.sub(r"`(?:[^`\\]|\\.)*`", protect, text)

    hints: list[str] = []

    def protect_hint(m: re.Match) -> str:
        hints.append(m.group(0))
        return f"\x00H{len(hints) - 1}\x00"

    text = re.sub(r"/\*\s*Hint:\s*.*?\*/", protect_hint, text, flags=re.DOTALL)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.DOTALL)
    for i, h in enumerate(hints):
        text = text.replace(f"\x00H{i}\x00", h)

    text = re.sub(r"//(?! Hint: ).*$", "", text, flags=re.MULTILINE)

    for i, s in enumerate(strings):
        text = text.replace(f"\x00S{i}\x00", s)
    return text


def parse(text: str) -> list:
    """TS type source → list of :class:`Define` nodes and hint-comment
    strings (reference ``parse``, ``parser.py:222-227``)."""
    clean = strip_ts_comments(text)
    return _Parser(_tokenize(clean)).lines()
