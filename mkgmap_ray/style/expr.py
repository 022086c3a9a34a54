"""Style predicate expressions: tokenizer + recursive-descent parser +
vectorized evaluator.

Faithful subset of the reference's eval package
(``osmstyle/eval/*.java``, 27 operator classes; grammar
``doc/styles/rules.txt``):

- comparisons ``= != < <= > >= ~ !~`` (``EqualsOp``, ``GTOp``,
  ``RegexOp``…), with ``key=*`` → exists and ``key!=*`` → not-exists
  (``ExistsOp``/``NotExistsOp``);
- boolean ``! & |`` with the reference's precedence (! > & > |) and
  parentheses;
- numeric comparisons coerce the tag value like ``ValueOp.getNumberValue``
  (non-numeric → no match). Unit-suffix conversions
  (``UnitConversions.java``) are deliberately out of round-1 scope.

Evaluation is vectorized: every node maps to one boolean-mask pass over
pandas string columns; missing tags are pd.NA.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<op>!=|<=|>=|!~|[=<>~!&|()])
    | (?P<quoted>'[^']*'|"[^"]*")
    | (?P<word>[^\s!=<>~&|(){}\[\]]+)
    )""",
    re.VERBOSE,
)


def tokenize(text: str) -> list[tuple[str, str]]:
    """→ list of (kind, value); kind ∈ {op, value}. Mirrors
    ``scan/TokenScanner`` at the granularity the rule grammar needs."""
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"bad style token at: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.group("op"):
            out.append(("op", m.group("op")))
        elif m.group("quoted"):
            out.append(("value", m.group("quoted")[1:-1]))
        else:
            word = m.group("word")
            if word[0] in "'\"":
                raise ValueError(f"unterminated quote at: {word!r}")
            out.append(("value", word))
    return out


@dataclass(frozen=True)
class Cmp:
    key: str
    op: str  # = != < <= > >= ~ !~ exists !exists
    value: str

    def used_tags(self) -> set:
        return {self.key}

    def eval(self, tags: dict[str, pd.Series], n: int) -> np.ndarray:
        col = tags.get(self.key)
        if col is None:
            present = np.zeros(n, dtype=bool)
            s = pd.Series([pd.NA] * n, dtype="string")
        else:
            s = col.astype("string")
            present = s.notna().to_numpy()
        if self.op == "exists":
            return present
        if self.op == "!exists":
            return ~present
        if self.op in ("=", "!="):
            eq = (s == self.value).fillna(False).to_numpy() & present
            # NotEqualOp is the pure negation of EqualsOp
            # (``eval/NotEqualOp.java:31-33``): a MISSING tag matches ``!=``
            return eq if self.op == "=" else ~eq
        if self.op in ("~", "!~"):
            # reference RegexOp: full-match semantics (Java matches())
            m = s.str.fullmatch(self.value).fillna(False).to_numpy() & present
            return m if self.op == "~" else ~m
        # numeric comparisons: non-numeric / missing never match
        v = pd.to_numeric(s, errors="coerce")
        try:
            rhs = float(self.value)
        except ValueError:
            return np.zeros(n, dtype=bool)
        arr = v.to_numpy(dtype="float64", na_value=np.nan)
        with np.errstate(invalid="ignore"):
            if self.op == "<":
                out = arr < rhs
            elif self.op == "<=":
                out = arr <= rhs
            elif self.op == ">":
                out = arr > rhs
            else:
                out = arr >= rhs
        return out & ~np.isnan(arr)


@dataclass(frozen=True)
class Not:
    child: object

    def used_tags(self) -> set:
        return self.child.used_tags()

    def eval(self, tags, n):
        return ~self.child.eval(tags, n)


@dataclass(frozen=True)
class And:
    children: tuple

    def used_tags(self) -> set:
        return set().union(*(c.used_tags() for c in self.children))

    def eval(self, tags, n):
        out = self.children[0].eval(tags, n)
        for c in self.children[1:]:
            out = out & c.eval(tags, n)
        return out


@dataclass(frozen=True)
class Or:
    children: tuple

    def used_tags(self) -> set:
        return set().union(*(c.used_tags() for c in self.children))

    def eval(self, tags, n):
        out = self.children[0].eval(tags, n)
        for c in self.children[1:]:
            out = out | c.eval(tags, n)
        return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_or(self):
        kids = [self.parse_and()]
        while self.peek() == ("op", "|"):
            self.take()
            kids.append(self.parse_and())
        return kids[0] if len(kids) == 1 else Or(tuple(kids))

    def parse_and(self):
        kids = [self.parse_term()]
        while self.peek() == ("op", "&"):
            self.take()
            kids.append(self.parse_term())
        return kids[0] if len(kids) == 1 else And(tuple(kids))

    def parse_term(self):
        kind, val = self.peek()
        if (kind, val) == ("op", "!"):
            self.take()
            return Not(self.parse_term())
        if (kind, val) == ("op", "("):
            self.take()
            e = self.parse_or()
            if self.take() != ("op", ")"):
                raise ValueError("expected )")
            return e
        return self.parse_cmp()

    def parse_cmp(self):
        kind, key = self.take()
        if kind != "value":
            raise ValueError(f"expected tag key, got {key!r}")
        # style FUNCTION call: `length() > 100` — the function becomes a
        # pseudo-tag key "length()" whose column the stage/ruleset supplies
        # (``osmstyle/function/*.java``)
        if self.peek() == ("op", "(") and self.toks[self.i + 1 : self.i + 2] \
                == [("op", ")")]:
            self.take()
            self.take()
            key = key + "()"
        kind, op = self.peek()
        if kind != "op" or op not in ("=", "!=", "<", "<=", ">", ">=", "~", "!~"):
            raise ValueError(f"expected comparison after {key!r}")
        self.take()
        kind, val = self.take()
        if kind != "value":
            raise ValueError(f"expected value after {key} {op}")
        if val == "*":
            if op == "=":
                return Cmp(key, "exists", "")
            if op == "!=":
                return Cmp(key, "!exists", "")
        return Cmp(key, op, val)


def parse_expr(text: str):
    """Parse a predicate expression string into an AST."""
    p = _Parser(tokenize(text))
    e = p.parse_or()
    if p.i != len(p.toks):
        raise ValueError(f"trailing tokens in expression: {text!r}")
    return e
