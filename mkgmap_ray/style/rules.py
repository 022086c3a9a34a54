"""Rule compilation + vectorized first-match-wins application.

Mirrors ``osmstyle/RuleSet.java:62-110`` (rules evaluate in file order;
the first matching rule that yields a type ends resolution unless it is
marked ``continue``) and the action set of ``osmstyle/actions/*.java``
(``set``/``add``/``delete``/``name``; ``${tag}`` value substitution from
``ValueBuilder``).

Rule text format (one rule per line, ``#`` comments):

    predicate {action; action} [0xNN resolution R] [continue]

Application is vectorized: for each rule in order, one boolean-mask pass
evaluates the predicate on NOT-yet-finalized rows, actions assign masked
column values, and rows matching a typed non-continue rule are finalized.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .expr import parse_expr

_SUB_RE = re.compile(r"\$\{([^}]+)\}")


@dataclass(frozen=True)
class Action:
    kind: str  # set | add | delete | name
    key: str
    value: str = ""


@dataclass(frozen=True)
class Rule:
    expr: object
    actions: tuple[Action, ...]
    gtype: int | None  # Garmin type code, None for action-only rules
    resolution: int | None
    cont: bool  # continue: later rules still apply to matched rows


@dataclass
class RuleSet:
    rules: list[Rule] = field(default_factory=list)

    def used_tags(self) -> set:
        """The style's used-tag set — the reference's projection pushdown
        (``OsmHandler.setUsedTags``, ``reader/osm/OsmHandler.java:60-128``):
        readers may drop every other tag column at the source."""
        out = set()
        for r in self.rules:
            out |= r.expr.used_tags()
            for a in r.actions:
                out.add(a.key)
                out |= set(_SUB_RE.findall(a.value))
        return out

    def apply(self, tags: dict[str, pd.Series], n: int) -> dict:
        """Run the program over ``n`` rows of tag columns.

        Returns dict with ``gtype`` (int32, -1 = unresolved),
        ``resolution`` (int32, -1), ``matched_rule`` (int32 index of the
        finalizing rule, -1), ``name`` (string series) and the mutated tag
        columns."""
        tags = {k: v.astype("string") for k, v in tags.items()}
        gtype = np.full(n, -1, np.int32)
        resolution = np.full(n, -1, np.int32)
        matched = np.full(n, -1, np.int32)
        name = pd.Series([pd.NA] * n, dtype="string")
        done = np.zeros(n, dtype=bool)

        for ri, rule in enumerate(self.rules):
            live = ~done
            if not live.any():
                break
            m = rule.expr.eval(tags, n) & live
            if not m.any():
                continue
            for a in rule.actions:
                if a.kind == "delete":
                    if a.key in tags:
                        tags[a.key] = tags[a.key].mask(m)
                    continue
                val = _substitute(a.value, tags, n)
                if a.kind == "set":
                    col = tags.get(a.key)
                    if col is None:
                        col = pd.Series([pd.NA] * n, dtype="string")
                    tags[a.key] = col.mask(m & val.notna().to_numpy(), val)
                elif a.kind == "add":
                    col = tags.get(a.key)
                    if col is None:
                        col = pd.Series([pd.NA] * n, dtype="string")
                    absent = col.isna().to_numpy()
                    tags[a.key] = col.mask(
                        m & absent & val.notna().to_numpy(), val
                    )
                elif a.kind == "name":
                    absent = name.isna().to_numpy()
                    name = name.mask(m & absent & val.notna().to_numpy(), val)
            if rule.gtype is not None:
                sel = m & (gtype < 0)
                gtype[sel] = rule.gtype
                resolution[sel] = (
                    rule.resolution if rule.resolution is not None else 24
                )
                matched[sel] = ri
                if not rule.cont:
                    done |= m
        return {
            "gtype": gtype,
            "resolution": resolution,
            "matched_rule": matched,
            "name": name,
            "tags": tags,
        }


def _substitute(template: str, tags: dict[str, pd.Series], n: int) -> pd.Series:
    """``${tag}`` value substitution (``osmstyle/actions/ValueBuilder``):
    the result is NA for rows where any referenced tag is missing."""
    refs = _SUB_RE.findall(template)
    if not refs:
        return pd.Series([template] * n, dtype="string")
    ok = np.ones(n, dtype=bool)
    for ref in refs:
        col = tags.get(ref)
        if col is None:
            return pd.Series([pd.NA] * n, dtype="string")
        ok &= col.notna().to_numpy()
    # build by concatenation: split template on refs and interleave
    parts = _SUB_RE.split(template)  # [text, ref, text, ref, ..., text]
    result = pd.Series([parts[0]] * n, dtype="string")
    for i in range(1, len(parts), 2):
        ref_col = tags[parts[i]].astype("string").fillna("")
        result = result.str.cat(ref_col).str.cat(
            pd.Series([parts[i + 1]] * n, dtype="string")
        )
    return result.mask(~ok)


def _split_rule(line: str):
    """Quote-aware split of a rule line into (pred, actions, type) texts —
    ``#`` comments, ``{}`` action blocks and ``[]`` type clauses only count
    OUTSIDE quoted values, so regex values like ``'Brand#1[0-9]'`` survive
    (the reference's ``TokenScanner`` gets this for free by tokenizing
    before structure)."""
    pred = None
    actions = None
    typ = None
    cur: list[str] = []
    section = "pred"
    q = None
    depth = 0
    for c in line:
        if q is not None:
            cur.append(c)
            if c == q:
                q = None
            continue
        if c in "'\"":
            q = c
            cur.append(c)
            continue
        if c == "#":
            break  # comment outside quotes ends the line
        if section == "pred" and c == "{":
            pred = "".join(cur)
            cur = []
            section = "actions"
            depth = 1
            continue
        if section == "actions":
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    actions = "".join(cur)
                    cur = []
                    section = "post"
                    continue
            cur.append(c)
            continue
        if section in ("pred", "post") and c == "[":
            if section == "pred":
                pred = "".join(cur)
            cur = []
            section = "type"
            continue
        if section == "type" and c == "]":
            typ = "".join(cur)
            cur = []
            section = "end"
            continue
        cur.append(c)
    if q is not None:
        raise ValueError(f"unterminated quote in rule: {line!r}")
    if section == "pred":
        pred = "".join(cur)
    elif section in ("actions", "type"):
        raise ValueError(f"unterminated {section} block in rule: {line!r}")
    elif cur and "".join(cur).strip():
        raise ValueError(f"trailing text after rule: {line!r}")
    return (pred or "").strip(), actions, typ


def _parse_actions(text: str) -> tuple[Action, ...]:
    out = []
    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        m = re.match(r"(set|add)\s+([^\s=]+)\s*=\s*(.+)$", part)
        if m:
            val = m.group(3).strip().strip("'\"")
            out.append(Action(m.group(1), m.group(2), val))
            continue
        m = re.match(r"delete\s+(\S+)$", part)
        if m:
            out.append(Action("delete", m.group(1)))
            continue
        m = re.match(r"name\s+(.+)$", part)
        if m:
            out.append(Action("name", "", m.group(1).strip().strip("'\"")))
            continue
        raise ValueError(f"unsupported style action: {part!r}")
    return tuple(out)


def compile_style(text: str) -> RuleSet:
    """Compile rule lines into a RuleSet (``RuleFileReader`` analogue)."""
    rules = []
    for raw in text.splitlines():
        pred_text, actions_text, tpart = _split_rule(raw)
        if not pred_text:
            if actions_text or tpart:
                raise ValueError(f"rule without predicate: {raw!r}")
            continue
        expr = parse_expr(pred_text)
        actions = _parse_actions(actions_text or "")
        gtype = resolution = None
        cont = False
        if tpart is not None:
            toks = tpart.split()
            i = 0
            while i < len(toks):
                t = toks[i]
                if t.startswith("0x"):
                    gtype = int(t, 16)
                elif t == "resolution":
                    i += 1
                    resolution = int(toks[i])
                elif t == "continue":
                    cont = True
                else:
                    raise ValueError(f"bad type clause token {t!r} in {raw!r}")
                i += 1
        rules.append(Rule(expr, actions, gtype, resolution, cont))
    return RuleSet(rules)
