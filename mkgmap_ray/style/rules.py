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

# AddAccessAction targets (imgfmt/app/net/AccessTagsAndBits.java:49-57)
ACCESS_TAGS = (
    "mkgmap:foot", "mkgmap:bicycle", "mkgmap:car", "mkgmap:delivery",
    "mkgmap:truck", "mkgmap:bus", "mkgmap:taxi", "mkgmap:emergency",
)


@dataclass(frozen=True)
class Action:
    kind: str  # set | add | delete | name | ... | apply
    key: str
    value: str = ""
    # `apply` / `apply_once` sub-block (``osmstyle/actions/SubAction.java``):
    # the sub-actions run on each relation MEMBER (optionally role-filtered,
    # `once` dedupes repeated members). Inside sub-action values ``${x}``
    # reads the member's tags and ``$(x)`` the relation's — the compiler
    # rewrites ``$(x)`` to ``${__rel__x}`` and records the relation tags
    # needed (``rel_refs``) so the pipeline can ship them as patch columns.
    sub: tuple = ()
    role: str | None = None
    once: bool = False
    rel_refs: tuple = ()


@dataclass(frozen=True)
class Rule:
    expr: object
    actions: tuple[Action, ...]
    gtype: int | None  # Garmin type code, None for action-only rules
    resolution: int | None
    cont: bool  # continue: later rules still apply to matched rows
    # TypeReader extras (osmstyle/TypeReader.java): max resolution of a
    # "resolution N-M" range (single N defaults the max to 24), plus the
    # remaining key=value / flag tokens (road_class, road_speed, oneway,
    # toll, withindex, level, default_name) as a sorted tuple of pairs
    res_max: int | None = None
    attrs: tuple = ()


@dataclass
class RuleSet:
    rules: list[Rule] = field(default_factory=list)

    def used_tags(self) -> set:
        """The style's used-tag set — the reference's projection pushdown
        (``OsmHandler.setUsedTags``, ``reader/osm/OsmHandler.java:60-128``):
        readers may drop every other tag column at the source."""

        def action_tags(a: Action) -> set:
            out = {a.key} if a.key else set()
            # a spec is "tag" or "tag|filter:arg|..." — the tag itself,
            # plus any OTHER tag a not-contained/not-equal filter compares
            # against (those must survive projection pushdown too)
            for spec in _SUB_RE.findall(a.value):
                pieces = spec.split("|")
                out.add(pieces[0])
                for f in pieces[1:]:
                    fname, _, farg = f.partition(":")
                    if fname == "not-equal" and farg:
                        out.add(farg)
                    elif fname == "not-contained":
                        other = farg.partition(":")[2]
                        if other:
                            out.add(other)
            for s in a.sub:
                out |= action_tags(s)
            return {
                t[len("__rel__"):] if t.startswith("__rel__") else t
                for t in out
            }

        out = set()
        for r in self.rules:
            out |= r.expr.used_tags()
            for a in r.actions:
                out |= action_tags(a)
        out.discard("")
        return out

    def apply_programs(self) -> list[Action]:
        """All ``apply``/``apply_once`` actions in static rule order — the
        program table the relation→member patch pipeline indexes into."""
        return [a for r in self.rules for a in r.actions if a.kind == "apply"]

    def apply(self, tags: dict[str, pd.Series], n: int) -> dict:
        """Run the program over ``n`` rows of tag columns.

        Returns dict with ``gtype`` (int32, -1 = unresolved),
        ``resolution`` (int32, -1), ``matched_rule`` (int32 index of the
        finalizing rule, -1), ``name`` (string series, label slot 1),
        ``labels`` (the four label slots), the mutated tag columns, and
        ``extra``: additional map elements from rows that matched a typed
        ``continue`` rule and then ANOTHER typed rule — the reference
        emits one element per typed match (``RuleSet.java:79-110``), so
        ``extra`` is a list of (row_indices, gtype, resolution, rule_idx)
        the caller materializes as duplicate rows.

        Function pseudo-tags: a predicate key like ``maxspeed()`` is
        served from a provided column of that name (geometry functions
        are injected by the stage) or derived here for tag-only functions
        (``maxspeed()`` normalizes the maxspeed tag to km/h)."""
        tags = {k: v.astype("string") for k, v in tags.items()}
        self._derive_functions(tags, n)
        gtype = np.full(n, -1, np.int32)
        resolution = np.full(n, -1, np.int32)
        matched = np.full(n, -1, np.int32)
        labels = [pd.Series([pd.NA] * n, dtype="string") for _ in range(4)]
        done = np.zeros(n, dtype=bool)
        extra: list[tuple[np.ndarray, int, int, int]] = []
        # static index of each apply action (order in the rule file) — the
        # relation→member pipeline ships this as the patch `prog` id
        prog_of: dict[int, int] = {}
        for r in self.rules:
            for a in r.actions:
                if a.kind == "apply":
                    prog_of[id(a)] = len(prog_of)
        applies: list[tuple[int, Action, np.ndarray, dict]] = []

        for ri, rule in enumerate(self.rules):
            live = ~done
            if not live.any():
                break
            m = rule.expr.eval(tags, n) & live
            if not m.any():
                continue
            for a in rule.actions:
                if a.kind == "apply":
                    # record (prog, matched rows, $()-referenced relation
                    # values AT THIS POINT — later actions may mutate them)
                    idxs = np.nonzero(m)[0]
                    relvals = {
                        t: np.asarray(
                            tags.get(
                                t, pd.Series([pd.NA] * n, dtype="string")
                            ),
                            object,
                        )[idxs]
                        for t in a.rel_refs
                    }
                    applies.append((prog_of[id(a)], a, idxs, relvals))
                    continue
                if a.kind == "delete":
                    if a.key in tags:
                        tags[a.key] = tags[a.key].mask(m)
                    continue
                if a.kind == "deletealltags":
                    for k in list(tags):
                        if not k.endswith("()"):
                            tags[k] = tags[k].mask(m)
                    continue
                if a.kind == "rename":
                    # RenameAction: value moves old→new key, old removed
                    old = tags.get(a.key)
                    if old is None:
                        continue
                    new = tags.get(a.value)
                    if new is None:
                        new = pd.Series([pd.NA] * n, dtype="string")
                    mv = m & old.notna().to_numpy()
                    tags[a.value] = new.mask(mv, old)
                    tags[a.key] = old.mask(m)
                    continue
                if a.kind == "echo":
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
                elif a.kind == "addaccess":
                    # AddAccessAction: the value goes to EVERY mkgmap
                    # access tag (AccessTagsAndBits.ACCESS_TAGS)
                    for k in ACCESS_TAGS:
                        col = tags.get(k)
                        if col is None:
                            col = pd.Series([pd.NA] * n, dtype="string")
                        tags[k] = col.mask(m & val.notna().to_numpy(), val)
                elif a.kind == "name":
                    absent = labels[0].isna().to_numpy()
                    labels[0] = labels[0].mask(
                        m & absent & val.notna().to_numpy(), val
                    )
                elif a.kind == "addlabel":
                    # first empty of the four label slots per row
                    remaining = m & val.notna().to_numpy()
                    for slot in range(4):
                        absent = labels[slot].isna().to_numpy()
                        put = remaining & absent
                        if put.any():
                            labels[slot] = labels[slot].mask(put, val)
                            remaining = remaining & ~put
                        if not remaining.any():
                            break
            if rule.gtype is not None:
                sel = m & (gtype < 0)
                gtype[sel] = rule.gtype
                resolution[sel] = (
                    rule.resolution if rule.resolution is not None else 24
                )
                matched[sel] = ri
                again = m & (gtype >= 0) & ~sel  # typed-continue re-match
                if again.any():
                    extra.append(
                        (np.nonzero(again)[0],
                         rule.gtype,
                         rule.resolution if rule.resolution is not None
                         else 24,
                         ri)
                    )
                if not rule.cont:
                    done |= m
        return {
            "gtype": gtype,
            "resolution": resolution,
            "matched_rule": matched,
            "name": labels[0],
            "labels": labels,
            "tags": tags,
            "extra": extra,
            # (prog_id, action, row_indices, {rel_tag: values-at-rows}) per
            # fired apply action, in firing order — consumed by
            # stages/relstyle.py to emit member patches
            "applies": applies,
        }

    def _derive_functions(self, tags: dict[str, pd.Series], n: int) -> None:
        """Fill function pseudo-tag columns used by the rules but not
        provided by the caller: tag-derived functions are computed here;
        geometry functions default to NA (never match)."""
        used = set()
        for r in self.rules:
            used |= {k for k in r.expr.used_tags() if k.endswith("()")}
        for key in used:
            if key in tags:
                continue
            if key == "maxspeed()":
                from .unitconv import maxspeed_kmh

                src = tags.get("maxspeed")
                if src is None:
                    src = pd.Series([pd.NA] * n, dtype="string")
                tags[key] = maxspeed_kmh(src)
            elif key == "is_complete()":
                tags[key] = pd.Series(["true"] * n, dtype="string")
            else:
                tags[key] = pd.Series([pd.NA] * n, dtype="string")


# Garmin magic highway-shield prefix characters
# (``osmstyle/actions/HighwaySymbolFilter.java:42-49``).
_HIGHWAY_SYMBOLS = {
    "interstate": "\x01", "shield": "\x02", "round": "\x03",
    "hbox": "\x04", "box": "\x05", "oval": "\x06",
}


def _apply_value_filters(
    col: pd.Series, filters: list[str],
    tags: dict[str, pd.Series] | None = None,
) -> pd.Series:
    """``${tag|filter:arg|...}`` value-filter chain
    (``osmstyle/actions/*Filter.java``): ``subst:from=>to`` (replace-all,
    ``from~>to`` regex), ``substring:start[:end]``, ``part:sep[:n]`` (1-based,
    negative counts from the end; missing part → NA), ``def:x`` (default for
    missing/empty), ``prepend:x``, ``highway-symbol:sym[:maxAN[:maxA]]``,
    ``country-ISO``, ``not-contained:sep:tag``, ``not-equal:tag`` (the last
    two compare against ANOTHER tag of the same element, hence ``tags``).
    Unsupported filters raise at compile."""
    for f in filters:
        name, _, arg = f.partition(":")
        if name == "subst":
            if "~>" in arg:
                frm, to = arg.split("~>", 1)
                col = col.str.replace(frm, to, regex=True)
            else:
                frm, _, to = arg.partition("=>")
                col = col.str.replace(frm, to, regex=False)
        elif name == "substring":
            parts = arg.split(":")
            start = int(parts[0])
            if len(parts) > 1:
                col = col.str.slice(start, int(parts[1]))
            else:
                col = col.str.slice(start)
        elif name == "part":
            bits = arg.split(":")
            sep = bits[0] or ";"
            num = int(bits[1]) if len(bits) > 1 and bits[1] else 1
            split = col.str.split(sep, regex=False)

            def pick(v):
                if v is None or not isinstance(v, list):
                    return pd.NA
                if len(v) < abs(num) or num == 0:
                    return pd.NA
                idx = num - 1 if num > 0 else len(v) + num
                return v[idx].strip()

            col = split.map(pick).astype("string")
        elif name == "conv":
            from .unitconv import convert_series

            col = convert_series(col, arg)
        elif name == "def":
            col = col.mask(col.isna() | (col == ""), arg)
        elif name == "prepend":
            col = pd.Series([arg] * len(col), dtype="string").str.cat(col)
            col = col.mask(col.isna())
        elif name == "highway-symbol":
            # HighwaySymbolFilter.java:52-116: strip spaces, ';'->'/',
            # prefix the Garmin magic char unless the shield text exceeds
            # the length cap (alphanumeric vs alpha-only caps differ)
            bits = arg.split(":")
            sym = _HIGHWAY_SYMBOLS.get(bits[0], f"[{bits[0]}]")
            max_an = int(bits[1]) if len(bits) > 1 else 8
            max_a = int(bits[2]) if len(bits) > 2 else max_an
            shield = col.str.replace(" ", "", regex=False).str.replace(
                ";", "/", regex=False
            )
            is_an = shield.str.contains(r"\d", regex=True, na=False)
            ln = shield.str.len()
            too_long = (is_an & (ln > max_an)) | (~is_an & (ln > max_a))
            col = col.where(too_long.fillna(False), sym + shield)
        elif name == "country-ISO":
            from ..stages.locator import country_iso_series

            col = country_iso_series(col)
        elif name == "not-contained":
            # NotContainedFilter.java:44-60: NA unless value is absent
            # from the OTHER tag's sep-separated list (missing tag ->
            # value passes). Pairwise containment via np.char elementwise.
            sep, _, other = arg.partition(":")
            sep = sep or ";"
            if not other:
                raise ValueError(f"not-contained needs sep:tag, got {arg!r}")
            tagv = (tags or {}).get(other)
            if tagv is not None:
                tagv = tagv.astype("string")
                both = col.notna() & tagv.notna()
                hay = (sep + tagv.fillna("") + sep).to_numpy(str)
                needle = (sep + col.fillna("") + sep).to_numpy(str)
                contained = np.char.find(hay, needle) >= 0
                col = col.mask(both.to_numpy() & contained)
        elif name == "not-equal":
            # NotEqualFilter.java:28-40: NA when equal to the other tag
            tagv = (tags or {}).get(arg)
            if tagv is not None:
                col = col.mask((col == tagv.astype("string")).fillna(False))
        else:
            raise ValueError(f"unsupported value filter: {name!r}")
    return col


def _substitute(template: str, tags: dict[str, pd.Series], n: int) -> pd.Series:
    """``${tag}`` / ``${tag|filter:...}`` value substitution
    (``osmstyle/actions/ValueBuilder``): the result is NA for rows where
    any referenced value (after filters — ``def:`` can fill it) is
    missing."""
    refs = _SUB_RE.findall(template)
    if not refs:
        return pd.Series([template] * n, dtype="string")
    parts = _SUB_RE.split(template)  # [text, spec, text, spec, ..., text]
    cols = {}
    ok = np.ones(n, dtype=bool)
    for i in range(1, len(parts), 2):
        spec = parts[i]
        pieces = spec.split("|")
        ref, filters = pieces[0], pieces[1:]
        col = tags.get(ref)
        if col is None:
            col = pd.Series([pd.NA] * n, dtype="string")
        col = col.astype("string")
        if filters:
            col = _apply_value_filters(col, filters, tags)
        cols[i] = col
        ok &= col.notna().to_numpy()
    result = pd.Series([parts[0]] * n, dtype="string")
    for i in range(1, len(parts), 2):
        result = result.str.cat(cols[i].fillna("")).str.cat(
            pd.Series([parts[i + 1]] * n, dtype="string")
        )
    return result.mask(~ok)


DEFAULT_NAME_TAG_LIST = ("name", "place_name", "loc_name")


def finder_name(tags: dict[str, pd.Series], n: int,
                name_tag_list=DEFAULT_NAME_TAG_LIST) -> pd.Series:
    """``NameFinder`` semantics (``osmstyle/NameFinder.java``): the label
    is the first present tag in the configured ``name-tag-list`` priority
    order — a vectorized coalesce."""
    out = pd.Series([pd.NA] * n, dtype="string")
    for key in name_tag_list:
        col = tags.get(key)
        if col is None:
            continue
        col = col.astype("string")
        out = out.mask(out.isna() & col.notna(), col)
    return out


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


def _split_actions(text: str) -> list[str]:
    """Split an action block on ``;`` OUTSIDE quotes and OUTSIDE nested
    ``{}`` (a ``part:;`` filter argument inside a quoted value and the
    ``;``-separated sub-actions of an ``apply { ... }`` block must
    survive)."""
    parts = []
    cur = []
    q = None
    depth = 0
    for c in text:
        if q is not None:
            cur.append(c)
            if c == q:
                q = None
            continue
        if c in "'\"":
            q = c
            cur.append(c)
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        if c == ";" and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(c)
    parts.append("".join(cur))
    return parts


_REL_SUB_RE = re.compile(r"\$\(([^)]+)\)")


def _rewrite_rel_refs(text: str) -> tuple[str, tuple[str, ...]]:
    """Rewrite ``$(spec)`` (relation-scope substitution inside apply
    blocks, ``ValueBuilder.java`` '(' state) to ``${__rel__tag|filters}``
    and return the referenced relation tag names."""
    refs: list[str] = []

    def rw(mo: re.Match) -> str:
        spec = mo.group(1)
        tag, sep, rest = spec.partition("|")
        refs.append(tag)
        return "${__rel__" + tag + (sep + rest if sep else "") + "}"

    return _REL_SUB_RE.sub(rw, text), tuple(dict.fromkeys(refs))


def _parse_actions(text: str, in_apply: bool = False) -> tuple[Action, ...]:
    out = []
    for part in _split_actions(text):
        part = part.strip()
        if not part:
            continue
        m = re.match(
            r"apply(_once)?(?:\s+role\s*=\s*(\S+))?\s*\{(.*)\}\s*$",
            part,
            re.S,
        )
        if m:
            if in_apply:
                raise ValueError("nested apply blocks are not supported")
            body, refs = _rewrite_rel_refs(m.group(3))
            sub = _parse_actions(body, in_apply=True)
            for s in sub:
                if s.kind not in ("set", "add", "delete", "addaccess"):
                    raise ValueError(
                        f"unsupported sub-action in apply block: {s.kind!r}"
                    )
            role = m.group(2).strip("'\"") if m.group(2) else None
            out.append(
                Action(
                    "apply", "", "", sub=sub, role=role,
                    once=bool(m.group(1)), rel_refs=refs,
                )
            )
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
        m = re.match(r"deletealltags$", part)
        if m:
            out.append(Action("deletealltags", ""))
            continue
        m = re.match(r"name\s+(.+)$", part)
        if m:
            out.append(Action("name", "", m.group(1).strip().strip("'\"")))
            continue
        m = re.match(r"addlabel\s+(.+)$", part)
        if m:
            out.append(
                Action("addlabel", "", m.group(1).strip().strip("'\""))
            )
            continue
        m = re.match(r"addaccess\s+(.+)$", part)
        if m:
            out.append(
                Action("addaccess", "", m.group(1).strip().strip("'\""))
            )
            continue
        m = re.match(r"rename\s+(\S+)\s+(\S+)$", part)
        if m:
            out.append(Action("rename", m.group(1), m.group(2)))
            continue
        m = re.match(r"echo(tags)?\b", part)
        if m:  # diagnostic print in the reference; a no-op here
            out.append(Action("echo", "", part))
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
        gtype = resolution = res_max = None
        attrs: list[tuple[str, str]] = []
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
                    v = toks[i]
                    if "-" in v:  # TypeReader: range normalized min<=max
                        a, b = (int(x) for x in v.split("-", 1))
                        if a > b:
                            a, b = b, a
                        resolution, res_max = a, b
                    else:
                        resolution = int(v)
                elif t == "continue":
                    cont = True
                    if i + 1 < len(toks) and toks[i + 1] == "with_actions":
                        i += 1
                        attrs.append(("with_actions", "1"))
                elif t == "level":
                    i += 1
                    attrs.append(("level", toks[i]))
                elif "=" in t:
                    attrs.append(tuple(t.split("=", 1)))
                elif t in ("oneway", "toll", "withindex"):
                    attrs.append((t, "1"))
                else:
                    raise ValueError(f"bad type clause token {t!r} in {raw!r}")
                i += 1
        rules.append(Rule(expr, actions, gtype, resolution, cont,
                          res_max, tuple(sorted(attrs))))
    return RuleSet(rules)
