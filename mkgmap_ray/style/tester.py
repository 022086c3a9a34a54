"""StyleTester harness (``main/StyleTester.java`` single-test-file mode).

Test file format (StyleTester.java class doc):

    WAY 42
    highway=primary
    oneway=reverse

    <<<lines>>>
    highway=primary [0x3 road_class=2 road_speed=2]
    power=line [0x29 resolution 20]

Any number of ``WAY [id]`` blocks (tags until a blank line), then style
file sections introduced by ``<<<name>>>`` markers. Results format one
line per produced element, mirroring ``StyleTester.formatResults`` /
``lineToString`` / ``roadToString``:

    WAY 42: Road 0x3, labels=[null, null, null, null], res=24-24
        road class=2 speed=2
    WAY 1: Line 0x29, labels=[null, null, null, null], res=20-24

(points are fixed at (1/1),(2/2) in the reference and carried verbatim
here). A ``<<<results>>>`` section, when present, is the golden output:
``check_style_test`` compares against it line for line — the harness
analogue of the reference's strict-vs-actual comparison.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

from .rules import compile_style


def parse_test_file(text: str):
    """→ (ways, sections): ways = list of (id, {tag: value}) in file
    order; sections = {name: text} for every ``<<<name>>>`` block."""
    ways: list[tuple[int, dict]] = []
    sections: dict[str, list[str]] = {}
    cur_way: dict | None = None
    cur_section: str | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("<<<") and line.endswith(">>>"):
            cur_section = line[3:-3]
            sections.setdefault(cur_section, [])
            cur_way = None
            continue
        if cur_section is not None:
            sections[cur_section].append(raw)
            continue
        low = line.lower()
        if low.startswith("way"):
            parts = line.split()
            wid = int(parts[1]) if len(parts) > 1 else 1
            cur_way = {}
            ways.append((wid, cur_way))
            continue
        if cur_way is not None:
            if "=" not in line:
                cur_way = None  # blank (or junk) line ends the way
                continue
            k, _, v = line.partition("=")
            cur_way[k.strip()] = v.strip()
    return ways, {k: "\n".join(v) for k, v in sections.items()}


def _fmt_labels(labels, i) -> str:
    out = []
    for s in labels:
        v = s.iloc[i] if hasattr(s, "iloc") else s[i]
        out.append("null" if pd.isna(v) else str(v))
    return "[" + ", ".join(out) + "]"


def run_style_test(text: str) -> list[str]:
    """Apply the test file's ``<<<lines>>>`` style to its ways; one
    result line per produced element (typed ``continue`` matches emit
    extra elements, RuleSet.java:79-110)."""
    ways, sections = parse_test_file(text)
    rs = compile_style(sections.get("lines", ""))
    n = len(ways)
    keys = {k for _, tags in ways for k in tags}
    cols = {
        k: pd.Series([tags.get(k) for _, tags in ways], dtype="string")
        for k in keys
    }
    res = rs.apply(cols, n)
    gtype = res["gtype"]
    resolution = res["resolution"]
    matched = res["matched_rule"]
    labels = res["labels"]

    def fmt(i: int, gt: int, rmin: int, rule_idx: int) -> str:
        rule = rs.rules[rule_idx] if rule_idx >= 0 else None
        attrs = dict(rule.attrs) if rule is not None else {}
        rmax = rule.res_max if rule is not None and rule.res_max else 24
        if rmin < 0:
            rmin = 24
        kind = "Road" if "road_class" in attrs else "Line"
        s = (
            f"WAY {ways[i][0]}: {kind} 0x{gt:x}, "
            f"labels={_fmt_labels(labels, i)}, res={rmin}-{rmax}"
            f" (1/1),(2/2),"
        )
        if kind == "Road":
            s += (
                f" road class={attrs['road_class']}"
                f" speed={attrs.get('road_speed', 0)}"
            )
        return s

    # one element per typed match, in rule order (RuleSet.java:79-110)
    per_way: dict[int, list[tuple[int, str]]] = {i: [] for i in range(n)}
    for idxs, gt, rmin, rule_idx in res.get("extra", ()):
        for i in np.asarray(idxs):
            per_way[int(i)].append(
                (rule_idx, fmt(int(i), gt, rmin, rule_idx))
            )
    for i in range(n):
        if gtype[i] >= 0:
            per_way[i].append((
                int(matched[i]),
                fmt(i, int(gtype[i]), int(resolution[i]), int(matched[i])),
            ))
    return [
        line for i in range(n) for _, line in sorted(per_way[i])
    ]


def check_style_test(text: str) -> tuple[list[str], list[str]]:
    """→ (actual, diffs): diffs is empty when the ``<<<results>>>``
    section matches the produced lines exactly (whitespace-stripped)."""
    _, sections = parse_test_file(text)
    actual = run_style_test(text)
    expected = [
        line.strip() for line in sections.get("results", "").splitlines()
        if line.strip()
    ]
    diffs = []
    if "results" in sections and expected != [a.strip() for a in actual]:
        diffs = [f"- {e}" for e in expected] + [f"+ {a}" for a in actual]
    return actual, diffs


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: python -m mkgmap_ray.style.tester <testfile>")
        return 2
    text = open(argv[0]).read()
    actual, diffs = check_style_test(text)
    for line in actual:
        print(line)
    if diffs:
        print("ERROR expected result is:")
        for d in diffs:
            print(d)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
