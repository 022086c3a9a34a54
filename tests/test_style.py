"""Style rule engine: parser, evaluator, first-match/continue semantics —
the engine's StyleTester analogue (``main/StyleTester.java``)."""

import numpy as np
import pandas as pd
import pytest

from mkgmap_ray.style import compile_style, parse_expr
from mkgmap_ray.style.rules import RuleSet


def L(series):
    return [None if pd.isna(x) else x for x in series]


def T(**cols):
    n = max((len(v) for v in cols.values()), default=1)
    return {k: pd.Series(v, dtype="string") for k, v in cols.items()}, n


class TestExpr:
    def eval1(self, text, tags_dict):
        tags, n = T(**{k: [v] for k, v in tags_dict.items()})
        return bool(parse_expr(text).eval(tags, 1)[0])

    def test_equals_missing_is_false(self):
        assert not self.eval1("highway=primary", {"name": "x"})
        assert self.eval1("highway=primary", {"highway": "primary"})
        assert not self.eval1("highway=primary", {"highway": "trunk"})

    def test_not_equals_matches_missing(self):
        # NotEqualOp is !EqualsOp (eval/NotEqualOp.java:31-33)
        assert self.eval1("highway!=primary", {"name": "x"})
        assert self.eval1("highway!=primary", {"highway": "trunk"})
        assert not self.eval1("highway!=primary", {"highway": "primary"})

    def test_exists(self):
        assert self.eval1("highway=*", {"highway": "x"})
        assert not self.eval1("highway=*", {"name": "x"})
        assert self.eval1("highway!=*", {"name": "x"})
        assert not self.eval1("highway!=*", {"highway": "x"})

    def test_numeric(self):
        assert self.eval1("lanes>2", {"lanes": "3"})
        assert not self.eval1("lanes>2", {"lanes": "2"})
        assert not self.eval1("lanes>2", {"lanes": "many"})  # non-numeric
        assert not self.eval1("lanes>2", {})
        assert self.eval1("lanes<=2", {"lanes": "2"})

    def test_regex_fullmatch(self):
        assert self.eval1("ref~'A[0-9]+'", {"ref": "A12"})
        assert not self.eval1("ref~'A[0-9]+'", {"ref": "xA12y"})
        assert self.eval1("ref!~'A[0-9]+'", {"ref": "B1"})
        assert self.eval1("ref!~'A[0-9]+'", {})  # negation matches missing

    def test_bool_precedence(self):
        # ! > & > |
        e = "a=1 | b=1 & c=1"
        assert self.eval1(e, {"a": "1"})
        assert not self.eval1(e, {"b": "1"})
        assert self.eval1(e, {"b": "1", "c": "1"})
        assert self.eval1("!(a=1) & b=1", {"b": "1"})
        assert not self.eval1("!a=1 & b=1", {"a": "1", "b": "1"})

    def test_parse_errors(self):
        for bad in ("=", "a=", "a = 1 )", "(a=1", "a ? 1"):
            with pytest.raises(ValueError):
                parse_expr(bad)


STYLE = """
# roads
highway=motorway  [0x01 resolution 12]
highway=primary & lanes>2 {set wide=yes} [0x02 resolution 18]
highway=primary   [0x03 resolution 20]
highway=*  {add surface=unknown} [0x04 resolution 22 continue]
surface=unknown  [0x05 resolution 24]
"""


class TestRuleSet:
    def test_first_match_wins(self):
        rs = compile_style(STYLE)
        tags, n = T(
            highway=["motorway", "primary", "primary", "track", None],
            lanes=[None, "4", "1", None, None],
        )
        out = rs.apply(tags, n)
        assert out["gtype"].tolist() == [0x01, 0x02, 0x03, 0x04, -1]
        assert out["resolution"].tolist() == [12, 18, 20, 22, -1]
        # wide set only on the matched second row
        assert L(out["tags"]["wide"]) == [None, "yes", None, None, None]

    def test_continue_rule_chains(self):
        rs = compile_style(STYLE)
        tags, n = T(highway=["track"], lanes=[None])
        out = rs.apply(tags, n)
        # row matched rule 4 (continue, adds surface=unknown) — gtype is from
        # the FIRST typed match (0x04); the continue lets rule 5 run its
        # actions but gtype stays
        assert out["gtype"].tolist() == [0x04]
        assert L(out["tags"]["surface"]) == ["unknown"]

    def test_add_vs_set(self):
        rs = compile_style(
            "a=* {add b=new; set c=new}\n"
        )
        tags, n = T(a=["1", "1"], b=["old", None], c=["old", None])
        out = rs.apply(tags, n)
        assert L(out["tags"]["b"]) == ["old", "new"]  # add keeps old
        assert L(out["tags"]["c"]) == ["new", "new"]  # set overwrites

    def test_delete_and_name(self):
        rs = compile_style(
            "a=* {delete secret; name '${ref} road'} [0x10]\n"
        )
        tags, n = T(a=["1", "1"], secret=["x", "y"], ref=["A1", None])
        out = rs.apply(tags, n)
        assert out["tags"]["secret"].isna().all()
        assert L(out["name"]) == ["A1 road", None]

    def test_used_tags(self):
        rs = compile_style(STYLE)
        assert rs.used_tags() == {"highway", "lanes", "wide", "surface"}

    def test_rule_order_is_file_order(self):
        rs = compile_style("x=1 [0x01]\nx=1 [0x02]\n")
        tags, n = T(x=["1"])
        assert rs.apply(tags, n)["gtype"].tolist() == [0x01]


class TestStyleStage:
    def test_apply_over_dataset(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from mkgmap_ray.stages.stylestage import apply_style

        t = pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "hw": pa.array(["motorway", "primary", None], pa.string()),
                "ln": pa.array([None, "4", None], pa.string()),
            }
        )
        out = apply_style(
            rd.from_arrow(t), STYLE,
            tag_columns={"highway": "hw", "lanes": "ln"},
            keep=["id"], concurrency=1,
        ).to_pandas().sort_values("id")
        assert out["gtype"].tolist() == [0x01, 0x02, -1]


class TestValueFilters:
    def run(self, template, **cols):
        from mkgmap_ray.style.rules import _substitute

        tags, n = T(**cols)
        return L(_substitute(template, tags, n))

    def test_subst_literal_and_regex(self):
        assert self.run("${a|subst:b=>X}", a=["abcb"]) == ["aXcX"]
        assert self.run("${a|subst:b}", a=["abcb"]) == ["ac"]  # delete
        assert self.run("${a|subst:[0-9]+~>N}", a=["x12y3"]) == ["xNyN"]

    def test_substring(self):
        assert self.run("${a|substring:2}", a=["abcdef"]) == ["cdef"]
        assert self.run("${a|substring:1:3}", a=["abcdef"]) == ["bc"]

    def test_part(self):
        assert self.run("${a|part:;:2}", a=["x;y;z"]) == ["y"]
        assert self.run("${a|part:;}", a=["x;y;z"]) == ["x"]
        assert self.run("${a|part:;:-1}", a=["x;y;z"]) == ["z"]
        assert self.run("${a|part:;:5}", a=["x;y"]) == [None]  # out of range

    def test_def_fills_missing(self):
        assert self.run("${a|def:unknown}", a=[None]) == ["unknown"]
        assert self.run("${a|def:unknown}", a=[""]) == ["unknown"]
        assert self.run("${a|def:unknown}", a=["v"]) == ["v"]

    def test_prepend_and_chain(self):
        assert self.run("${a|prepend:pre-}", a=["x"]) == ["pre-x"]
        assert self.run(
            "${a|part:;:2|subst:o=>0|prepend:P}", a=["foo;boo"]
        ) == ["Pb00"]

    def test_unsupported_filter_raises(self):
        import pytest

        with pytest.raises(ValueError):
            self.run("${a|frobnicate:1}", a=["x"])

    def test_used_tags_strips_filters(self):
        rs = compile_style("a=* {set b='${c|def:x} ${d|part:;:1}'}\n")
        assert rs.used_tags() == {"a", "b", "c", "d"}

    def test_highway_symbol(self):
        # HighwaySymbolFilter: spaces stripped, ';'->'/', magic prefix
        assert self.run("${a|highway-symbol:box}", a=["A 67"]) == [
            "\x05A67"
        ]
        assert self.run("${a|highway-symbol:box}", a=["B3;B4"]) == [
            "\x05B3/B4"
        ]
        # unknown symbol name -> bracketed literal prefix
        assert self.run("${a|highway-symbol:xyz}", a=["A1"]) == ["[xyz]A1"]
        # alphanumeric over maxAlphaNum cap -> original value untouched
        assert self.run(
            "${a|highway-symbol:box:3:5}", a=["A6144", "QEW", "TOOLONG"]
        ) == ["A6144", "\x05QEW", "TOOLONG"]
        assert self.run("${a|highway-symbol:box}", a=[None]) == [None]

    def test_country_iso(self):
        assert self.run(
            "${a|country-ISO}",
            a=["Deutschland", "UK", "united kingdom ", "Atlantis", None],
        ) == ["DEU", "GBR", "GBR", "Atlantis", None]

    def test_not_equal(self):
        # value suppressed where equal to the OTHER tag
        assert self.run(
            "${a|not-equal:b}", a=["x", "y", "z"], b=["x", "q", None]
        ) == [None, "y", "z"]

    def test_not_contained(self):
        # value suppressed where contained in the other tag's ;-list
        assert self.run(
            "${a|not-contained:;:b}",
            a=["x", "x", "x", None],
            b=["x;y", "xx;y", None, "x"],
        ) == [None, "x", "x", None]
        # custom separator
        assert self.run(
            "${a|not-contained:,:b}", a=["x"], b=["x,y"]
        ) == [None]

    def test_used_tags_sees_filter_refs(self):
        rs = compile_style(
            "a=* {set b='${c|not-equal:d}'; set e='${f|not-contained:;:g}'}\n"
        )
        assert rs.used_tags() == {"a", "b", "c", "d", "e", "f", "g"}


class TestStyleFunctions:
    def test_length_area_closed_predicates(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from mkgmap_ray.stages.stylestage import apply_style

        D = 1 << 6  # DELTA_SHIFT
        rows = {
            "fid": pa.array([0, 1, 2], pa.int64()),
            "hw": pa.array(["a", "a", "a"]),
            # row0: open line length 100mu; row1: closed 10x10 square;
            # row2: two-point short line
            "lat_hp": pa.array(
                [[0, 0], [0 * D, 0 * D, 10 * D, 10 * D, 0 * D], [0, 0]],
                pa.list_(pa.int64()),
            ),
            "lon_hp": pa.array(
                [[0, 100 * D], [0 * D, 10 * D, 10 * D, 0 * D, 0 * D],
                 [0, 3 * D]],
                pa.list_(pa.int64()),
            ),
        }
        style = """
hw=a & is_closed()=true & area_size() >= 100 [0x10]
hw=a & length() > 50                         [0x11]
hw=a                                         [0x12]
"""
        out = apply_style(
            rd.from_arrow(pa.table(rows)), style,
            tag_columns={"hw": "hw"}, keep=["fid"],
        ).to_pandas().sort_values("fid")
        assert out["gtype"].tolist() == [0x11, 0x10, 0x12]

    def test_maxspeed_units_and_conv_filter(self, ray_session):
        import pandas as pd

        from mkgmap_ray.style import compile_style

        rs = compile_style(
            "maxspeed() >= 48 [0x01]\nhw=* [0x02]"
        )
        tags = {
            "maxspeed": pd.Series(["30 mph", "45", "50"], dtype="string"),
            "hw": pd.Series(["x", "x", "x"], dtype="string"),
        }
        res = rs.apply(tags, 3)
        # 30 mph = 48.28 km/h ≥ 48 ✓; 45 < 48 ✗; 50 ✓
        assert res["gtype"].tolist() == [0x01, 0x02, 0x01]

    def test_conv_value_filter(self):
        import pandas as pd

        from mkgmap_ray.style.rules import _apply_value_filters

        col = pd.Series(["10", "3 km", "bad"], dtype="string")
        out = _apply_value_filters(col, ["conv:m=>ft"])
        assert abs(float(out[0]) - 32.8084) < 0.001
        assert abs(float(out[1]) - 9842.52) < 0.01
        assert out[2] is pd.NA

    def test_new_actions(self):
        import pandas as pd

        from mkgmap_ray.style import compile_style
        from mkgmap_ray.style.rules import ACCESS_TAGS

        rs = compile_style(
            "hw=private {addaccess 'no'; rename old new;"
            " addlabel 'L1'; addlabel 'L2'} [0x01]\n"
            "hw=wipe {deletealltags} [0x02]"
        )
        tags = {
            "hw": pd.Series(["private", "wipe", "other"], dtype="string"),
            "old": pd.Series(["v", "w", "x"], dtype="string"),
        }
        res = rs.apply(tags, 3)
        t = res["tags"]
        for k in ACCESS_TAGS:
            assert t[k][0] == "no" and pd.isna(t[k][2])
        assert t["new"][0] == "v" and pd.isna(t["old"][0])
        assert pd.isna(t["hw"][1]) and pd.isna(t["old"][1])  # deletealltags
        assert t["old"][2] == "x"
        assert res["labels"][0][0] == "L1"
        assert res["labels"][1][0] == "L2"

    def test_typed_continue_emits_extra(self):
        import pandas as pd

        from mkgmap_ray.style import compile_style

        rs = compile_style(
            "hw=both [0x01 continue]\nhw=* [0x02]"
        )
        tags = {"hw": pd.Series(["both", "only"], dtype="string")}
        res = rs.apply(tags, 2)
        assert res["gtype"].tolist() == [0x01, 0x02]
        assert len(res["extra"]) == 1
        rows, gtype, resolution, ri = res["extra"][0]
        assert rows.tolist() == [0] and gtype == 0x02 and ri == 1

    def test_name_finder(self):
        import pandas as pd

        from mkgmap_ray.style.rules import finder_name

        tags = {
            "name": pd.Series([pd.NA, "N", pd.NA], dtype="string"),
            "place_name": pd.Series(["P", "P", pd.NA], dtype="string"),
        }
        out = finder_name(tags, 3)
        assert out.tolist()[:2] == ["P", "N"]
        assert pd.isna(out[2])


class TestOverlays:
    def test_one_to_n(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from mkgmap_ray.stages.stylestage import apply_overlays

        t = pa.table(
            {
                "fid": pa.array([0, 1, 2], pa.int64()),
                "gtype": pa.array([1, 7, 2], pa.int32()),
            }
        )
        out = apply_overlays(
            rd.from_arrow(t), {1: (0x10, 0x11, 0x12), 2: (0x20,)}
        ).to_pandas().sort_values(["fid", "gtype"])
        assert out[out["fid"] == 0]["gtype"].tolist() == [0x10, 0x11, 0x12]
        assert out[out["fid"] == 1]["gtype"].tolist() == [7]
        assert out[out["fid"] == 2]["gtype"].tolist() == [0x20]


class TestIngestNormalization:
    def test_tag_value_normalize(self):
        import pyarrow as pa

        from mkgmap_ray.sources.osmxml import normalize_tag_values

        t = pa.table(
            {"tag_vals": pa.array(
                [["  a   b ", "x\x7fy"], [], ["ok"]],
                pa.list_(pa.string()))}
        )
        out = normalize_tag_values(t)
        assert out["tag_vals"].to_pylist() == [["a b", "xy"], [], ["ok"]]

    def test_reader_dispatch(self):
        import pytest

        from mkgmap_ray.sources import reader_for

        assert reader_for("planet.osm.pbf")[0] == "pbf"
        assert reader_for("x.o5m")[0] == "o5m"
        assert reader_for("uk.osm.gz")[0] == "osm"
        assert reader_for("map.mp")[0] == "polish"
        with pytest.raises(ValueError):
            reader_for("something.img")


class TestMakeCycleWay:
    def test_one_to_two(self):
        import pandas as pd

        from mkgmap_ray.stages.stylestage import make_cycle_ways

        df = pd.DataFrame(
            {
                "wid": pd.Series(["1", "2"], dtype="string"),
                "mkgmap:make-cycle-way": pd.Series(
                    ["yes", None], dtype="string"
                ),
                "oneway": pd.Series(["yes", "yes"], dtype="string"),
                "foot": pd.Series(["yes", None], dtype="string"),
            }
        )
        out = make_cycle_ways(df)
        assert len(out) == 3
        o = out[out["wid"] == "1"]
        orig = o[o["mkgmap:synthesised"].isna()].iloc[0]
        cyc = o[o["mkgmap:synthesised"] == "yes"].iloc[0]
        assert orig["bicycle"] == "no"
        assert cyc["access"] == "no" and cyc["bicycle"] == "yes"
        assert cyc["oneway"] == "no" and pd.isna(cyc["foot"])


class TestAreaOrder:
    def test_decreasing_area(self):
        import numpy as np

        from mkgmap_ray.geom.polyfilters import order_by_decreasing_area

        def square(s):
            return (np.asarray([0, 0, s, s]), np.asarray([0, s, s, 0]))

        order = order_by_decreasing_area(
            [square(2), square(10), square(5)]
        )
        assert order.tolist() == [1, 2, 0]


class TestApplyAction:
    """Style `apply` / `apply_once` (SubAction.java:46-71) + the
    relation→member patch pipeline (stages/relstyle.py)."""

    STYLE = (
        "type=route & route=bicycle "
        "{ apply role=outer { set ncn=yes; add rref='$(ref)' } }\n"
        "type=route { apply_once "
        "{ add seen=yes; set marker='m_${highway}' } }\n"
    )

    def test_compile(self):
        from mkgmap_ray.style.rules import compile_style

        rs = compile_style(self.STYLE)
        progs = rs.apply_programs()
        assert len(progs) == 2
        a0, a1 = progs
        assert a0.role == "outer" and not a0.once
        assert a1.role is None and a1.once
        assert a0.rel_refs == ("ref",)
        # $(ref) rewritten to the member-side shipped column
        assert any("${__rel__ref}" in s.value for s in a0.sub)
        kinds = [s.kind for s in a0.sub]
        assert kinds == ["set", "add"]
        # used_tags covers predicate, sub keys, ${} and $() refs
        used = rs.used_tags()
        assert {"type", "route", "ncn", "rref", "ref",
                "seen", "marker", "highway"} <= used

    def test_nested_apply_rejected(self):
        import pytest as _pytest

        from mkgmap_ray.style.rules import compile_style

        with _pytest.raises(ValueError):
            compile_style(
                "type=route { apply { apply { set a=b } } }"
            )

    def test_apply_records(self):
        import pandas as pd

        from mkgmap_ray.style.rules import compile_style

        rs = compile_style(self.STYLE)
        tags = {
            "type": pd.Series(["route", "route", "x"], dtype="string"),
            "route": pd.Series(["bicycle", "bus", None], dtype="string"),
            "ref": pd.Series(["R1", "R2", None], dtype="string"),
        }
        res = rs.apply(tags, 3)
        applies = res["applies"]
        assert [p[0] for p in applies] == [0, 1]
        assert applies[0][2].tolist() == [0]  # only the bicycle row
        assert applies[1][2].tolist() == [0, 1]
        assert applies[0][3]["ref"].tolist() == ["R1"]

    def test_end_to_end_patches(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from mkgmap_ray.sources.osmxml import MEMBER_NODE, MEMBER_WAY
        from mkgmap_ray.stages.relstyle import (
            apply_patches,
            relation_patches,
        )
        from mkgmap_ray.style.rules import compile_style

        rs = compile_style(self.STYLE)
        # relation 1: bicycle route, member ways 10 (outer, twice!) + 11
        # (inner) + node 5; relation 2: bus route, way 11 (outer)
        rels = pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "member_types": pa.array(
                    [[MEMBER_WAY, MEMBER_WAY, MEMBER_WAY, MEMBER_NODE],
                     [MEMBER_WAY]],
                    pa.list_(pa.int64()),
                ),
                "member_refs": pa.array(
                    [[10, 10, 11, 5], [11]], pa.list_(pa.int64())
                ),
                "member_roles": pa.array(
                    [["outer", "outer", "inner", "via"], ["outer"]],
                    pa.list_(pa.string()),
                ),
                "tag_keys": pa.array(
                    [["type", "route", "ref"], ["type", "route", "ref"]],
                    pa.list_(pa.string()),
                ),
                "tag_vals": pa.array(
                    [["route", "bicycle", "R1"], ["route", "bus", "R2"]],
                    pa.list_(pa.string()),
                ),
            }
        )
        pat = relation_patches(rels, rs)
        # rel 1 prog 0: outer ways 10, 10 (no once); prog 1 apply_once:
        # ways 10, 11, node 5 (deduped); rel 2 prog 1: way 11
        assert len(pat[(pat["prog"] == 0)]) == 2
        p1 = pat[pat["prog"] == 1]
        assert sorted(p1["mref"].tolist()) == [5, 10, 11, 11]
        # only prog 0 references $(ref); the bus relation fires prog 1
        # alone, so no R2 value ever ships
        assert set(pat["__rel__ref"].dropna()) == {"R1"}

        members = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([10, 11, 12], pa.int64()),
                    "highway": pa.array(
                        ["residential", "path", "track"], pa.string()
                    ),
                }
            )
        )
        out = (
            apply_patches(
                members, rd.from_pandas(pat), rs,
                member_tag_cols=["highway"], member_type=MEMBER_WAY,
            )
            .to_pandas()
            .sort_values("id")
            .set_index("id")
        )
        assert out.loc[10, "ncn"] == "yes"
        assert out.loc[10, "rref"] == "R1"
        assert out.loc[10, "marker"] == "m_residential"
        # way 11: inner in rel 1 (no ncn), outer in rel 2 (bus: rule 1
        # doesn't match) — but apply_once rule touched it from BOTH rels
        assert pd.isna(out.loc[11, "ncn"])
        assert pd.isna(out.loc[11, "rref"])
        assert out.loc[11, "seen"] == "yes"
        assert out.loc[11, "marker"] == "m_path"
        # way 12 is no relation's member
        assert pd.isna(out.loc[12, "seen"])
        np.testing.assert_array_equal(
            sorted(out.index), [10, 11, 12]
        )
