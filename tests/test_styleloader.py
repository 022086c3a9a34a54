"""Style directory loader: includes (same-dir, from-sibling, cycles),
if/else/end expansion, <finalize> split, continuation joining, options."""

import pytest

from mkgmap_ray.style.loader import (
    StyleDirLoader,
    expand_if_blocks,
    join_continuations,
    load_style,
    parse_levels,
    parse_options,
    resolve_includes,
    split_finalize,
)
from mkgmap_ray.style.rules import compile_style


def write_style(tmp_path, name, files):
    root = tmp_path / name
    for rel, content in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    return root


class TestIncludes:
    def test_nested_and_from(self, tmp_path):
        write_style(tmp_path, "other", {"version": "1", "x": "b=2 [0x2]\n"})
        root = write_style(
            tmp_path,
            "main",
            {
                "version": "1",
                "lines": "a=1 [0x1]\ninclude 'inc/one';\n"
                         "include 'x' from 'other';\n",
                "inc/one": "include 'inc/two';\nc=3 [0x3]\n",
                "inc/two": "d=4 [0x4]\n",
            },
        )
        text = resolve_includes((root / "lines").read_text(),
                                StyleDirLoader(root))
        got = [ln for ln in text.splitlines() if ln.strip()]
        assert got == ["a=1 [0x1]", "d=4 [0x4]", "c=3 [0x3]", "b=2 [0x2]"]

    def test_include_as_tag_key_is_not_a_directive(self, tmp_path):
        root = write_style(tmp_path, "s", {"version": "1"})
        text = "include=yes [0x2]\ninclude = no [0x3]\n"
        assert resolve_includes(text, StyleDirLoader(root)) == text.rstrip(
            "\n"
        )

    def test_cycle_raises(self, tmp_path):
        root = write_style(
            tmp_path, "s",
            {"version": "1", "a": "include 'b';\n", "b": "include 'a';\n"},
        )
        with pytest.raises(ValueError, match="cycle"):
            resolve_includes("include 'a';", StyleDirLoader(root))

    def test_missing_file_raises(self, tmp_path):
        root = write_style(tmp_path, "s", {"version": "1"})
        with pytest.raises(FileNotFoundError):
            resolve_includes("include 'nope';", StyleDirLoader(root))


class TestIfBlocks:
    def test_simple_if_else(self):
        text = (
            "if (a=1) then\n"
            "b=2 [0x2]\n"
            "else\n"
            "b=2 [0x3]\n"
            "end\n"
        )
        out = [ln for ln in expand_if_blocks(text).splitlines() if ln]
        assert out[0] == "(a=1) {set mkgmap:if:1=true}"
        assert out[1] == "mkgmap:if:1=true & b=2 [0x2]"
        assert out[2] == "mkgmap:if:1!=true & b=2 [0x3]"
        # result must still compile
        compile_style("\n".join(out))

    def test_nested(self):
        text = (
            "if (a=1) then\n"
            "if (b=2) then\n"
            "c=3 [0x3]\n"
            "end\n"
            "end\n"
        )
        out = [ln for ln in expand_if_blocks(text).splitlines() if ln]
        # inner synthetic rule is guarded by the outer frame
        assert out[1] == "mkgmap:if:1=true & (b=2) {set mkgmap:if:2=true}"
        assert out[2] == "mkgmap:if:1=true & mkgmap:if:2=true & c=3 [0x3]"

    def test_unterminated_raises(self):
        with pytest.raises(ValueError, match="unterminated"):
            expand_if_blocks("if (a=1) then\nb=2 [0x2]\n")


class TestTextPasses:
    def test_finalize_split(self):
        main, fin = split_finalize("a=1 [0x1]\n<finalize>\nb=2 [0x2]\n")
        assert "a=1" in main and "a=1" not in fin
        assert "b=2" in fin and "b=2" not in main

    def test_join_continuations(self):
        text = "a=1\n{set x=1;\nset y=2}\n[0x1 resolution 20]\nb=2 [0x2]\n"
        out = [ln for ln in join_continuations(text).splitlines() if ln]
        assert out[0] == "a=1 {set x=1; set y=2} [0x1 resolution 20]"
        assert out[1] == "b=2 [0x2]"
        compile_style("\n".join(out))

    def test_options_and_levels(self):
        opts = parse_options(
            "# c\nlevels = 0:24, 1:22\nname = 'x y'\nbad line\n"
        )
        assert opts == {"levels": "0:24, 1:22", "name": "x y"}
        assert parse_levels(opts["levels"]) == [(0, 24), (1, 22)]


class TestLoadStyle:
    def test_full_style(self, tmp_path):
        write_style(tmp_path, "base", {"version": "1", "extra": "z=9 [0x9]\n"})
        root = write_style(
            tmp_path,
            "main",
            {
                "version": "2\n",
                "options": "levels = 0:24\n",
                "info": "summary = 'test'\n",
                "lines": (
                    "a=1 [0x1]\n"
                    "include 'extra' from 'base';\n"
                    "if (k=1) then\nb=2 [0x2]\nend\n"
                    "<finalize>\nc=3 [0x3]\n"
                ),
                "points": "p=1 [0x10]\n",
            },
        )
        sd = load_style(root)
        assert sd.version == 2
        assert sd.levels == [(0, 24)]
        assert sd.info["summary"] == "test"
        assert "z=9" in sd.rule_text["lines"]
        assert "mkgmap:if:1=true & b=2" in sd.rule_text["lines"]
        assert "c=3" in sd.finalize_text["lines"]
        assert "c=3" not in sd.rule_text["lines"]
        assert len(sd.rules("points").rules) == 1
        assert len(sd.finalize_rules("lines").rules) == 1

    def test_used_tags(self, tmp_path):
        root = write_style(
            tmp_path,
            "s",
            {
                "version": "1",
                "options": "extra-used-tags = foo, bar\n",
                "lines": "if (k=1) then\na=1 {set b='${c}'} [0x1]\nend\n",
            },
        )
        sd = load_style(root)
        assert sd.used_tags() == {"k", "a", "b", "c", "foo", "bar"}

    def test_no_version_raises(self, tmp_path):
        root = write_style(tmp_path, "s", {"lines": "a=1 [0x1]\n"})
        with pytest.raises(FileNotFoundError, match="version"):
            load_style(root)


class TestStyleTester:
    def test_single_file_golden(self, tmp_path):
        from mkgmap_ray.style.tester import check_style_test

        text = """\
WAY 42
highway=primary
name=Main Street

WAY 7
power=line

WAY 9
landuse=forest

<<<lines>>>
highway=primary {name '${name}'} [0x3 road_class=2 road_speed=2]
power=line [0x29 resolution 20]

<<<results>>>
WAY 42: Road 0x3, labels=[Main Street, null, null, null], res=24-24 (1/1),(2/2), road class=2 speed=2
WAY 7: Line 0x29, labels=[null, null, null, null], res=20-24 (1/1),(2/2),
"""
        actual, diffs = check_style_test(text)
        assert not diffs, diffs
        assert len(actual) == 2  # way 9 matches nothing

    def test_continue_emits_extra_elements(self):
        from mkgmap_ray.style.tester import run_style_test

        text = """\
WAY 5
highway=footpath

<<<lines>>>
highway=footpath [0x16 resolution 22 continue]
highway=* [0x17 resolution 20-23]
"""
        out = run_style_test(text)
        assert out == [
            "WAY 5: Line 0x16, labels=[null, null, null, null],"
            " res=22-24 (1/1),(2/2),",
            "WAY 5: Line 0x17, labels=[null, null, null, null],"
            " res=20-23 (1/1),(2/2),",
        ], out

    def test_mismatch_reports_diff(self):
        from mkgmap_ray.style.tester import check_style_test

        text = """\
WAY 1
highway=primary

<<<lines>>>
highway=primary [0x3]

<<<results>>>
WAY 1: Line 0x4, labels=[null, null, null, null], res=24-24 (1/1),(2/2),
"""
        _, diffs = check_style_test(text)
        assert diffs


class TestZipAndCombined:
    def _zip_styles(self, tmp_path):
        import zipfile

        zp = tmp_path / "styles.zip"
        with zipfile.ZipFile(zp, "w") as zf:
            zf.writestr("styles/main/version", "1\n")
            zf.writestr("styles/main/options", "levels = 0:24, 1:22\n")
            zf.writestr(
                "styles/main/lines",
                "a=1 [0x1]\ninclude 'x' from 'other';\n",
            )
            zf.writestr("styles/other/version", "1\n")
            zf.writestr("styles/other/x", "b=2 [0x2]\n")
        return zp

    def test_zip_loader_open_and_sibling_include(self, tmp_path):
        from mkgmap_ray.style.loader import StyleZipLoader

        zp = self._zip_styles(tmp_path)
        ld = StyleZipLoader(zp, "main")
        assert ld.open("version").strip() == "1"
        assert sorted(ld.list()) == ["main", "other"]
        sib = ld.sibling("other")
        assert sib.open("x").strip() == "b=2 [0x2]"

    def test_load_style_from_zip_resolves_cross_style_include(
        self, tmp_path
    ):
        zp = self._zip_styles(tmp_path)
        sd = load_style(zp, "main")
        lines = [
            ln for ln in sd.rule_text["lines"].splitlines() if ln.strip()
        ]
        assert lines == ["a=1 [0x1]", "b=2 [0x2]"]
        assert sd.levels == [(0, 24), (1, 22)]

    def test_combined_style_file(self, tmp_path):
        p = tmp_path / "solo.style"
        p.write_text(
            "<<<version>>>\n1\n"
            "<<<lines>>>\na=1 [0x1]\nc=3 [0x3]\n"
            "<<<points>>>\nd=4 [0x4]\n"
        )
        sd = load_style(p)
        assert "a=1 [0x1]" in sd.rule_text["lines"]
        assert "d=4 [0x4]" in sd.rule_text["points"]

    def test_dispatch(self, tmp_path):
        from mkgmap_ray.style.loader import (
            CombinedStyleLoader,
            StyleDirLoader,
            StyleZipLoader,
            create_style_loader,
        )

        d = write_style(tmp_path, "plain", {"version": "1"})
        assert isinstance(create_style_loader(d), StyleDirLoader)
        zp = self._zip_styles(tmp_path)
        assert isinstance(create_style_loader(zp, "main"), StyleZipLoader)
        p = tmp_path / "one.style"
        p.write_text("<<<version>>>\n1\n")
        assert isinstance(create_style_loader(p), CombinedStyleLoader)
        with pytest.raises(FileNotFoundError, match="no sub styles"):
            create_style_loader(p, "sub")
        with pytest.raises(FileNotFoundError):
            create_style_loader(tmp_path / "missing")
