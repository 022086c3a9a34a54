"""TYP text compiler edge cases vs TypTextReader semantics."""

import numpy as np

from mkgmap_ray.stages.typcompile import _decode_int, compile_typ_batch
import pandas as pd


def _compile_one(text, sid=1):
    return compile_typ_batch(np.array([sid]), [text]).to_pandas()


def test_decode_int_hex_and_decimal():
    s = pd.Series(["0x10", "0X2a", "255", "7", "bogus", ""])
    assert list(_decode_int(s)) == [16, 42, 255, 7, -1, -1]


def test_type_split_boundaries():
    # < 0x100 => type only; >= 0x100 => high byte type, low byte subtype
    df = _compile_one("[_line]\nType=0xff\n[end]")
    assert (df.typ[0], df.subtyp[0]) == (0xFF, 0)
    df = _compile_one("[_line]\nType=0x100\n[end]")
    assert (df.typ[0], df.subtyp[0]) == (1, 0)
    df = _compile_one("[_line]\nType=291\n[end]")  # 0x123 decimal
    assert (df.typ[0], df.subtyp[0]) == (1, 0x23)
    # explicit SubType overrides
    df = _compile_one("[_point]\nType=0x12\nSubType=0x05\n[end]")
    assert (df.typ[0], df.subtyp[0]) == (0x12, 5)


def test_multiple_elements_and_unknown_section():
    text = (
        "[_point]\nType=0x11\n[end]\n"
        "[_mystery]\nFoo=bar\n[end]\n"
        "[_polygon]\nType=0x22\n[end]"
    )
    df = _compile_one(text)
    assert list(df.kind) == ["point", "polygon"]
    assert list(df.typ) == [0x11, 0x22]


def test_label_lang_fallback():
    # Integer.decode failure => lang 0, text is the whole value
    df = _compile_one("[_point]\nType=0x1\nString=NoComma\n[end]")
    assert df.label_lang[0] == 0
    assert df.label[0] == "NoComma"
    df = _compile_one("[_point]\nType=0x1\nString1=0x03,Hi\n[end]")
    assert df.label_lang[0] == 3
    assert df.label[0] == "Hi"


def test_fontstyle_decode():
    for name, want in [
        ("NoLabel", 1), ("Small", 2), ("NormalFont", 3),
        ("large", 4), ("Default", 0), ("Weird", 0),
    ]:
        df = _compile_one(f"[_point]\nType=0x1\nFontStyle={name}\n[end]")
        assert df.fontstyle[0] == want, name


def test_xpm_space_tag_and_transparency():
    text = (
        '[_polygon]\nType=0x2\nXpm="0 0 2 0"\n'
        '"* c #990099"\n"     c   #889988"\n[end]'
    )
    df = _compile_one(text)
    assert df.xpm_ncolors[0] == 2
    assert df.xpm_transparent[0] == 0
    assert df.xpm_color0[0] == 0x990099
    text = (
        '[_polygon]\nType=0x2\nXpm="4 4 2 1"\n'
        '"! c None"\n"* c #010203"\n'
        '"!!**"\n"****"\n"!!!!"\n"**!!"\n[end]'
    )
    df = _compile_one(text)
    assert df.xpm_w[0] == 4 and df.xpm_h[0] == 4
    assert df.xpm_transparent[0] == 1
    assert df.xpm_color0[0] == -1  # first colour is transparent


def test_draworder_mask():
    df = _compile_one("[_draworder]\nType=0x10112,2\n[end]")
    assert df.kind[0] == "draworder"
    assert df.typ[0] == (0x10112 >> 8) & 0x3FFF
    assert df.subtyp[0] == 0x12
    assert df.order_level[0] == 2


def test_many_sources_batch():
    texts = [
        f"[_point]\nType={16 + i}\nString=0x4,P{i}\n[end]" for i in range(50)
    ]
    df = compile_typ_batch(np.arange(50), texts).to_pandas()
    assert len(df) == 50
    assert list(df.typ) == list(range(16, 66))
    assert list(df.label) == [f"P{i}" for i in range(50)]
