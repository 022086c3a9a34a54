"""CLI option surface (doc/options.txt + CommandArgsReader semantics)."""

import os


def test_order_contract_and_aliases(tmp_path):
    from mkgmap_ray.options import parse_args

    args = parse_args([
        "--mapname=12345678", "a.osm", "--latin1",
        "--drive-on-left", "b.osm",
    ])
    assert [p for p, _ in args.inputs] == ["a.osm", "b.osm"]
    snap_a = args.inputs[0][1]
    snap_b = args.inputs[1][1]
    # options apply only to inputs that FOLLOW them
    assert snap_a["code-page"] == "0"
    assert snap_b["code-page"] == "1252"
    assert snap_b["drive-on"] == "left"
    assert snap_a["mapname"] == "12345678"


def test_config_file_and_recursion(tmp_path):
    from mkgmap_ray.options import parse_args

    inner = tmp_path / "inner.cfg"
    inner.write_text("code-page=932\n")
    cfg = tmp_path / "main.cfg"
    cfg.write_text(
        "# comment\n"
        "mapname: 99990001\n"
        "route\n"
        f"read-config={inner.name}\n"
        "input-file=c.osm\n"
    )
    args = parse_args(["-c", str(cfg)])
    assert args.get("mapname") == "99990001"
    assert args.get("route") == "1"
    assert args.get("code-page") == "932"
    assert [p for p, _ in args.inputs] == ["c.osm"]


def test_generate_sea_suboptions():
    from mkgmap_ray.options import parse_generate_sea

    d = parse_generate_sea(
        "multipolygon,close-gaps=500,floodblocker,land-tag=natural=background"
    )
    assert d["mode"] == "multipolygon"
    assert d["close_gaps"] == 500
    assert d["floodblocker"] is True
    assert d["land_tag"] == ("natural", "background")
    assert parse_generate_sea("1")["mode"] == "polygons"


def test_engine_config_mapping():
    from mkgmap_ray.options import parse_args, to_engine_config

    args = parse_args([
        "--code-page=932", "--levels=0:24, 1:20", "--max-jobs=4",
        "--generate-sea=close-gaps=10", "--x-experimental=7", "in.osm",
    ])
    cfg = to_engine_config(args)
    assert cfg["label_format"] == 9 and cfg["code_page"] == 932
    assert cfg["levels"] == [(0, 24), (1, 20)]
    assert cfg["max_jobs"] == 4
    assert cfg["generate_sea"]["close_gaps"] == 10
    assert cfg["x_options"] == {"x-experimental": "7"}
    b = cfg["label_encoder"]("Kア")
    assert b == b"K" + "ア".encode("cp932") + b"\x00"
