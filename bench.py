#!/usr/bin/env python
"""Benchmark harness for the mkgmap_ray engine.

Default: run the headline pipeline (tile assignment + clip + spatial joins,
the engine's analogue of mkgmap's per-tile compile) plus the query catalogue
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32), and
print ONE JSON line::

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "features": N, "features_per_sec": N}

``--scaling``: run the headline pipeline twice in FRESH processes at two
CPU counts (default 2 vs 8 — the N-vs-4N pair where per-process memory
bandwidth stays constant on this shared-bus box; see BASELINE.md) on a
repeat-replicated input and report both throughputs plus scaling
efficiency (the BASELINE.json north-rule two-cluster-size criterion).
Takes ~35 minutes at the defaults (repeat=96; the headline now
includes the partitioned tile write + lineage markers).

This script OWNS its Ray session (unlike __ray_entry__ / the library).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

METRIC = "tile-assignment + spatial-join throughput (features/sec)"

# queries worth timing individually (each <~10 s at sf0.1); the headline
# pipeline is timed separately and is the scaling-run workload.
QUERY_NAMES = [
    "cell_assign_grid",
    "clip_segments",
    "pip_regions",
    "knn_join",
    "raster_sample",
    "simplify_dp",
    "level_refine",
    "q1_pricing",
    "q3_top_orders",
    "q5_nation_revenue",
    "events_window",
    "top_users",
    "doc_stats",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram",
    "dedup_embed",
    "token_bpe",
    "image_phash_dedup",
    "style_file",
    "minhash_sig",
    "simhash_sig",
    "ann_topk_dot",
    "images_tiles",
    "way_assembly",
    "overview_grid",
    "sorted_top100",
    "collate_sort",
    "split_lines",
    "style_apply",
    "merge_chains",
    "ring_assembly",
    "osm_roundtrip",
    "osm_way_tags",
    "osm_relation_resolve",
    "osm_tags_style",
    "pbf_roundtrip",
    "o5m_roundtrip",
    "node_degree",
    "driving_side",
    "road_merge",
    "mp_roundtrip",
    "multipolygon",
    "shape_merge",
    "hole_cut",
    "coastline_assembly",
    "size_filters",
    "routing_graph",
    "locator_normalize",
    "wrong_angle",
    "label_encode8",
    "poi_generate",
    "label_encode",
    "hgt_roundtrip",
    "sea_lookup",
    "restriction_merge",
    "ann_ivf",
    "house_intervals",
    "relation_apply",
    "house_numbers",
    "hook_chain",
    "mdr_index",
    "sea_background",
    "mp_sections",
    "value_filters",
    "poly_bool",
    "border_nodes",
    "rgn_bitstream",
    "subdiv_tre",
    "dem_layout",
    "dem_tiles",
    "dem_section",
    "typ_compile",
    "gmapsupp_fat",
    "bnd_roundtrip",
    "mdr5_cities",
    "mdr10_pois",
    "installer_ids",
    "dem_streams",
    "image_transform",
    "phash_cluster",
    "mdr9_groups",
    "mdr1_reverse",
    "mdr4_types",
    "mdr6_zips",
    "mdr12_prefix",
    "mdr26_sort",
    "overlay_expand",
    "cycleway_synth",
    "name_finder",
    "prefix_suffix",
    "round_obsolete",
    "estimated_sizes",
    "house_repair",
    "sea_gaps",
    "label_multibyte",
    "mdr13_regions",
    "mdr29_countries",
    "mdr2x_streets",
    "mdr25_cities",
    "mdr15_strings",
    "mdr17_prefix",
    "mdr19_types",
    "predict_points",
    "tile_refine",
    "ann_cosine_pairs",
    "overview_features",
    "mp_routing",
    "cell_quadkey",
    "cell_salted_agg",
    "doc_quality",
    "dedup_keeplist",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _warm_fn(batch):
    # pre-import the heavy modules in every worker so first-task import
    # cost isn't attributed to the pipeline
    import pandas  # noqa: F401

    import mkgmap_ray.pipelines.queries  # noqa: F401
    import mkgmap_ray.stages.clipstage  # noqa: F401

    return batch


def _warmup(num_cpus: int) -> None:
    """Force Ray worker-pool spin-up + library imports before the timed
    section so startup isn't attributed to the pipeline."""
    import ray.data as rd

    rd.range(num_cpus * 8, override_num_blocks=num_cpus * 2).map_batches(
        _warm_fn
    ).count()


def run_headline(sf_dir: str, repeat: int = 1, num_cpus: int = 32) -> dict:
    """Headline: derived features → MapSplitter refinement → tile assignment
    → per-cell Sutherland-Hodgman/Liang-Barsky clip → per-tile summary, plus
    the PIP boundary join over event points. Returns features processed and
    wall seconds."""
    import shutil
    import tempfile

    from mkgmap_ray.pipelines.derive import features_dataset
    from mkgmap_ray.pipelines.tiling import build_tiles, write_tiles
    from mkgmap_ray.pipelines import queries as Q

    import pyarrow.parquet as pq

    _warmup(num_cpus)
    out_dir = tempfile.mkdtemp(prefix="bench_tiles_", dir="/tmp")
    phases = os.environ.get("MKGMAP_BENCH_PHASES")
    t0 = time.perf_counter()
    ds = features_dataset(sf_dir, repeat=repeat)
    # derivation is `repeat` features per source row: count from metadata
    n_features = repeat * sum(
        pq.ParquetFile(f"{sf_dir}/{t}.parquet").metadata.num_rows
        for t in ("events", "lineitem", "orders")
    )
    assigned, meta, tree = build_tiles(ds, shift=0, clip=True)
    if phases:
        print(f"[phase] build_tiles {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t_w = time.perf_counter()
    # the benched pipeline IS the writing pipeline: partitioned tile
    # output + manifest, summary derived from the written files
    wstats = write_tiles(
        assigned, meta, tree, out_dir, resume=False, rows_hint=n_features
    )
    if phases:
        print(f"[phase] write_tiles {time.perf_counter()-t_w:.1f}s",
              file=sys.stderr)
    summary = wstats["summary"]
    n_out = (
        sum(summary["n_points"].to_pylist())
        + sum(summary["n_lines"].to_pylist())
        + sum(summary["n_shapes"].to_pylist())
    )
    if phases:
        t_p = time.perf_counter()
    pip = Q.q_pip_regions(sf_dir)
    n_pip = len(pip)
    if phases:
        print(f"[phase] pip {time.perf_counter()-t_p:.1f}s", file=sys.stderr)
    sec = time.perf_counter() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    total = n_features + n_pip
    return {
        "features": int(total),
        "tiles": int(meta.num_rows),
        "assigned_out": int(n_out),
        "pip_matches": int(n_pip),
        "sec": sec,
        "features_per_sec": total / sec if sec > 0 else 0.0,
    }


def run_full(
    sf_dir: str, num_cpus: int, headline_only: bool, repeat: int = 1
) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False,
            logging_level="ERROR",
        )
    # 24 MiB blocks (vs Ray's 128 MiB default): plasma writes of 128 MB
    # objects do NOT scale across workers on this host (304 MB/s
    # aggregate at 4 workers vs 2.5 GB/s with 16 MB objects — the kernel
    # serializes large-object page faults), and >32 MB buffers also fall
    # off glibc's mmap-threshold fast path. Small blocks restore
    # parallel plasma writes; see the round-4 block study in BASELINE.md.
    # MKGMAP_BLOCK_MB="" or "0" both mean "leave Ray's default block size"
    blk_mb = int(os.environ.get("MKGMAP_BLOCK_MB", "24") or 0)
    if blk_mb > 0:
        from ray.data import DataContext

        DataContext.get_current().target_max_block_size = blk_mb * 1024 * 1024
    from mkgmap_ray.pipelines import queries as Q

    head = run_headline(sf_dir, repeat=repeat, num_cpus=num_cpus)
    qtimes: dict[str, float] = {}
    if not headline_only:
        allq = {name: getattr(Q, f"q_{name}") for name in QUERY_NAMES}
        import ray.data

        for name, fn in allq.items():
            t0 = time.perf_counter()
            res = fn(sf_dir)
            if isinstance(res, ray.data.Dataset):  # force lazy execution
                res.count()
            qtimes[name] = round(time.perf_counter() - t0, 3)
    ray.shutdown()
    return {
        "metric": METRIC,
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        "features": head["features"],
        "features_per_sec": round(head["features_per_sec"], 1),
        "tiles": head["tiles"],
    }


def run_scaling(sf_dir: str, lo: int, hi: int, repeat: int) -> dict:
    """Fresh process per parallelism level (clean Ray session each).

    Uses a `repeat`-replicated input so compute dominates fixed overheads
    (the sandbox stand-in for the north rule's N vs 4N node clusters)."""
    results = {}
    for cpus in (lo, hi):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_SF_DIR"] = sf_dir
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only",
             "--repeat", str(repeat)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(
                f"scaling run num_cpus={cpus} produced no JSON: {out.stderr[-2000:]}"
            )
        results[cpus] = json.loads(line[-1])
    fps_lo = results[lo]["features_per_sec"]
    fps_hi = results[hi]["features_per_sec"]
    eff = (fps_hi / fps_lo) / (hi / lo) if fps_lo > 0 else 0.0
    return {
        "metric": f"scaling efficiency {lo}->{hi} cpus",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": _sf_of(sf_dir),
        "num_cpus": hi,
        "queries": {},
        "throughput": {
            f"cpus_{lo}": fps_lo,
            f"cpus_{hi}": fps_hi,
        },
        "seconds": {
            f"cpus_{lo}": results[lo]["value"],
            f"cpus_{hi}": results[hi]["value"],
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--scale-lo", type=int, default=2)
    ap.add_argument("--scale-hi", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--scale-repeat", type=int, default=96)
    args = ap.parse_args()

    if args.scaling:
        out = run_scaling(
            args.sf_dir, args.scale_lo, args.scale_hi, args.scale_repeat
        )
    else:
        out = run_full(
            args.sf_dir, args.cpus, args.headline_only, repeat=args.repeat
        )
    # The driver captures only the tail of stdout; the per-query dict (80+
    # entries) outgrew it in round 3 (BENCH_r03 parsed=null). Full record
    # goes to a file; the FINAL stdout line stays compact and parseable.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    # --headline-only legs (e.g. the scaling protocol's subprocesses) must
    # not clobber the committed full-catalogue record
    if args.scaling or not args.headline_only:
        try:
            with open(full_path, "w") as f:
                json.dump(out, f, indent=1)
        except OSError:
            pass
    compact = dict(out)
    q = compact.get("queries") or {}
    if q:
        compact["queries"] = {}
        compact["n_queries"] = len(q)
        compact["queries_sum_sec"] = round(sum(q.values()), 1)
        compact["queries_slowest"] = max(q, key=q.get)
        compact["queries_file"] = "BENCH_FULL.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
