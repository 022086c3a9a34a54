"""Way assembly join + line splitter sizing (stages/assemble.py)."""

import numpy as np
import pyarrow as pa

from mkgmap_ray.stages.assemble import (
    NodeJoin,
    make_node_index,
    split_counts_np,
    split_counts_oracle,
)


def test_split_counts_matches_range_splitter():
    ns = np.arange(1, 5000)
    parts, out = split_counts_np(ns)
    for i in range(0, len(ns), 37):
        ep, eo = split_counts_oracle(int(ns[i]))
        assert parts[i] == ep and out[i] == eo, ns[i]
    # boundary cases exactly
    for n in (1, 2, 249, 250, 251, 374, 375, 376, 499, 500, 624, 625):
        ep, eo = split_counts_oracle(n)
        p, o = split_counts_np(np.asarray([n]))
        assert (p[0], o[0]) == (ep, eo), n


class _FakeRef:
    pass


def test_node_join_probe(monkeypatch, ray_session):
    import ray

    ids = np.asarray([5, 1, 9, 3], np.int64)
    lat = ids * 10
    lon = ids * 100
    ref = ray.put(make_node_index(ids, lat, lon))
    join = NodeJoin(ref)
    batch = pa.table(
        {
            "way_id": pa.array([7, 7, 8, 8], pa.int64()),
            "node_id": pa.array([3, 4, 9, 11], pa.int64()),
        }
    )
    out = join(batch)
    assert out["resolved"].to_pylist() == [1, 0, 1, 0]
    assert out["lat"].to_pylist() == [30, 0, 90, 0]
    assert out["lon"].to_pylist() == [300, 0, 900, 0]


def test_way_assembly_small(ray_session):
    from mkgmap_ray.pipelines.queries import q_way_assembly

    out = q_way_assembly("/root/testdata/sf0.001")
    assert (out["n_refs"] >= out["n_resolved"]).all()
    assert len(out) > 0
    # brute-force check on one way
    import pyarrow.parquet as pq

    li = pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
    ).to_pandas()
    ev = set(
        pq.read_table(
            "/root/testdata/sf0.001/events.parquet", columns=["event_id"]
        )["event_id"].to_pylist()
    )
    wid = int(out["way_id"].iloc[0])
    refs = li[li["l_orderkey"] == wid]["l_partkey"]
    assert int(out[out["way_id"] == wid]["n_refs"].iloc[0]) == len(refs)
    assert int(out[out["way_id"] == wid]["n_resolved"].iloc[0]) == int(
        refs.isin(ev).sum()
    )
