"""DuckDB oracle generator for the MapSplitter tile refinement.

Mirrors the engine's refinement fixpoint (``splitter.refine`` +
``grid.SplitTree.canonicalize`` — themselves faithful to
``build/MapSplitter.java:42-252`` + ``build/MapArea.pickArea``) as a chain
of UNROLLED SQL levels: split positions are data-independent (always the
``Area.split``-aligned midpoint of the longer axis, ``Area.java:171-224``),
so each unrolled level only has to (a) aggregate per-leaf stats, (b) apply
``decide_split`` (``MapSplitter.addAreasToList`` policy), (c) emit the two
children and reassign member features by the cut. The unroll count is a
static bound on tree depth: a leaf is terminal once ``max_dimension <=
MIN_DIMENSION << shift``, so ``~2*log2(initial_dim / min_dim)`` levels
always reach the fixpoint (extra levels are no-ops).

Node ids reproduce ``SplitTree.canonicalize``'s FIFO-BFS numbering: ids
are assigned level by level, within a level by (parent id, child index) —
children of lower-id parents always precede children of higher-id parents
because nodes are processed in ascending id order.

All arithmetic is int64; the only division is floor division of
non-negative spans plus Java-truncating center division (emitted as a
CASE), so DuckDB reproduces the engine bit-for-bit.
"""

from __future__ import annotations

MAX_DIVISION_SIZE = 0x7FFF
MAX_RGN_SIZE = 0xFFF8
MAX_NUM_LINES = 0xFF
MAX_NUM_POINTS = 0xFF
MIN_DIMENSION = 10
WANTED_MAX_AREA_SIZE = 0x3FFF


def _decide(shift: int) -> str:
    """``decide_split`` (splitter.py:145-167) as a SQL boolean over the
    d_k columns (sp=n_pt, sl=n_ln, se=est, ss=n_split, w, h)."""
    dim_ok = f"greatest(w, h) > {MIN_DIMENSION << shift}"
    must = (
        f"(sl > {MAX_NUM_LINES} OR sp > {MAX_NUM_POINTS}"
        f" OR se > {MAX_RGN_SIZE})"
    )
    want = f"({dim_ok} AND se > {WANTED_MAX_AREA_SIZE})"
    return f"(({must} OR {want}) AND ss > 1 AND {dim_ok})"


def _round_pof2(expr: str, shift: int) -> str:
    """``Area.roundPof2`` — floor to a multiple of ``2**shift`` after
    adding half. DuckDB ``//`` TRUNCATES toward zero on negatives (numpy
    ``>>`` floors), so the floor-multiple is computed with the
    positive-mod identity ``v - ((v % m + m) % m)`` instead."""
    if shift <= 0:
        return expr
    m = 1 << shift
    v = f"(({expr}) + {1 << (shift - 1)})"
    return f"({v} - ((({v}) % {m} + {m}) % {m}))"


FEAT_COLS = ("lat_c", "lon_c", "kind", "n_pt", "n_ln", "est", "n_split")


def _level(k: str, nk: str, shift: int, a_prev: str, nodes_prev: str,
           tot_prev: str, extra_cols: tuple = ()):
    """One unrolled refinement level (tag ``k`` → tag ``nk``): returns
    (sql_ctes, a_nk, nodes_nk, tot_nk) names. Handles cut-alignment
    collapse (split attempt fails → node stays a leaf, ``Area.split``
    returning None)."""
    cut_x = _round_pof2("xmin + (xmax - xmin) // 2", shift)
    cut_y = _round_pof2("ymin + (ymax - ymin) // 2", shift)
    carry = ", ".join(f"a.{c}" for c in (*FEAT_COLS, *extra_cols))
    sql = f"""
        s_{k} AS MATERIALIZED (
          SELECT node_id, sum(n_pt) AS sp, sum(n_ln) AS sl,
                 sum(est) AS se, sum(n_split) AS ss
          FROM {a_prev} GROUP BY node_id),
        d_{k} AS MATERIALIZED (
          SELECT n.node_id, n.ymin, n.xmin, n.ymax, n.xmax,
                 n.xmax - n.xmin AS w, n.ymax - n.ymin AS h,
                 coalesce(s.sp, 0) AS sp, coalesce(s.sl, 0) AS sl,
                 coalesce(s.se, 0) AS se, coalesce(s.ss, 0) AS ss
          FROM {nodes_prev} n LEFT JOIN s_{k} s USING (node_id)),
        sp_{k} AS MATERIALIZED (
          SELECT *, (w > h) AS wide,
                 CASE WHEN w > h THEN {cut_x} ELSE {cut_y} END AS cut
          FROM d_{k}
          WHERE {_decide(shift)}
            AND CASE WHEN w > h
                     THEN ({cut_x}) > xmin AND ({cut_x}) < xmax
                     ELSE ({cut_y}) > ymin AND ({cut_y}) < ymax END),
        ch_{k} AS MATERIALIZED (
          SELECT node_id AS parent, 0 AS ci, ymin, xmin,
                 CASE WHEN wide THEN ymax ELSE cut END AS ymax,
                 CASE WHEN wide THEN cut ELSE xmax END AS xmax
          FROM sp_{k}
          UNION ALL
          SELECT node_id, 1,
                 CASE WHEN wide THEN ymin ELSE cut END,
                 CASE WHEN wide THEN cut ELSE xmin END,
                 ymax, xmax
          FROM sp_{k}),
        chn_{k} AS MATERIALIZED (
          SELECT parent, ci, ymin, xmin, ymax, xmax,
                 (SELECT tot FROM {tot_prev}) - 1
                 + row_number() OVER (ORDER BY parent, ci) AS node_id
          FROM ch_{k}),
        nodes_{nk} AS MATERIALIZED (
          SELECT node_id, ymin, xmin, ymax, xmax FROM d_{k}
          WHERE node_id NOT IN (SELECT node_id FROM sp_{k})
          UNION ALL
          SELECT node_id, ymin, xmin, ymax, xmax FROM chn_{k}),
        tot_{nk} AS MATERIALIZED (
          SELECT tot + (SELECT count(*) FROM ch_{k}) AS tot
          FROM {tot_prev}),
        a_{nk} AS MATERIALIZED (
          SELECT {carry},
                 CASE WHEN s.node_id IS NULL THEN a.node_id
                      WHEN (s.wide AND a.lon_c >= s.cut)
                        OR (NOT s.wide AND a.lat_c >= s.cut)
                      THEN l.node_id + 1
                      ELSE l.node_id END AS node_id
          FROM {a_prev} a
          LEFT JOIN sp_{k} s ON a.node_id = s.node_id
          LEFT JOIN chn_{k} l ON l.parent = s.node_id AND l.ci = 0)"""
    return sql, f"a_{nk}", f"nodes_{nk}", f"tot_{nk}"


def _initial_grid(shift: int) -> str:
    """Root bounds + ``splitMaxSize`` grid (``MapSplitter.java:222-252``)
    + ``pickArea`` arithmetic assignment of features to grid cells.

    Produces CTEs: b (root bbox), g (nx/ny), xb/yb (recursive column/row
    boundaries per ``Area.split`` at ``shift``), nodes_0 (current leaves:
    the grid cells, ids 1..nx*ny x-major, or the root when no grid), tot_0
    (node count so far), a_0 (features with their initial node)."""
    # Area.split boundary recurrence: b0 = min; b_{j+1} = round_pof2(
    # b_j + (max - b_j) // (n - j), shift); b_n = max exactly.
    nxt_x = _round_pof2("xs + (bx1 - xs) // (nx - j)", shift)
    nxt_y = _round_pof2("ys + (by1 - ys) // (ny - j)", shift)
    return f"""
        b AS MATERIALIZED (
          SELECT min(lat_c) AS by0, min(lon_c) AS bx0,
                 max(lat_c) + 1 AS by1, max(lon_c) + 1 AS bx1
          FROM feats),
        g AS MATERIALIZED (
          SELECT by0, bx0, by1, bx1,
            CASE WHEN ((bx1 - bx0) >> {shift}) > {MAX_DIVISION_SIZE}
                 THEN ((bx1 - bx0) >> {shift}) // {MAX_DIVISION_SIZE} + 1
                 ELSE 1 END AS nx,
            CASE WHEN ((by1 - by0) >> {shift}) > {MAX_DIVISION_SIZE}
                 THEN ((by1 - by0) >> {shift}) // {MAX_DIVISION_SIZE} + 1
                 ELSE 1 END AS ny
          FROM b),
        xb AS MATERIALIZED (
          WITH RECURSIVE r(j, xs) AS (
            SELECT 0, bx0 FROM g
            UNION ALL
            SELECT j + 1, {nxt_x} FROM r, g WHERE j < nx
          ) SELECT * FROM r),
        yb AS MATERIALIZED (
          WITH RECURSIVE r(j, ys) AS (
            SELECT 0, by0 FROM g
            UNION ALL
            SELECT j + 1, {nxt_y} FROM r, g WHERE j < ny
          ) SELECT * FROM r),
        cells AS MATERIALIZED (
          SELECT 1 + x0.j * g.ny + y0.j AS node_id,
                 y0.ys AS ymin, x0.xs AS xmin,
                 y1.ys AS ymax, x1.xs AS xmax
          FROM g, xb x0, xb x1, yb y0, yb y1
          WHERE x1.j = x0.j + 1 AND x0.j < g.nx
            AND y1.j = y0.j + 1 AND y0.j < g.ny),
        nodes_0 AS MATERIALIZED (
          SELECT node_id, ymin, xmin, ymax, xmax FROM cells, g
          WHERE g.nx * g.ny > 1
          UNION ALL
          SELECT 0, by0, bx0, by1, bx1 FROM g WHERE nx * ny = 1),
        tot_0 AS MATERIALIZED (
          SELECT CASE WHEN nx * ny > 1 THEN 1 + nx * ny ELSE 1 END AS tot
          FROM g),
        a_0 AS MATERIALIZED (
          SELECT f.*,
            CASE WHEN g.nx * g.ny = 1 THEN 0
                 ELSE 1
                   + least(greatest((f.lon_c - g.bx0)
                           // (SELECT xs FROM xb WHERE j = 1
                               ORDER BY xs LIMIT 1 OFFSET 0)
                           , 0), 0) END AS node_id
          FROM feats f, g)"""


def _initial_grid_assign(extra_cols: tuple = ()) -> str:
    """a_0 with pickArea grid arithmetic: xcell = clip((lon - xbase) //
    dx, 0, nx-1) with dx = FIRST column extent (``MapArea.pickArea``,
    ``MapArea.java:770-800``) — NOT containment: with uneven column
    widths the two can disagree, and the engine follows pickArea."""
    carry = ", ".join(f"f.{c}" for c in (*FEAT_COLS, *extra_cols))
    return f"""
        dxy AS MATERIALIZED (
          SELECT g.nx, g.ny, g.bx0, g.by0,
                 coalesce((SELECT xs FROM xb WHERE j = 1), g.bx1) - g.bx0
                   AS dx,
                 coalesce((SELECT ys FROM yb WHERE j = 1), g.by1) - g.by0
                   AS dy
          FROM g),
        a_0 AS MATERIALIZED (
          SELECT {carry},
            CASE WHEN d.nx * d.ny = 1 THEN 0
                 ELSE 1
                   + least(greatest((f.lon_c - d.bx0) // d.dx, 0),
                           d.nx - 1) * d.ny
                   + least(greatest((f.lat_c - d.by0) // d.dy, 0),
                           d.ny - 1)
            END AS node_id
          FROM feats f, dxy d)"""


def tile_refine_sql(feats_sql: str, shift: int = 0, levels: int = 26,
                    with_meta: bool = True,
                    summary_only: bool = False,
                    extra_cols: tuple = (),
                    final_select: str | None = None) -> str:
    """Full oracle: feats CTE → initial grid → ``levels`` unrolled
    refinement levels → tile meta + per-tile kind counts.

    ``feats_sql`` must select columns (lat_c, lon_c, kind, n_pt, n_ln,
    est, n_split) — map-unit centers plus ``element_stats`` values
    (``MapArea.addSize``, ``MapArea.java:555-613``).

    ``summary_only`` emits only (tile_id, n_points, n_lines, n_shapes)
    for NON-EMPTY tiles — the ``tile_summary`` face (empty leaves keep
    their rank but produce no row)."""
    grid = _initial_grid(shift)
    # drop the placeholder a_0 from _initial_grid, use the assign variant
    grid = (grid[: grid.index("a_0 AS")]
            + _initial_grid_assign(extra_cols).lstrip())

    parts = [f"WITH feats AS ({feats_sql}),", grid.rstrip().rstrip(",")]
    a, nodes, tot = "a_0", "nodes_0", "tot_0"
    for k in range(levels):
        sql, a, nodes, tot = _level(str(k), str(k + 1), shift, a, nodes,
                                    tot, extra_cols)
        parts.append("," + sql)
    if final_select is not None:
        # caller-provided epilogue over the final assignment/leaf tables
        # (placeholders {a} and {nodes})
        final = "\n        , " + final_select.format(a=a, nodes=nodes)
    elif summary_only:
        final = f"""
        , leaves AS MATERIALIZED (
          SELECT row_number() OVER (ORDER BY node_id) - 1 AS tile_id,
                 node_id
          FROM {nodes})
        SELECT l.tile_id,
               CAST(sum(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_points,
               CAST(sum(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_lines,
               CAST(sum(CASE WHEN kind = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shapes
        FROM {a} a JOIN leaves l USING (node_id)
        GROUP BY l.tile_id ORDER BY l.tile_id"""
    elif with_meta:
        final = f"""
        , leaves AS MATERIALIZED (
          SELECT row_number() OVER (ORDER BY node_id) - 1 AS tile_id,
                 node_id AS cell, ymin, xmin, ymax, xmax
          FROM {nodes}),
        counts AS MATERIALIZED (
          SELECT node_id,
                 sum(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS n_points,
                 sum(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS n_lines,
                 sum(CASE WHEN kind = 2 THEN 1 ELSE 0 END) AS n_shapes
          FROM {a} GROUP BY node_id)
        SELECT l.tile_id, l.cell,
               l.ymin AS min_lat, l.xmin AS min_lon,
               l.ymax AS max_lat, l.xmax AS max_lon,
               CAST(coalesce(c.n_points, 0) AS BIGINT) AS n_points,
               CAST(coalesce(c.n_lines, 0) AS BIGINT) AS n_lines,
               CAST(coalesce(c.n_shapes, 0) AS BIGINT) AS n_shapes
        FROM leaves l LEFT JOIN counts c ON l.cell = c.node_id
        ORDER BY l.tile_id"""
    else:
        final = f"""
        SELECT CAST(count(*) AS BIGINT) AS n_tiles,
               CAST(sum(ymin) AS BIGINT) AS sum_min_lat,
               CAST(sum(xmax) AS BIGINT) AS sum_max_lon
        FROM {nodes}"""
    parts.append(final)
    return "\n".join(parts)


def level_refine_sql(feats_sql: str,
                     shifts: tuple[int, ...] = (8, 6, 4, 2, 0),
                     levels_per_phase: tuple[int, ...] = (14, 8, 8, 8, 10),
                     ) -> str:
    """Oracle for the per-zoom continuation (``MapBuilder.makeMapAreas``):
    each phase refines the PREVIOUS phase's leaves at a finer shift
    (``continue_split_tree``); per phase emit (level, shift, n_tiles,
    sum_min_lat, sum_max_lon).

    ``splitMaxSize`` re-gridding at phase start is a no-op for every
    realistic input at these shifts (width >> shift is far below
    MAX_DIVISION_SIZE) and is omitted; the engine's
    ``split_max_size_leaf`` likewise never fires there."""
    parts = [f"WITH feats AS ({feats_sql}),"]
    # phase 0 root: same bounds rule, never grid-split at shift 8
    parts.append(f"""
        b AS MATERIALIZED (
          SELECT min(lat_c) AS by0, min(lon_c) AS bx0,
                 max(lat_c) + 1 AS by1, max(lon_c) + 1 AS bx1
          FROM feats),
        nodes_p0_0 AS MATERIALIZED (
          SELECT 0 AS node_id, by0 AS ymin, bx0 AS xmin,
                 by1 AS ymax, bx1 AS xmax FROM b),
        tot_p0_0 AS MATERIALIZED (SELECT 1 AS tot),
        a_p0_0 AS MATERIALIZED (SELECT f.*, 0 AS node_id FROM feats f)""".rstrip())
    a, nodes, tot = "a_p0_0", "nodes_p0_0", "tot_p0_0"
    summaries = []
    for p, (shift, n_levels) in enumerate(zip(shifts, levels_per_phase)):
        for k in range(n_levels):
            sql, a, nodes, tot = _level(
                f"p{p}_{k}", f"p{p}_{k + 1}", shift, a, nodes, tot)
            parts.append("," + sql)
        summaries.append(
            f"SELECT {len(shifts) - 1 - p} AS level, {shift} AS shift,"
            f" CAST(count(*) AS BIGINT) AS n_tiles,"
            f" CAST(sum(ymin) AS BIGINT) AS sum_min_lat,"
            f" CAST(sum(xmax) AS BIGINT) AS sum_max_lon FROM {nodes}"
        )
        if p + 1 < len(shifts):
            # continue_split_tree: next phase starts from these leaves
            nxt = f"p{p + 1}_0"
            parts.append(f"""
        , nodes_{nxt} AS MATERIALIZED (SELECT * FROM {nodes}),
        tot_{nxt} AS MATERIALIZED (SELECT tot FROM {tot}),
        a_{nxt} AS MATERIALIZED (SELECT * FROM {a})""".rstrip())
            a, nodes, tot = f"a_{nxt}", f"nodes_{nxt}", f"tot_{nxt}"
    parts.append("\n" + "\nUNION ALL\n".join(summaries)
                 + "\nORDER BY level DESC")
    return "\n".join(parts)


# --- image geo-tag oracle face ---------------------------------------------

_U64 = "CAST('18446744073709551616' AS HUGEINT)"
_I63 = "CAST('9223372036854775808' AS HUGEINT)"


def _ux(a: str, b: str) -> str:
    """uint64 XOR emulated over HUGEINT (both operands < 2**64): convert
    to signed two's complement BIGINT, xor, convert back."""
    def s(v):
        return (f"(CASE WHEN ({v}) >= {_I63} THEN CAST(({v}) - {_U64} AS"
                f" BIGINT) ELSE CAST(({v}) AS BIGINT) END)")
    x = f"xor({s(a)}, {s(b)})"
    return (f"(CASE WHEN ({x}) < 0 THEN CAST(({x}) AS HUGEINT) + {_U64}"
            f" ELSE CAST(({x}) AS HUGEINT) END)")


def _mulmod64(a: str, b: str) -> str:
    """(a * b) mod 2**64 without overflowing signed INT128: split ``a``
    into 32-bit halves — a0*b < 2**96 and (a1*(b mod 2**32)) < 2**64 both
    fit in HUGEINT."""
    return (f"((({a}) % 4294967296) * ({b})"
            f" + (((({a}) // 4294967296) * (({b}) % 4294967296))"
            f" % 4294967296) * 4294967296) % {_U64}")


def images_geo_sql(n: int, bbox=(0.0, 0.0, 1.4, 1.4)) -> str:
    """CTE-chain SQL producing (lat_c, lon_c, kind, n_pt, n_ln, est,
    n_split) for the deterministic images table: the splitmix64 hash of
    ``sources.images._hash01`` replayed in HUGEINT (wrap-around multiply =
    ``% 2**64``; uint64 xor via two's-complement BIGINT), then the exact
    float64 chain of ``geo_tags_rows`` (80% uniform / 20% hotspot rows)
    and ``deg_to_mu``'s round-half-away. Every float operation is emitted
    in the same association order numpy evaluates, so DuckDB's IEEE
    doubles reproduce the engine bit-for-bit."""
    from ..geom.coords import MAP_UNIT_BITS
    from ..sources.images import HOTSPOTS

    min_lat, min_lon, max_lat, max_lon = bbox
    span_lat, span_lon = max_lat - min_lat, max_lon - min_lon
    mu_per_deg = repr((1 << MAP_UNIT_BITS) / 360.0)

    # splitmix64 stages (sources/images.py:_hash01)
    st0 = _mulmod64("(r + salt)", "CAST('11400714819323198485' AS HUGEINT)")
    st1 = _ux("x0", "x0 // 1073741824")            # ^= x >> 30
    st2 = _mulmod64("x1", "CAST('13787848793156543929' AS HUGEINT)")
    st3 = _ux("x2", "x2 // 134217728")             # ^= x >> 27
    st4 = _mulmod64("x3", "CAST('10723151780598845931' AS HUGEINT)")
    st5 = _ux("x4", "x4 // 2147483648")            # ^= x >> 31
    h = "CAST(x5 // 2048 AS DOUBLE) / 9007199254740992.0"

    fy = " ".join(
        f"WHEN {k} THEN {repr(f[0])}" for k, f in enumerate(HOTSPOTS)
    )
    fx = " ".join(
        f"WHEN {k} THEN {repr(f[1])}" for k, f in enumerate(HOTSPOTS)
    )

    def mu(deg):
        return f"CAST(trunc(({deg}) * {mu_per_deg} + 0.5) AS BIGINT)"

    # numpy association order (geo_tags_rows):
    #   uniform: min + (h * span)
    #   hotspot: (min + (f * span)) + ((g * span) / 50) with g = h+h-1
    lat_u = f"({repr(min_lat)} + (h1 * {repr(span_lat)}))"
    lon_u = f"({repr(min_lon)} + (h2 * {repr(span_lon)}))"
    g1 = "((h3k + h6k) - 1.0)"
    g2 = "((h9k + h12k) - 1.0)"
    lat_h = (f"least(greatest(({repr(min_lat)} + (fy * {repr(span_lat)}))"
             f" + (({g1} * {repr(span_lat)}) / 50.0), {repr(min_lat)}),"
             f" {repr(max_lat)})")
    lon_h = (f"least(greatest(({repr(min_lon)} + (fx * {repr(span_lon)}))"
             f" + (({g2} * {repr(span_lon)}) / 50.0), {repr(min_lon)}),"
             f" {repr(max_lon)})")

    return f"""
      WITH rs AS MATERIALIZED (
        SELECT CAST(t.r AS HUGEINT) AS r, CAST(t.r AS BIGINT) AS row_id,
               CAST(s.salt AS HUGEINT) AS salt,
               CAST(s.salt AS BIGINT) AS salt_id
        FROM range(0, {n}) t(r),
             (SELECT unnest(range(1, 15)) AS salt) s),
      hx0 AS MATERIALIZED (SELECT *, {st0} AS x0 FROM rs),
      hx1 AS MATERIALIZED (SELECT *, {st1} AS x1 FROM hx0),
      hx2 AS MATERIALIZED (SELECT *, {st2} AS x2 FROM hx1),
      hx3 AS MATERIALIZED (SELECT *, {st3} AS x3 FROM hx2),
      hx4 AS MATERIALIZED (SELECT *, {st4} AS x4 FROM hx3),
      hx5 AS MATERIALIZED (SELECT *, {st5} AS x5 FROM hx4),
      hv AS MATERIALIZED (SELECT row_id, salt_id, {h} AS h FROM hx5),
      piv AS MATERIALIZED (
        SELECT row_id, row_id % 3 AS k,
          CASE row_id % 3 {fy} END AS fy,
          CASE row_id % 3 {fx} END AS fx,
          max(CASE WHEN salt_id = 1 THEN h END) AS h1,
          max(CASE WHEN salt_id = 2 THEN h END) AS h2,
          max(CASE WHEN salt_id = 3 + row_id % 3 THEN h END) AS h3k,
          max(CASE WHEN salt_id = 6 + row_id % 3 THEN h END) AS h6k,
          max(CASE WHEN salt_id = 9 + row_id % 3 THEN h END) AS h9k,
          max(CASE WHEN salt_id = 12 + row_id % 3 THEN h END) AS h12k
        FROM hv GROUP BY row_id),
      deg AS MATERIALIZED (
        SELECT row_id,
          CASE WHEN row_id % 5 = 0 THEN {lat_h}
          ELSE {lat_u} END AS lat_deg,
          CASE WHEN row_id % 5 = 0 THEN {lon_h}
          ELSE {lon_u} END AS lon_deg
        FROM piv)
      SELECT {mu("lat_deg")} AS lat_c, {mu("lon_deg")} AS lon_c,
             0 AS kind, 1 AS n_pt, 0 AS n_ln, 9 AS est, 1 AS n_split
      FROM deg"""
