"""Named pipelines backing ``__ray_entry__.queries()``.

Every function takes ``sf_dir`` and returns a Dataset / Arrow table.
The spatial family derives point/rect geometry from ``doc_id`` with
EXACT integer arithmetic (int64 mul/mod, +0.5 offsets) so the DuckDB
oracle in ``__ray_entry__.oracle_sql()`` computes bit-identical doubles
— areas and lengths stay dyadic rationals end-to-end (see
synth/districts.py docstring for why no float rounding ever occurs).

Ray-Data discipline: read only needed columns, derive in map_batches
(zero-copy Arrow), broadcast the 64-district table, shuffle only for
the final grouped aggregates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .ops.assign import assign
from .ops.intersections import intersections
from .ops.prorate import normalize, prorate
from .synth.districts import EXTENT, bsp_rects, district_table, districts_sql

N_DISTRICTS = 64

# point derivation constants (shared with oracle SQL)
AX, BX = 48271, 11
AY, BY = 69621, 23


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def derive_points(batch: pa.Table) -> pa.Table:
    """doc_id → off-lattice point in [0, EXTENT)² (exact int arithmetic)."""
    k = batch["doc_id"].to_numpy()
    x = ((k * AX + BX) % EXTENT).astype(np.float64) + 0.5
    y = ((k * AY + BY) % EXTENT).astype(np.float64) + 0.5
    out = batch.append_column("x", pa.array(x))
    return out.append_column("y", pa.array(y))


def derive_rects(batch: pa.Table) -> pa.Table:
    """doc_id → integer-coordinate source rectangle centred near the
    derived point (half-extents 1000..5800, deterministic)."""
    k = batch["doc_id"].to_numpy()
    cx = (k * AX + BX) % EXTENT
    cy = (k * AY + BY) % EXTENT
    hx = 1000 + (k % 97) * 50
    hy = 1000 + (k % 89) * 50
    cols = {
        "doc_id": batch["doc_id"],
        "sminx": pa.array((cx - hx).astype(np.float64)),
        "sminy": pa.array((cy - hy).astype(np.float64)),
        "smaxx": pa.array((cx + hx).astype(np.float64)),
        "smaxy": pa.array((cy + hy).astype(np.float64)),
    }
    for c in batch.column_names:
        if c not in ("doc_id",):
            cols[c] = batch[c]
    return pa.table(cols)


def _rect_geometry_table(batch: pa.Table) -> pa.Table:
    """Attach WKB geometry built from the derived rect columns — one
    bulk encode pass (byte-identical to per-row encode_polygon)."""
    from .geom.wkb import encode_rings_bulk

    a = batch["sminx"].to_numpy()
    b = batch["sminy"].to_numpy()
    c = batch["smaxx"].to_numpy()
    d = batch["smaxy"].to_numpy()
    n = len(a)
    P = np.empty((n, 4, 2), dtype=np.float64)
    P[:, 0, 0] = a
    P[:, 0, 1] = b
    P[:, 1, 0] = c
    P[:, 1, 1] = b
    P[:, 2, 0] = c
    P[:, 2, 1] = d
    P[:, 3, 0] = a
    P[:, 3, 1] = d
    return pa.table(
        {
            "source_id": batch["doc_id"],
            "geometry": encode_rings_bulk(
                P, np.full(n, 4, dtype=np.int64)
            ),
        }
    )


def _districts():
    return district_table(N_DISTRICTS)


# ---------------------------------------------------------------- queries


def q_assign_points(sf_dir: str):
    """Point-in-district covering join (op 1/2 point path)."""
    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_points, batch_format="pyarrow", zero_copy_batch=True
    )
    out = assign(
        ds,
        _districts(),
        source_id_col="doc_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        concurrency=8,
    )
    return out.select_columns(["doc_id", "district_id"])


def q_pieces(sf_dir: str):
    """Overlay join pieces with exact areas (op 5)."""
    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_rects, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_rect_geometry_table, batch_format="pyarrow")
    out = intersections(
        ds,
        _districts(),
        area_cutoff=0.0,
        include_geometry=False,
        targets_id_col="district_id",
        target_id_col="district_id",
        concurrency=8,
    )
    return out.select_columns(["source_id", "district_id", "area"]).rename_columns(
        ["doc_id", "district_id", "area"]
    )


def q_assign_to_max(sf_dir: str):
    """Public ``maup_ray.assign_to_max`` over the pieces Dataset (ref
    assign.py:49-54 — ``weights.groupby("source").idxmax()``): the
    DISTRIBUTED per-source argmax path (pruned projection shuffled by
    doc_id, per-partition lexsort), distinct from q_assign_by_area's
    local per-source kernel. Tie = (area desc, district asc), exact
    idxmax parity because reference intersections sorts its index."""
    from .ops.assign import assign_to_max

    out = assign_to_max(
        q_pieces(sf_dir), source_col="doc_id",
        target_col="district_id", weight_col="area",
    )
    return out.map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"], "district_id": b["target_id"]}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_assign_by_area(sf_dir: str):
    """Grouped argmax over piece areas (ops 3/4)."""
    from .ops.assign import assign_by_area

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_rects, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_rect_geometry_table, batch_format="pyarrow")
    out = assign_by_area(
        ds,
        _districts(),
        source_id_col="source_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        concurrency=8,
    )
    return out.select_columns(["source_id", "district_id"]).rename_columns(
        ["doc_id", "district_id"]
    )


def q_assign_blocks(sf_dir: str):
    """FULL two-phase assign (op 1) on block rectangles: covering
    phase (source ⊆ district) with area-argmax fallback for
    straddlers — the flagship composition under the SQL oracle."""
    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_rects, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_rect_geometry_table, batch_format="pyarrow")
    out = assign(
        ds,
        _districts(),
        source_id_col="source_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        concurrency=8,
    )
    return out.select_columns(["source_id", "district_id"]).rename_columns(
        ["doc_id", "district_id"]
    )


def q_normalize(sf_dir: str):
    """Per-source weight normalization (op 7): weight = area/Σarea.
    Exact-dyadic sums + one IEEE division → bit-identical to SQL."""
    pieces = q_pieces(sf_dir).rename_columns(["doc_id", "district_id", "weight"])
    out = normalize(pieces, level="doc_id")
    return out


def q_prorate(sf_dir: str):
    """Disaggregate n_chars by raw piece area, reaggregate per district
    (op 6). Raw (unnormalized) integer-valued weights keep every partial
    sum exact → order-independent, hash-safe vs SQL."""
    pieces = q_pieces(sf_dir).rename_columns(["doc_id", "district_id", "weight"])
    # attribute side stays a Dataset → hash-partition co-shuffle join
    # (_prorate_hash_join); never concat the attribute table on the
    # driver (VERDICT r1 "what's wrong" #3)
    data_ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = prorate(
        pieces,
        data_ds,
        ["n_chars"],
        source_id_col="doc_id",
        target_id_col="district_id",
        aggregate_by="sum",
    )
    # weight column name is "weight"; _ProrateJoin multiplies data col
    return out.rename_columns(["district_id", "weighted_chars"])


XL_RECT_SCALE = 4  # islands/count_overlaps rects: dense enough to overlap
# (147 closed pairs / 246 islands at 500 docs; rects stay small vs extent
# so the cell partition still prunes)


def derive_rects_xl(batch: pa.Table) -> pa.Table:
    """derive_rects with half-extents × XL_RECT_SCALE — dense enough
    that rects overlap (the plain rects are sparse at the synthetic
    document density: zero pairs)."""
    k = batch["doc_id"].to_numpy()
    cx = (k * AX + BX) % EXTENT
    cy = (k * AY + BY) % EXTENT
    hx = (1000 + (k % 97) * 50) * XL_RECT_SCALE
    hy = (1000 + (k % 89) * 50) * XL_RECT_SCALE
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "sminx": pa.array((cx - hx).astype(np.float64)),
            "sminy": pa.array((cy - hy).astype(np.float64)),
            "smaxx": pa.array((cx + hx).astype(np.float64)),
            "smaxy": pa.array((cy + hy).astype(np.float64)),
        }
    )


def _xl_rects_cte() -> str:
    f = XL_RECT_SCALE
    return f"""
srcs AS (
  SELECT doc_id,
    CAST((doc_id*{AX}+{BX})%{EXTENT} - (1000+(doc_id%97)*50)*{f} AS DOUBLE) AS sminx,
    CAST((doc_id*{AY}+{BY})%{EXTENT} - (1000+(doc_id%89)*50)*{f} AS DOUBLE) AS sminy,
    CAST((doc_id*{AX}+{BX})%{EXTENT} + (1000+(doc_id%97)*50)*{f} AS DOUBLE) AS smaxx,
    CAST((doc_id*{AY}+{BY})%{EXTENT} + (1000+(doc_id%89)*50)*{f} AS DOUBLE) AS smaxy
  FROM documents)
"""


def _doc_rect_geoms(sf_dir: str, xl: bool = False):
    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(
            derive_rects_xl if xl else derive_rects,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(_rect_geometry_table, batch_format="pyarrow")
    )


def q_islands(sf_dir: str):
    """op islands over the doc rect table: rects intersecting (closed,
    corner touches count — queen) no other rect. Dataset path: cell-
    partitioned adjacency self-join, distinct pair-ids broadcast,
    anti-join in map_batches."""
    from .ops.adjacencies import adjacencies, islands

    # materialize the derived-WKB table once: adjacencies, the
    # islands flag pass, and the final keep_islands filter all consume
    # it — lazy, each would re-run the derive+encode pipeline
    ds = _doc_rect_geoms(sf_dir, xl=True).materialize()
    # cell_res 5 (32x32 cells): XL rects span ~1-3 cells; the default
    # res 8 creates ~65k one-row groups and map_groups dispatch
    # dominates (25 s -> ~4 s at sf0.1)
    adj = adjacencies(
        ds,
        id_col="source_id",
        geometry_col="geometry",
        adjacency_type="queen",
        include_geometry=False,
        cell_res=5,
        extent=(0.0, 0.0, float(EXTENT)),
    )
    out = islands(ds, adj=adj, id_col="source_id")
    # project+rename INSIDE map_batches, not via
    # select_columns().rename_columns(): islands can emit all-empty
    # blocks (few/no islands in a block), and rename_columns' schema
    # fetch reorders its Project AFTER the limit-1 sample — on an
    # empty draw it sees the pre-projection schema and raises
    # (observed flake at sf0.1, bench 2026-08-19)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["source_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_count_overlaps(sf_dir: str):
    """op 17 count_overlaps over the doc rect table (pairs with
    positive intersection area)."""
    from .ops.adjacencies import count_overlaps

    n = count_overlaps(
        _doc_rect_geoms(sf_dir, xl=True),
        id_col="source_id",
        cell_res=5,
        extent=(0.0, 0.0, float(EXTENT)),
    )
    return pa.table({"n_overlaps": pa.array([n], type=pa.int64())})


def q_adjacencies(sf_dir: str):
    """District rook adjacency self-join (op 8) — lengths are exact
    integers on the BSP tessellation. sf-independent geometry but run
    through the engine's adjacency operator."""
    from .ops.adjacencies import adjacencies

    out = adjacencies(
        _districts(),
        id_col="district_id",
        adjacency_type="rook",
        include_geometry=False,
    )
    return out.select(["id_i", "id_j", "length"])


# --------------------------------------------------------------- brick wall
# Corpus-scale parcel tessellation for the DISTRIBUTED spatial-join gate
# queries (VERDICT r4 #1): every events row becomes one axis-rect "brick"
# in a jittered brick-wall that tiles the plane exactly — integer coords,
# row-major ids, per-row jittered column cuts so vertical adjacency is
# non-trivial (a brick can touch up to 3 bricks in the next row). All
# adjacency pair sets and shared-boundary lengths are exact rect algebra,
# SQL-expressible with two equi-joins (k+1 horizontal, row+1 vertical).

BRICK_C = 64   # columns per row
BRICK_W = 16   # nominal brick width (jitter < W//2 keeps cuts monotone)
BRICK_H = 8    # row height


def _brick_rects(k: np.ndarray):
    """event_id → exact-integer brick rect (x0, y0, x1, y1)."""
    row = k // BRICK_C
    col = k % BRICK_C
    j0 = np.where(col == 0, 0, (row * 13 + col * 7) % (BRICK_W // 2))
    j1 = np.where(
        col == BRICK_C - 1, 0,
        (row * 13 + (col + 1) * 7) % (BRICK_W // 2),
    )
    x0 = col * BRICK_W + j0
    x1 = (col + 1) * BRICK_W + j1
    y0 = row * BRICK_H
    return (
        x0.astype(np.float64), y0.astype(np.float64),
        x1.astype(np.float64), (y0 + BRICK_H).astype(np.float64),
    )


def _brick_geometry_table(batch: pa.Table) -> pa.Table:
    from .geom.wkb import encode_rings_bulk

    k = batch["event_id"].to_numpy()
    x0, y0, x1, y1 = _brick_rects(k)
    n = len(k)
    P = np.empty((n, 4, 2), dtype=np.float64)
    P[:, 0, 0] = x0
    P[:, 0, 1] = y0
    P[:, 1, 0] = x1
    P[:, 1, 1] = y0
    P[:, 2, 0] = x1
    P[:, 2, 1] = y1
    P[:, 3, 0] = x0
    P[:, 3, 1] = y1
    return pa.table(
        {
            "event_id": batch["event_id"],
            "geometry": encode_rings_bulk(
                P, np.full(n, 4, dtype=np.int64)
            ),
        }
    )


def _brick_field(n: int):
    """(extent, cell_res) for an n-brick wall: square extent covering
    the field, cells ~2 bricks wide (replication stays ~1×)."""
    import math

    rows = (n + BRICK_C - 1) // BRICK_C
    size = float(max(BRICK_C * BRICK_W, rows * BRICK_H))
    cell_res = max(2, min(12, int(round(math.log2(size / 32.0)))))
    return (0.0, 0.0, size), cell_res


BRICKS_SQL = f"""
bricks AS (
  SELECT event_id AS k,
         event_id // {BRICK_C} AS rw,
         event_id % {BRICK_C} AS cl,
         (event_id % {BRICK_C}) * {BRICK_W}
           + CASE WHEN event_id % {BRICK_C} = 0 THEN 0
                  ELSE ((event_id // {BRICK_C}) * 13
                        + (event_id % {BRICK_C}) * 7) % {BRICK_W // 2}
             END AS x0,
         (event_id % {BRICK_C} + 1) * {BRICK_W}
           + CASE WHEN event_id % {BRICK_C} = {BRICK_C - 1} THEN 0
                  ELSE ((event_id // {BRICK_C}) * 13
                        + (event_id % {BRICK_C} + 1) * 7) % {BRICK_W // 2}
             END AS x1
  FROM events)
"""


def q_adjacencies_xl(sf_dir: str):
    """Corpus-scale rook adjacency through the CELL-PARTITIONED Dataset
    self-join (ops/adjacencies.py `_partitioned_adjacencies`: replicate
    rows to covered cells, pair per hash partition, min-cell dedup) —
    the engine's flagship 100-TB path, here over 10⁴–10⁵ exact-integer
    brick parcels (one per events row, sf0.01: 10k / sf0.1: 100k).
    Lengths are exact integers so the rect-algebra SQL oracle matches
    bit-for-bit: horizontal neighbours share the full H=8 edge,
    vertical neighbours share the x-overlap of jittered spans."""
    from .ops.adjacencies import adjacencies

    ds = _read(sf_dir, "events", ["event_id"])
    extent, cell_res = _brick_field(ds.count())
    out = adjacencies(
        ds.map_batches(_brick_geometry_table, batch_format="pyarrow",
                       zero_copy_batch=True),
        id_col="event_id",
        adjacency_type="rook",
        include_geometry=False,
        cell_res=cell_res,
        extent=extent,
    )
    return out.select_columns(["id_i", "id_j", "length"])


def q_doctor_xl(sf_dir: str):
    """Corpus-scale distributed doctor (VERDICT r4 #1 companion):
    the brick wall with PLANTED defects — brick k grows 2 units right
    when k % 101 == 5 (→ one 2×8 overlap with its right neighbour) and
    shrinks 2 units when k % 103 == 7 on an interior odd row (→ one
    exact 2×8 hole of the union; odd-rows-only keeps holes from ever
    merging, interior-rows-only keeps them from leaking to the outer
    boundary). Runs the cell-partitioned queen self-join for overlaps
    plus the tree-reduce union for holes; both counts are closed-form
    countable in SQL over event_id arithmetic — a value-exact oracle
    for a geometry-repair diagnosis at 10⁴–10⁵ parcels."""
    from .geom.wkb import encode_rings_bulk
    from .ops.repair import doctor

    ds = _read(sf_dir, "events", ["event_id"])
    n = ds.count()
    R = (n + BRICK_C - 1) // BRICK_C
    extent, cell_res = _brick_field(n)

    def geom(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy()
        x0, y0, x1, y1 = _brick_rects(k)
        row = k // BRICK_C
        grown = k % 101 == 5
        shrunk = (
            (k % 103 == 7) & (row % 2 == 1) & (row <= R - 3) & ~grown
        )
        x1 = x1 + 2.0 * grown - 2.0 * shrunk
        m = len(k)
        P = np.empty((m, 4, 2), dtype=np.float64)
        P[:, 0, 0] = x0
        P[:, 0, 1] = y0
        P[:, 1, 0] = x1
        P[:, 1, 1] = y0
        P[:, 2, 0] = x1
        P[:, 2, 1] = y1
        P[:, 3, 0] = x0
        P[:, 3, 1] = y1
        return pa.table(
            {
                "id": batch["event_id"],
                "geometry": encode_rings_bulk(
                    P, np.full(m, 4, dtype=np.int64)
                ),
            }
        )

    checks = doctor(
        ds.map_batches(geom, batch_format="pyarrow",
                       zero_copy_batch=True),
        extent=extent,
        cell_res=cell_res,
    )
    return pa.table(
        {
            "n_overlaps": pa.array([checks["n_overlaps"]],
                                   type=pa.int64()),
            "n_gaps": pa.array([checks["n_gaps"]], type=pa.int64()),
        }
    )


def _geom_area_table(batch: pa.Table, id_col: str = "id") -> pa.Table:
    """(id, geometry) → (id, area), bulk-decoding uniform quad rows
    (one vectorized shoelace) with a per-row fallback for mixed
    shapes; zero-area rows are dropped (crop semantics: fully cropped
    rows keep an empty geometry the caller does not want)."""
    from .geom.core import area as poly_area
    from .geom.wkb import decode_polygons, decode_quads_bulk

    garr = batch["geometry"]
    if isinstance(garr, pa.ChunkedArray):
        garr = garr.combine_chunks()
    coords = decode_quads_bulk(garr)
    if coords is not None:
        x = coords[:, :, 0]
        y = coords[:, :, 1]
        a = 0.5 * np.abs(
            np.sum(x * np.roll(y, -1, axis=1)
                   - np.roll(x, -1, axis=1) * y, axis=1)
        )
    else:
        a = np.array(
            [poly_area(decode_polygons(b.as_py())) for b in garr]
        )
    keep = a > 0
    return pa.table(
        {
            id_col: batch[id_col].filter(pa.array(keep)),
            "area": pa.array(a[keep]),
        }
    )


def q_crop_xl(sf_dir: str):
    """Corpus-scale distributed crop_to (ref repair.py:261-280 at
    Dataset scale): the brick wall cropped to an interior window
    rect — the target union broadcasts once and every brick clips in
    a streaming map_batches (no shuffle). Output (id, area) of the
    surviving cropped bricks; window and bricks are all integers so
    areas are exact and the SQL mirror is pure rect algebra."""
    from .geom.core import rect
    from .geom.wkb import encode_multipolygon
    from .ops.distributed import crop_to_distributed

    ds = _read(sf_dir, "events", ["event_id"])
    n = ds.count()
    R = (n + BRICK_C - 1) // BRICK_C
    y_hi = float((R * BRICK_H * 3) // 4)
    target = pa.table(
        {
            "id": pa.array([0], type=pa.int64()),
            "geometry": pa.array(
                [encode_multipolygon(rect(53.0, 13.0, 1000.0, y_hi))],
                type=pa.binary(),
            ),
        }
    )
    bricks = ds.map_batches(
        _brick_geometry_table, batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        lambda b: pa.table(
            {"id": b["event_id"], "geometry": b["geometry"]}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = crop_to_distributed(bricks, target)
    return out.map_batches(
        _geom_area_table, batch_format="pyarrow", zero_copy_batch=True
    )


def q_expand_xl(sf_dir: str):
    """Corpus-scale distributed expand_to (ref repair.py:283-308 at
    Dataset scale): the full-row brick wall with every k%97==13 brick
    DELETED, expanded to the full-field target rect. Leftover pieces
    (exactly the deleted bricks — deletions are never adjacent) are
    computed via the tree-reduce union difference, then absorbed into
    the touching source with the LONGEST shared boundary (bbox-
    prefiltered distributed length pass, argmax tie → smallest id).
    Output (id, area): absorbing bricks carry their own + absorbed
    area — closed-form rect algebra in the SQL mirror."""
    from .geom.core import rect
    from .geom.wkb import encode_multipolygon, encode_rings_bulk
    from .ops.distributed import expand_to_distributed

    ds = _read(sf_dir, "events", ["event_id"])
    n = ds.count()
    R = (n + BRICK_C - 1) // BRICK_C
    extent, cell_res = _brick_field(n)

    def geom(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy()
        row = k // BRICK_C
        keep = (row <= R - 2) & (k % 97 != 13)
        k = k[keep]
        x0, y0, x1, y1 = _brick_rects(k)
        m = len(k)
        P = np.empty((m, 4, 2), dtype=np.float64)
        P[:, 0, 0] = x0
        P[:, 0, 1] = y0
        P[:, 1, 0] = x1
        P[:, 1, 1] = y0
        P[:, 2, 0] = x1
        P[:, 2, 1] = y1
        P[:, 3, 0] = x0
        P[:, 3, 1] = y1
        return pa.table(
            {
                "id": pa.array(k),
                "geometry": encode_rings_bulk(
                    P, np.full(m, 4, dtype=np.int64)
                ),
            }
        )

    target = pa.table(
        {
            "id": pa.array([0], type=pa.int64()),
            "geometry": pa.array(
                [
                    encode_multipolygon(
                        rect(
                            0.0, 0.0,
                            float(BRICK_C * BRICK_W),
                            float((R - 1) * BRICK_H),
                        )
                    )
                ],
                type=pa.binary(),
            ),
        }
    )
    out = expand_to_distributed(
        ds.map_batches(geom, batch_format="pyarrow",
                       zero_copy_batch=True),
        target,
        extent,
    )
    return out.map_batches(
        _geom_area_table, batch_format="pyarrow", zero_copy_batch=True
    )


def q_smart_repair_xl(sf_dir: str):
    """DISTRIBUTED smart_repair under a value-exact gate: the full-row
    brick wall with the doctor_xl grow/shrink defects, repaired
    per ROW-BAND region (16 rows per band — bands align with brick
    rows so no source crosses a region boundary; defects are
    row-local so band repair ≡ global repair). After overlap
    resolution (union-preserving) and region-complement gap fill,
    every point of every band rect is covered exactly once, so
    Σ per-unit areas == (R−1)·8·1024 EXACTLY and no unit vanishes —
    a closed-form SQL mirror for the engine's most complex operator.
    Total is rounded to int64: convexify splits of multi-owner gaps
    introduce incenter (non-dyadic) cut points whose shoelace parts
    telescope to the exact hole area only up to ~1e-9 relative."""
    from .geom.core import rect
    from .geom.wkb import encode_multipolygon, encode_rings_bulk
    from .ops.smart_repair import smart_repair

    ds = _read(sf_dir, "events", ["event_id"])
    n = ds.count()
    R = (n + BRICK_C - 1) // BRICK_C
    full_rows = R - 1  # rows 0..R-2 are complete
    BAND = 16

    def geom(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy()
        row = k // BRICK_C
        keep = row <= R - 2
        k = k[keep]
        row = row[keep]
        x0, y0, x1, y1 = _brick_rects(k)
        grown = k % 101 == 5
        shrunk = (
            (k % 103 == 7) & (row % 2 == 1) & (row <= R - 3) & ~grown
        )
        x1 = x1 + 2.0 * grown - 2.0 * shrunk
        m = len(k)
        P = np.empty((m, 4, 2), dtype=np.float64)
        P[:, 0, 0] = x0
        P[:, 0, 1] = y0
        P[:, 1, 0] = x1
        P[:, 1, 1] = y0
        P[:, 2, 0] = x1
        P[:, 2, 1] = y1
        P[:, 3, 0] = x0
        P[:, 3, 1] = y1
        return pa.table(
            {
                "id": pa.array(k),
                "geometry": encode_rings_bulk(
                    P, np.full(m, 4, dtype=np.int64)
                ),
            }
        )

    n_bands = (full_rows + BAND - 1) // BAND
    regions = pa.table(
        {
            "band_id": pa.array(range(n_bands), type=pa.int64()),
            "geometry": pa.array(
                [
                    encode_multipolygon(
                        rect(
                            0.0,
                            float(b * BAND * BRICK_H),
                            float(BRICK_C * BRICK_W),
                            float(
                                min((b + 1) * BAND, full_rows)
                                * BRICK_H
                            ),
                        )
                    )
                    for b in range(n_bands)
                ],
                type=pa.binary(),
            ),
        }
    )
    # fill_gaps_threshold=None: planted holes are ~12.5% of a brick's
    # area — the reference's default 10% relative threshold would
    # refuse them, and the closed-form total assumes every gap fills
    fixed = smart_repair(
        ds.map_batches(geom, batch_format="pyarrow",
                       zero_copy_batch=True),
        regions=regions,
        fill_gaps_threshold=None,
    )

    def partial(df):
        import pandas as pd

        from .geom.core import area as poly_area
        from .geom.wkb import decode_polygons

        tot = 0.0
        cnt = 0
        for b in df["geometry"]:
            if not b:
                continue
            a = poly_area(decode_polygons(b))
            if a > 0:
                tot += a
                cnt += 1
        return pd.DataFrame({"a": [tot], "c": [cnt]})

    parts = fixed.map_batches(partial, batch_format="pandas").to_pandas()
    return pa.table(
        {
            "total_area": pa.array(
                [int(round(float(parts["a"].sum())))], type=pa.int64()
            ),
            "n_units": pa.array(
                [int(parts["c"].sum())], type=pa.int64()
            ),
        }
    )


def q_tile_skew(sf_dir: str):
    """Hot-cell skew splitting UNDER THE GATE: 30% of events points
    (event_id % 10 < 3) are planted inside ONE res-4 base cell, the
    rest spread uniformly. ``with_hot_cell_split`` probes counts at
    the finest candidate res and re-keys the hot cell's rows at the
    refinement level that bounds every shuffle partition; the counting
    shuffle then runs on the REFINED keys (the skew-resistant plan)
    and rolls back up to base-res cells. The roll-up equals the plain
    per-cell ground truth — which is the SQL mirror — so a mis-keyed
    row anywhere in probe/refine/shuffle breaks the hash. Coordinates
    divide a power-of-two extent, so cell ids are exact on both
    sides."""
    from .ops.agg import grouped_sum_count
    from .ops.distributed import with_hot_cell_split
    from .geom.cells import CellGrid
    from .ops.shuffle import hash_group_apply

    ds = _read(sf_dir, "events", ["event_id"])
    n = ds.count()
    CW = EXTENT // 16

    def pts(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy()
        hot = k % 10 < 3
        x = np.where(hot, (k * 13) % CW, (k * AX + BX) % EXTENT)
        y = np.where(hot, (k * 29) % CW, (k * AY + BY) % EXTENT)
        return pa.table(
            {
                "x": pa.array(x.astype(np.float64) + 0.5),
                "y": pa.array(y.astype(np.float64) + 0.5),
            }
        )

    keyed = with_hot_cell_split(
        ds.map_batches(pts, batch_format="pyarrow",
                       zero_copy_batch=True),
        (0.0, 0.0, float(EXTENT)),
        4,
        max_rows=max(1000, n // 20),
    )

    def cnt_part(tbl, starts):
        if tbl is None or tbl.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], type=pa.uint64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        starts = np.asarray(starts, dtype=np.int64)
        cells = tbl["cell"].to_numpy(zero_copy_only=False)
        sizes = np.diff(np.append(starts, tbl.num_rows))
        return pa.table(
            {
                "cell": pa.array(cells[starts]),
                "n": pa.array(sizes.astype(np.int64)),
            }
        )

    per_ref = hash_group_apply(
        keyed.map_batches(
            lambda b: pa.table(
                {
                    "cell": pc.cast(b["cell"], pa.int64())
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        ["cell"], cnt_part,
    )

    def rollup(b: pa.Table) -> pa.Table:
        cells = b["cell"].to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        cx, cy, res = CellGrid.unpack(cells)
        shift = (res - 4).astype(np.int64)
        return pa.table(
            {
                "cx": pa.array(cx >> shift),
                "cy": pa.array(cy >> shift),
                "n": b["n"],
            }
        )

    out = grouped_sum_count(
        per_ref.map_batches(rollup, batch_format="pyarrow",
                            zero_copy_batch=True),
        ["cx", "cy"], sum_cols=["n"], final="driver",
    )
    return out.select(["cx", "cy", "n"]) if isinstance(
        out, pa.Table
    ) else out.select_columns(["cx", "cy", "n"])


def q_pieces_xl(sf_dir: str):
    """Corpus-scale overlay join (the prorate backbone) under the
    gate: the brick wall scaled into district space by an integer
    factor K = EXTENT // field_size (coords stay exact integers),
    intersected with the 64-district BSP tessellation through the
    actor-pool broadcast join — 10⁴–10⁵ sources × 64 targets with
    exact rect-algebra piece areas. → (event_id, district_id, area),
    area > 0."""
    from .geom.wkb import encode_rings_bulk

    ds = _read(sf_dir, "events", ["event_id"])
    n = ds.count()
    R = (n + BRICK_C - 1) // BRICK_C
    size = max(BRICK_C * BRICK_W, R * BRICK_H)
    K = EXTENT // size

    def geom(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy()
        x0, y0, x1, y1 = _brick_rects(k)
        m = len(k)
        P = np.empty((m, 4, 2), dtype=np.float64)
        P[:, 0, 0] = x0 * K
        P[:, 0, 1] = y0 * K
        P[:, 1, 0] = x1 * K
        P[:, 1, 1] = y0 * K
        P[:, 2, 0] = x1 * K
        P[:, 2, 1] = y1 * K
        P[:, 3, 0] = x0 * K
        P[:, 3, 1] = y1 * K
        return pa.table(
            {
                "source_id": batch["event_id"],
                "geometry": encode_rings_bulk(
                    P, np.full(m, 4, dtype=np.int64)
                ),
            }
        )

    out = intersections(
        ds.map_batches(geom, batch_format="pyarrow",
                       zero_copy_batch=True),
        _districts(),
        area_cutoff=0.0,
        include_geometry=False,
        targets_id_col="district_id",
        target_id_col="district_id",
        concurrency=8,
    )
    return out.select_columns(
        ["source_id", "district_id", "area"]
    ).rename_columns(["event_id", "district_id", "area"])


def q_prorate_xl(sf_dir: str):
    """Corpus-scale prorate (op 6 over the pieces_xl overlay): events
    integer value-cents disaggregate over exact piece areas and
    reaggregate per district. Raw integer weights × integer cents
    keep every partial exact, so the hash-partition co-shuffle join
    (attribute side never concatenated on the driver) is hash-safe
    vs SQL at 100k pieces."""
    pieces = q_pieces_xl(sf_dir).rename_columns(
        ["event_id", "district_id", "weight"]
    )

    def cents(b: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
        )
        return pa.table({"event_id": b["event_id"], "cents": v})

    data_ds = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        cents, batch_format="pyarrow", zero_copy_batch=True
    )
    out = prorate(
        pieces,
        data_ds,
        ["cents"],
        source_id_col="event_id",
        target_id_col="district_id",
        aggregate_by="sum",
    )
    return out.rename_columns(["district_id", "weighted_cents"])


def q_normalize_xl(sf_dir: str):
    """Per-source normalization over the corpus-scale overlay (op 7
    at 100k sources): weight = area / Σ area per event_id — exact
    dyadic sums + one IEEE division, bit-identical to SQL."""
    pieces = q_pieces_xl(sf_dir).rename_columns(
        ["event_id", "district_id", "weight"]
    )
    return normalize(pieces, level="event_id")


def q_assign_xl(sf_dir: str):
    """Corpus-scale point assignment (op 1 point path at 10⁴–10⁵
    sources): one derived off-lattice point per events row through
    the actor-pool covering join against the 64-district BSP
    tessellation. SQL mirror is a point-in-rect join — half-open
    [min, max) semantics on both sides."""
    ds = _read(sf_dir, "events", ["event_id"])

    def pts(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy()
        x = ((k * AX + BX) % EXTENT).astype(np.float64) + 0.5
        y = ((k * AY + BY) % EXTENT).astype(np.float64) + 0.5
        return pa.table(
            {
                "event_id": b["event_id"],
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    out = assign(
        ds.map_batches(pts, batch_format="pyarrow",
                       zero_copy_batch=True),
        _districts(),
        source_id_col="event_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        concurrency=8,
    )
    return out.select_columns(["event_id", "district_id"])


def q_cell_tiles(sf_dir: str):
    """Hierarchical-cell tiling + count per tile (the H3-style op)."""

    def tile(batch: pa.Table) -> pa.Table:
        from .geom.cells import CellGrid

        g = CellGrid(0, 0, EXTENT)
        cells = g.cell_of_points(
            batch["x"].to_numpy(), batch["y"].to_numpy(), 4
        )
        cx, cy, _ = CellGrid.unpack(cells)
        return pa.table(
            {"cx": pa.array(cx), "cy": pa.array(cy)}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_points, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(tile, batch_format="pyarrow")
    # 256 tiles: partial per-batch counts + driver merge — the keyed
    # Aggregate operator's fixed cost dwarfs the work (ops/agg note)
    from .ops.agg import grouped_sum_count

    return grouped_sum_count(
        ds, ["cx", "cy"], count_col="n_docs", final="driver"
    )


def q_gapfill(sf_dir: str):
    """Time-spine gap filling — the time-series reporting staple: the
    COMPLETE (event_type × hour) grid over the observed span with
    zero-filled counts for silent hours. One streaming pass of
    per-batch (type, hour) count partials (only distinct buckets
    move); the spine is generated on the driver (dimension-sized:
    |types| × span-hours) and counts land on it via one Arrow left
    join. Hour arithmetic is exact integer µs (3600·10⁶ steps from
    the global floor-truncated min), so the spine matches DuckDB's
    generate_series(..., INTERVAL 1 HOUR) row for row."""
    from .ops.agg import grouped_sum_count

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pc.floor_temporal(batch["ts"], unit="hour"),
            }
        )

    counts = grouped_sum_count(
        ds.map_batches(bucket, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "hour"], count_col="n", final="driver",
    )
    if counts.num_rows == 0:
        return counts
    hours_us = pc.cast(counts["hour"], pa.int64())
    lo = pc.min(hours_us).as_py()
    hi = pc.max(hours_us).as_py()
    step = 3_600_000_000
    spine_h = np.arange(lo, hi + 1, step, dtype=np.int64)
    types = pc.unique(counts["event_type"].combine_chunks()).sort()
    nt, nh = len(types), len(spine_h)
    spine = pa.table(
        {
            "event_type": pc.take(
                types, pa.array(np.repeat(np.arange(nt), nh))
            ),
            "hour": pa.array(
                np.tile(spine_h, nt), type=pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    out = spine.join(
        counts, keys=["event_type", "hour"], join_type="left outer"
    )
    n = pc.fill_null(pc.cast(out["n"], pa.int64()), 0)
    return pa.table(
        {
            "event_type": out["event_type"],
            "hour": out["hour"],
            "n": n,
        }
    ).sort_by([("event_type", "ascending"), ("hour", "ascending")])


def q_events_hourly(sf_dir: str):
    """Windowed aggregate over the events stream table: count + value
    sum per (event_type, hour)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        # integer cents per row → exact, order-independent sums (float
        # sums differ from the oracle in the last ulp across plans)
        cents = pc.cast(
            pc.round(pc.multiply(batch["value"], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": hour,
                "value_cents": cents,
            }
        )

    # (event_type, hour) cardinality is tiny (~3.4k at sf0.01):
    # partial per-batch Arrow group_by + driver merge skips the keyed
    # Aggregate operator; integer-cents partial sums stay exact in any
    # order. The oracle (date_trunc) emits timestamp[us] — the partial
    # path preserves the bucket()'s us unit, so no unit fix-up needed.
    from .ops.agg import grouped_sum_count

    out = grouped_sum_count(
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour"],
        sum_cols=["value_cents"],
        count_col="n",
        final="driver",
    )
    return out.select(["event_type", "hour", "n", "value_cents"])


# ----------------------------------------------- training-data queries


def q_token_count(sf_dir: str):
    from .text.analysis import token_counts

    return token_counts(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_quality(sf_dir: str):
    from .text.analysis import quality_scores

    ds = quality_scores(_read(sf_dir, "documents", ["doc_id", "text"]))
    return ds.select_columns(
        ["doc_id", "n_chars", "n_tokens", "mean_token_len", "stopword_ratio"]
    )


def q_dedup_exact(sf_dir: str):
    from .text.dedup import exact_dedup

    out = exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))
    return out.select_columns(["doc_id"])


PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_profile(sf_dir: str):
    """Per-column profile of the widest table (count/nulls/min/max in
    one streaming pass of scalar partials) — the `describe` utility an
    ingestion pipeline runs before anything else."""
    from .ops.agg import profile_columns

    ds = _read(sf_dir, "lineitem", PROFILE_COLS)
    return profile_columns(ds, PROFILE_COLS)


STRAT_K = 2
STRAT_MOD = 100_000


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: K docs per language, ranked
    by an affine-mod hash of the id (reproducible across runs and
    machines — no RNG state). Pure composition: derive the hash rank
    per batch, then the distributed top-k-per-group window."""
    from .ops.curate import top_k_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def rank_key(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        # NEGATED hash so top-k-DESC picks the smallest hash values
        return pa.table(
            {
                "lang": b["lang"],
                "neg_hash": pa.array(-((ids * 48271 + 11) % STRAT_MOD)),
                "doc_id": b["doc_id"],
            }
        )

    ds = ds.map_batches(
        rank_key, batch_format="pyarrow", zero_copy_batch=True
    )
    return top_k_per_group(ds, "lang", "neg_hash", STRAT_K, "doc_id")


BPE_MERGES = 50


def q_bpe_train(sf_dir: str):
    """BPE tokenizer trained on the corpus then applied to it
    (rows-only: the merge loop is iterative, not SQL-expressible;
    algorithm invariants pinned by tests/test_bpe.py): ONE streaming
    word-frequency pass → driver merge loop over the distinct-word
    table → distributed application encoding only each batch's
    distinct words."""
    from .text.bpe import apply_bpe, train_bpe, word_frequencies

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    wf = word_frequencies(ds)
    merges = train_bpe(wf, BPE_MERGES)
    return apply_bpe(ds, merges)


NGRAM_MIN_COUNT = 5


def q_ngrams(sf_dir: str):
    """Corpus-wide frequent word 3-grams (contamination/boilerplate
    statistics): per-batch vectorized gram construction + partial
    counts, ONE keyed sum over distinct grams — the token stream
    never shuffles."""
    from .text.analysis import frequent_ngrams

    ds = _read(sf_dir, "documents", ["text"])
    return frequent_ngrams(ds, n=3, min_count=NGRAM_MIN_COUNT)


COLLOC_K = 20
COLLOC_MIN_COUNT = 5


def q_collocations(sf_dir: str):
    """Top-k statistical collocations (bigrams ranked by lift =
    observed/expected co-occurrence): two frequent_ngrams count passes
    (token stream never shuffles; distinct (gram,count) partials are
    the only exchange), vocabulary-bounded driver join, one exact-int
    division per surviving bigram — float parity recipe in
    text/analysis.bigram_lift_topk."""
    from .text.analysis import bigram_lift_topk

    ds = _read(sf_dir, "documents", ["text"])
    return bigram_lift_topk(ds, k=COLLOC_K, min_count=COLLOC_MIN_COUNT)


def q_curation(sf_dir: str):
    """Composite end-to-end curation DAG — the canonical LLM-data
    pre-training pass expressed as ONE streaming pipeline: quality
    scoring (vectorized per batch) → threshold filter → exact
    content dedup (hash-keyed keeper pick; only 24 B/row shuffles) →
    deterministic holdout sample. Each stage is individually oracled
    (quality / dedup_exact / sample); this query oracles their
    COMPOSITION, the thing a real pipeline actually runs."""
    from .ops.curate import hash_sample
    from .text.analysis import quality_batch
    from .text.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def keep_good(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        keep = pc.and_(
            pc.greater_equal(q["n_tokens"], 5),
            pc.less(q["mean_token_len"], 12.0),
        )
        return batch.filter(keep)

    good = ds.map_batches(
        keep_good, batch_format="pyarrow", zero_copy_batch=True
    )
    kept = exact_dedup(good).select_columns(["doc_id"])
    return hash_sample(kept, "doc_id", keep=50)


def q_near_dup(sf_dir: str):
    """Near-duplicate CLUSTERING: exact word-3-shingle Jaccard ≥ 0.5
    candidate pairs (shared-shingle join) → connected components via
    distributed min-label propagation → (doc_id, component_id) with
    component_id = min doc of the cluster (the canonical keeper).
    Shuffles carry only (hash, id, count) columns; text never moves."""
    from .text.cluster import near_dup_components

    return near_dup_components(
        _read(sf_dir, "documents", ["doc_id", "text"])
    )


def q_token_bpe(sf_dir: str):
    """BPE-ish pretoken counting (one RE2 pass per batch)."""
    from .text.analysis import bpe_token_counts

    return bpe_token_counts(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_lang_id(sf_dir: str):
    from .text.analysis import lang_id

    return lang_id(_read(sf_dir, "documents", ["doc_id", "text"]))


def _plant_pii(b: pa.Table) -> pa.Table:
    """Append deterministic doc_id-derived PII (an email, an IPv4, a
    phone) to every document — the SQL oracle derives the identical
    string with `||` concatenation, so the redaction compare is
    byte-exact and guaranteed non-trivial on every row."""
    import pyarrow.compute as pc

    ids = b["doc_id"].to_numpy()
    s_id = pc.cast(b["doc_id"], pa.string())
    s_m7 = pc.cast(pa.array(ids % 7), pa.string())
    s_m256 = pc.cast(pa.array(ids % 256), pa.string())
    s_m100 = pc.cast(pa.array(ids % 100), pa.string())
    t = pc.binary_join_element_wise(
        b["text"],
        " contact user", s_id, "@ex", s_m7, ".com from 10.",
        s_m256, ".0.", s_m100, " call +1555000", s_id,
        "",  # element-wise join separator
    )
    return pa.table({"doc_id": b["doc_id"], "text": t})


def q_redact(sf_dir: str):
    """PII scrubbing (emails / IPv4s / phone digit runs → tokens) over
    documents with planted PII — value-exact vs the DuckDB
    regexp_replace oracle (both engines run RE2)."""
    from .text.analysis import redact_pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _plant_pii, batch_format="pyarrow", zero_copy_batch=True
    )
    return redact_pii(ds)


CHUNK_SIZE = 120
CHUNK_OVERLAP = 30
PACK_BUDGET = 256
PACK_RANGE = 64


def q_pack(sf_dir: str):
    """Greedy sequence packing into ≤PACK_BUDGET-token bins per
    id-range partition — value-exact vs the DuckDB per-partition
    recursive-scan oracle."""
    from .text.analysis import pack_documents

    return pack_documents(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        budget=PACK_BUDGET,
        range_size=PACK_RANGE,
    )


def q_chunks(sf_dir: str):
    """Context-window chunking of documents (flat_map shape) —
    value-exact vs the DuckDB substr/series oracle (Arrow
    utf8_slice_codeunits and SQL substr share codepoint semantics)."""
    from .text.analysis import chunk_text

    return chunk_text(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        chunk_size=CHUNK_SIZE,
        overlap=CHUNK_OVERLAP,
    )


BM25_TERMS = ("hash", "vector", "join")
BM25_K = 20


def q_bm25(sf_dir: str):
    """BM25 top-k retrieval over documents — value-exact vs the DuckDB
    oracle: exact-integer (tf, df, dl, N, Σdl) statistics, algebraic
    (log-free) idf, one fixed IEEE expression mirrored in the SQL
    (text/rank.py exactness note)."""
    from .text.rank import bm25_topk

    return bm25_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        terms=BM25_TERMS,
        k=BM25_K,
    )


BM25_MULTI = {
    # term ORDER is semantic: it fixes the IEEE per-term sum order,
    # mirrored term-for-term in the SQL oracle branches.
    "q_hash_join": ("hash", "join"),
    "q_scan_filter": ("scan", "filter", "column"),
    "q_stream": ("stream", "vector", "merge", "sort"),
}


def q_bm25_multi(sf_dir: str):
    """Batched-retrieval BM25: top-k per query for a query SET in the
    same two corpus passes as q_bm25 (ROUND_NOTES r5 candidate #3 —
    one scan serves every query instead of one scan per query)."""
    from .text.rank import bm25_topk_multi

    return bm25_topk_multi(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        queries=BM25_MULTI,
        k=BM25_K,
    )


def q_embed_cluster(sf_dir: str):
    """Distributed k-means clustering of the embeddings table
    (rows-only: Lloyd's is not SQL-expressible; pytest pins the
    planted-structure recovery and the numpy-replica equivalence)."""
    from .vector.kmeans import kmeans

    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans(corpus, k=8, iters=4)


def q_embed_pca(sf_dir: str):
    """Distributed PCA of the embeddings table → per-vector top-2
    principal scores (rows-only: the eigensolve is not
    SQL-expressible; pytest pins the numpy-replica equivalence,
    bit-level partition invariance, and this query's full value
    hash). One streaming O(d²)-partial moment pass + one stateless
    projection pass — no shuffle (vector/pca.py)."""
    from .vector.pca import pca

    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pca(corpus, n_components=2)


def q_embed_prune(sf_dir: str):
    """SemDeDup-style cluster-then-prune over the embeddings table
    (rows-only: the k-means phase is not SQL-expressible; pytest pins
    planted-duplicate pruning and partition invariance)."""
    from .vector.prune import semantic_prune

    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_prune(corpus, k=8, iters=4, threshold=0.99)


def q_approx_distinct(sf_dir: str):
    """HyperLogLog cardinalities of four events columns in ONE
    streaming pass, no shuffle (rows-only: the sketch is deliberately
    approximate; pytest pins the exact register-determined values and
    the ≤2% error bound vs exact distinct)."""
    from .ops.sketch import approx_distinct

    return approx_distinct(
        _read(
            sf_dir,
            "events",
            ["event_id", "user_id", "event_type", "props"],
        ),
        ["event_id", "user_id", "event_type", "props"],
    )


def q_cust_no_urgent(sf_dir: str):
    """Anti-join at the streaming surface: customers with NO urgent
    order. The orders side contributes only its distinct urgent
    custkeys (pre-distincted per block, broadcast once); the customer
    stream filters with one vectorized is_in per batch — no shuffle."""
    from .ops.join import anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def urgent_keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderpriority"], "1-URGENT")
        return b.filter(m).select(["o_custkey"])

    urgent = _read(
        sf_dir, "orders", ["o_custkey", "o_orderpriority"]
    ).map_batches(urgent_keys, batch_format="pyarrow", zero_copy_batch=True)
    return anti_join(cust, urgent, on="c_custkey", right_on="o_custkey")


DECON_MOD = 89  # doc_id % MOD == 0 rows play the "benchmark" set


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: corpus docs (doc_id % 89 != 0)
    flagged iff they share any word 3-shingle with the benchmark
    slice (doc_id % 89 == 0). Broadcast shingle semi-join with exact
    string confirm — value-exact vs the DuckDB string join."""
    from .text.decontaminate import decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def part(rem_zero: bool):
        def f(b):
            ids = b["doc_id"].to_numpy()
            m = (ids % DECON_MOD == 0) == rem_zero
            return b.filter(pa.array(m))

        return docs.map_batches(
            f, batch_format="pyarrow", zero_copy_batch=True
        )

    return decontaminate(part(False), part(True), k=3)


def q_fingerprint(sf_dir: str):
    from .text.analysis import fingerprints

    return fingerprints(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_minhash_pairs(sf_dir: str):
    from .text.dedup import minhash_candidates

    return minhash_candidates(
        _read(sf_dir, "documents", ["doc_id", "text"])
    )


def q_simhash_pairs(sf_dir: str):
    from .text.dedup import simhash_candidates

    return simhash_candidates(
        _read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3
    )


N_ANN_QUERIES = 8
ANN_K = 5


def _ann_inputs(sf_dir: str):
    # filter pushdown both ways: the tiny query set is read via a
    # row-group-pruned scan (never the whole embeddings table on the
    # driver — VERDICT r1 #3), and the corpus filter is a pushed-down
    # expression, not a per-row Python lambda
    import pyarrow.dataset as pads
    import ray.data

    queries = (
        pads.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(
            columns=["vec_id", "embedding"],
            filter=pads.field("vec_id") < N_ANN_QUERIES,
        )
        .rename_columns(["query_id", "embedding"])
    )
    corpus = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") >= N_ANN_QUERIES,
    )
    return corpus, queries


def q_ann_topk(sf_dir: str):
    from .vector.ann import brute_topk

    corpus, queries = _ann_inputs(sf_dir)
    return brute_topk(corpus, queries, k=ANN_K)


EMBED_DUP_THRESHOLD = 0.42  # in a measured similarity gap at every sf
# (margin >= 3e-5 to the nearest pair — orders above any float32/float64
# arithmetic difference vs the DuckDB oracle)


def q_embed_dedup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (exact mode: normalized
    corpus broadcast once, one matmul per batch, pairs emitted exactly
    once by the id_i < id_j ownership rule)."""
    from .vector.ann import cosine_near_dup

    return cosine_near_dup(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        threshold=EMBED_DUP_THRESHOLD,
    )


def q_ann_lsh(sf_dir: str):
    from .vector.ann import lsh_topk

    corpus, queries = _ann_inputs(sf_dir)
    return lsh_topk(corpus, queries, k=ANN_K)


def q_ann_ivf(sf_dir: str):
    """IVF approximate top-k (rows-only: approximate by design, recall
    pinned by tests/test_text.py planted-dup fixtures): bounded-sample
    k-means coarse quantizer, centroids broadcast, each corpus batch
    scores only the queries probing its centroid."""
    from .vector.ann import ivf_topk

    corpus, queries = _ann_inputs(sf_dir)
    return ivf_topk(corpus, queries, k=ANN_K)


def q_image_dedup(sf_dir: str):
    """Perceptual near-duplicate image CLUSTERS (rows-only: phash is
    not SQL-expressible): synth image table sized from documents →
    actor-pool decode+phash → quarter-pigeonhole hamming buckets →
    BSP connected components → (image_id, cluster_id). The synthetic
    raster family differs only by per-id luminance offsets, so
    phash-equal/near groups occur naturally at every scale."""
    import pyarrow.parquet as pq

    from .media.image import image_near_dup
    from .synth.images import image_dataset

    n = 4 * pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    out = image_near_dup(image_dataset(n, png_every=8, jpeg_every=12))
    return out.sort("image_id")


def q_image_doctor(sf_dir: str):
    """maup.doctor re-aimed at the multimodal table: one streaming
    pass of integer partials over the synth image corpus → corruption
    / consistency report (rows-only; pytest pins the clean-corpus
    report and the planted-corruption counts)."""
    import pyarrow.parquet as pq

    from .media.doctor import image_doctor
    from .synth.images import image_dataset

    n = 4 * pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return image_doctor(image_dataset(n, png_every=8, jpeg_every=12))


def q_image_phash(sf_dir: str):
    """Multimodal plumbing: synth image table sized from documents →
    actor-pool decode + perceptual hash. Payload fidelity (byte-exact
    raw pixels) is asserted by tests/test_media.py."""
    import pyarrow.parquet as pq

    from .media.image import PhashStage
    from .synth.images import image_dataset

    n = 4 * pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    # every 8th row is PNG-compressed and every 12th (mod-12 == 11,
    # minus PNG overlaps) baseline-JPEG at quality 98 — both
    # from-scratch codecs — so the hash stage exercises the lossless
    # AND lossy compressed-decode paths alongside the vectorized raw
    # fast path in the same batches
    ds = image_dataset(n, png_every=8, jpeg_every=12)
    # task mode + per-worker cached stage: PhashStage state is a tiny
    # bit-packing table; an actor pool pays ~2 s respawn per execution
    from .ops.assign import _cached_instance

    def fn(batch: pa.Table) -> pa.Table:
        return _cached_instance(PhashStage, ("phash",), {})(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_video_cuts(sf_dir: str):
    """Scene-cut detection (rows-only: codec decode is not
    SQL-expressible): per-video consecutive-frame absolute-difference
    integer sums + threshold cuts (media/cuts.scene_cut_stats). The
    scroll-pattern corpus has CONSTANT per-pair diffs (cyclic shift),
    an invariant tests/test_video.py pins alongside a planted-cut
    fixture."""
    import pyarrow.parquet as pq

    from .media.cuts import scene_cut_stats
    from .synth.videos import video_dataset

    n = max(40, pq.read_metadata(
        f"{sf_dir}/documents.parquet").num_rows // 2)
    return scene_cut_stats(video_dataset(n, n_frames=8))


def q_video_frames(sf_dir: str):
    """Video frame sampling (rows-only: container/codec decode is not
    SQL-expressible): synth AVI table sized from documents (mixed
    MJPEG + lossless-DIB codecs) → FrameSampleStage (from-scratch RIFF
    parse, decode ONLY the sampled frames) → one row per sampled frame.
    Payload columns are dropped before anything leaves the stage;
    frame fidelity (DIB byte-exact, MJPEG PSNR≥40dB) is pinned by
    tests/test_video.py."""
    import pyarrow.parquet as pq

    from .media.image import FrameSampleStage
    from .synth.videos import video_dataset

    n = max(40, pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows // 2)
    ds = video_dataset(n, n_frames=8)
    out = ds.map_batches(
        FrameSampleStage(every_n=2),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["video_id", "frame_idx", "w", "h"])
    return out


def q_video_dedup(sf_dir: str):
    """Perceptual video near-dup CLUSTERS (rows-only): per-video
    majority-of-frame-phashes signature computed inside the stage
    (frames never leave it) → exact-class rep reduction →
    quarter-pigeonhole hamming → components → (video_id, cluster_id).
    The synthetic videos differ by per-id luminance offsets, so
    signature-equal classes occur naturally at every scale."""
    import pyarrow.parquet as pq

    from .media.image import video_near_dup
    from .synth.videos import video_dataset

    n = max(40, pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows // 2)
    out = video_near_dup(video_dataset(n, n_frames=8), every_n=2)
    return out.sort("video_id")


def q_sessions(sf_dir: str):
    """Gap-based sessionization of the events stream (30-min gap)."""
    from .ops.sessions import sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    out = sessionize(ds, gap_minutes=30.0)
    return out


def q_rolling_window(sf_dir: str):
    """Per-user rolling 1-hour windowed aggregate over the events
    stream (count + exact int64 sum of event_id)."""
    from .ops.temporal import rolling_window

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return rolling_window(ds, window_minutes=60.0)


HMEAN_SCALE = 1 << 40  # reciprocal quantization grid


def q_hmean(sf_dir: str):
    """Grouped harmonic mean of positive value-cents per event_type —
    the rate-averaging statistic, made deterministic by quantized
    reciprocals: r(v) = 2^40 // v is EXACT integer arithmetic (floor
    division, mirrored by HUGEINT // in the oracle), partial sums are
    exact ints at any block structure, and hmean = n·2^40 / Σr is ONE
    mirrored division. Error vs the true harmonic mean is < n·2^-40
    relative — deterministic, not stochastic (the approx_percentiles
    sketch discipline)."""
    from .ops.agg import grouped_sums_exact

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        keep = v > 0
        v = v[keep]
        et = b["event_type"].filter(pa.array(keep))
        r = HMEAN_SCALE // v
        return pa.table(
            {
                "event_type": et,
                "rsum": pa.array(r),
                "n": pa.array(np.ones(len(v), dtype=np.int64)),
            }
        )

    rows = grouped_sums_exact(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type"],
        sum_cols=["rsum", "n"],
    )
    rows = sorted(rows, key=lambda r: r["event_type"])
    ets = [r["event_type"] for r in rows]
    ns = [int(r["n"]) for r in rows]
    ss = [int(r["rsum"]) for r in rows]
    hm = [float(n * HMEAN_SCALE) / float(s) for n, s in zip(ns, ss)]
    return pa.table(
        {
            "event_type": pa.array(ets, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
            "rsum": pa.array(ss, type=pa.int64()),
            "hmean": pa.array(hm, type=pa.float64()),
        }
    )


RFM_TILES = 5


def q_rfm(sf_dir: str):
    """RFM segmentation — the classic user-value triage: per-user
    Recency (max event epoch-µs), Frequency (event count), Monetary
    (exact value-cents sum) reduced distributedly (per-batch Arrow
    max/count/sum partials; the user table is dimension-sized relative
    to the corpus — documented driver-finish contract), then three
    global ntile(5) ranks through the oracle-validated grouped_ntile
    fill (first n%b buckets get one extra row; (metric, user_id)
    totalizes order). rfm = 100·r + 10·f + m. All integers; no float
    anywhere."""
    from .ops.window import grouped_ntile

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": b["user_id"],
                "r": pc.cast(b["ts"], pa.int64()),
                "m": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
                "f": pa.array(np.ones(len(b), dtype=np.int64)),
            }
        )
        g = t.group_by(["user_id"], use_threads=False).aggregate(
            [("r", "max"), ("m", "sum"), ("f", "sum")]
        )
        return g.rename_columns(["user_id", "r", "m", "f"])

    parts = _collect(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
    )
    agg = parts.group_by(["user_id"], use_threads=False).aggregate(
        [("r", "max"), ("m", "sum"), ("f", "sum")]
    ).rename_columns(["user_id", "r_max", "m", "f"])
    agg = agg.append_column(
        "k", pa.array(np.zeros(len(agg), dtype=np.int64))
    )
    tiles = {}
    for metric, name in (
        ("r_max", "r_tile"), ("f", "f_tile"), ("m", "m_tile")
    ):
        t = grouped_ntile(agg, ["k"], [metric, "user_id"],
                          RFM_TILES, name)
        t = t if isinstance(t, pa.Table) else _collect(t)
        tiles[name] = {
            r["user_id"]: r[name] for r in t.to_pylist()
        }
    agg = agg.combine_chunks().sort_by([("user_id", "ascending")])
    uids = agg["user_id"].to_pylist()
    rt = np.array([tiles["r_tile"][u] for u in uids], dtype=np.int64)
    ft = np.array([tiles["f_tile"][u] for u in uids], dtype=np.int64)
    mt = np.array([tiles["m_tile"][u] for u in uids], dtype=np.int64)
    return pa.table(
        {
            "user_id": agg["user_id"],
            "r_max": agg["r_max"],
            "f": agg["f"],
            "m": agg["m"],
            "r_tile": pa.array(rt),
            "f_tile": pa.array(ft),
            "m_tile": pa.array(mt),
            "rfm": pa.array(rt * 100 + ft * 10 + mt),
        }
    )


_DAY_US = 86_400_000_000


def q_regression(sf_dir: str):
    """Per-event-type OLS trend of value-cents over calendar day —
    the drift monitor (is this signal creeping up?) of a curation
    pipeline, on the exact-integer-moment discipline
    (ops/stats.grouped_ols): x = epoch-days (µs // 86.4e9, exact floor
    division mirrored by DuckDB `//`), y = cents; five int64 moment
    partials per batch, Python-int driver merge, slope/intercept each
    ONE mirrored HUGEINT→DOUBLE division."""
    from .ops.stats import grouped_ols

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def derive(b: pa.Table) -> pa.Table:
        from .ops.temporal import _ts_i64

        x = _ts_i64(b["ts"]) // _DAY_US
        y = pc.cast(
            pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
        )
        return pa.table(
            {"event_type": b["event_type"], "x": pa.array(x), "y": y}
        )

    return grouped_ols(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "event_type", "x", "y",
    )


def q_autocorr(sf_dir: str):
    """Per-user lag-1 autocorrelation of value-cents in (ts, event_id)
    order (ops/temporal.grouped_autocorr): exact int64 pair moments
    per user — num/d1/d2 hash-compare as integers — and r is the
    kendall-validated IEEE dag num/sqrt(d1·d2)."""
    from .ops.temporal import grouped_autocorr

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    out = grouped_autocorr(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True)
    )
    out = out if isinstance(out, pa.Table) else _collect(out)
    return out.combine_chunks().sort_by([("user_id", "ascending")])


GMEAN_Q = 1 << 30  # qlog_floor grid (ops/infotheory exactness tool)


def q_geomean(sf_dir: str):
    """Grouped geometric mean of positive value-cents per event_type
    via the floor-quantized log: qlog_floor(v) = floor(ln(v)·2^30) is
    bit-exact libm↔DuckDB at any magnitude (ops/infotheory tool), the
    per-group Σqlog is an exact int64 (≤ n·35·2^30), and log_gmean is
    ONE mirrored division Σqlog / (n·2^30). Deterministic error vs
    the true log-mean < 2^-30 — the approx_percentiles sketch
    discipline, not a float accumulation."""
    from .ops.agg import grouped_sums_exact
    from .ops.infotheory import qlog_floor

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        keep = v > 0
        v = v[keep]
        return pa.table(
            {
                "event_type": b["event_type"].filter(pa.array(keep)),
                "q": pa.array(qlog_floor(v)),
            }
        )

    rows = grouped_sums_exact(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type"], sum_cols=["q"], count_col="n",
    )
    rows.sort(key=lambda r: r["event_type"])
    return pa.table(
        {
            "event_type": pa.array(
                [r["event_type"] for r in rows], type=pa.string()
            ),
            "n": pa.array([int(r["n"]) for r in rows], type=pa.int64()),
            "qlogsum": pa.array(
                [int(r["q"]) for r in rows], type=pa.int64()
            ),
            "log_gmean": pa.array(
                [
                    float(int(r["q"])) / float(int(r["n"]) * GMEAN_Q)
                    for r in rows
                ],
                type=pa.float64(),
            ),
        }
    )


SPATH_GAP_MIN = 360.0  # 6 h session gap (events avg ~2/user/day)
SPATH_MIN_COUNT = 5


def q_session_paths(sf_dir: str):
    """Frequent session event-type paths (ops/sessions.session_paths):
    6-hour-gap sessionization totalized by (ts, event_id), per-session
    ordered path concat built vectorized (ListArray offsets +
    binary_join), threshold-filtered counts — only paths with ≥ 5
    sessions reach the driver."""
    from .ops.sessions import session_paths

    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])
    return session_paths(
        ds, gap_minutes=SPATH_GAP_MIN, min_count=SPATH_MIN_COUNT
    )


DQ_VALUE_MAX = 400.0  # audit rule: plausible value ceiling


def q_dq_audit(sf_dir: str):
    """Data-quality audit — the constraint-validation report every
    ingestion pipeline runs before training: six declarative rules
    (null check, two range checks, FK orphan anti-join, PK uniqueness,
    cross-table date ordering) each reduced to an exact violation
    count; → (rule, violations), one row per rule. Zero-violation
    rules stay in the report (a disappeared rule is itself a bug).

    Scale shape: the three scan rules are per-batch counter partials
    (corpus never shuffles); fk_orphans rides the semi/anti broadcast
    plan (distinct key set moves once); dup_pk is count − exact
    distinct (pair-dedup partials); ship_before_order joins through
    the measured-size equi_join plan and counts per batch."""
    import pyarrow.parquet as pq

    from .ops.join import anti_join, equi_join

    counts: dict[str, int] = {}

    # -- scan rules -----------------------------------------------
    ev = _read(sf_dir, "events", ["value"])

    def ev_partial(b: pa.Table) -> pa.Table:
        col = b["value"]
        return pa.table(
            {
                "null_value": pa.array(
                    [int(col.null_count)], type=pa.int64()
                ),
                "value_range": pa.array(
                    [
                        int(
                            pc.sum(
                                pc.greater(col, DQ_VALUE_MAX)
                            ).as_py()
                            or 0
                        )
                    ],
                    type=pa.int64(),
                ),
            }
        )

    evt = _collect(
        ev.map_batches(ev_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
    )
    counts["null_value"] = int(pc.sum(evt["null_value"]).as_py() or 0)
    counts["value_range"] = int(pc.sum(evt["value_range"]).as_py() or 0)

    li = _read(sf_dir, "lineitem", ["l_quantity"])

    def li_partial(b: pa.Table) -> pa.Table:
        q = b["l_quantity"]
        bad = pc.or_(pc.less(q, 1.0), pc.greater(q, 50.0))
        return pa.table(
            {"qty_range": pa.array(
                [int(pc.sum(bad).as_py() or 0)], type=pa.int64()
            )}
        )

    lit = _collect(
        li.map_batches(li_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
    )
    counts["qty_range"] = int(pc.sum(lit["qty_range"]).as_py() or 0)

    # -- FK orphans: lineitem.l_orderkey ∉ orders ------------------
    lkeys = _read(sf_dir, "lineitem", ["l_orderkey"])
    okeys = _read(sf_dir, "orders", ["o_orderkey"])
    counts["fk_orphans"] = int(
        anti_join(lkeys, okeys, on="l_orderkey",
                  right_on="o_orderkey").count()
    )

    # -- PK uniqueness: orders.o_orderkey --------------------------
    from .ops.shuffle import hash_group_apply

    def dedup_batch(b: pa.Table) -> pa.Table:
        return b.group_by(["o_orderkey"], use_threads=False).aggregate([])

    def count_part(tbl, starts):
        k = len(starts) if tbl is not None else 0
        return pa.table({"n_distinct": pa.array([k], type=pa.int64())})

    import ray

    o_ds = _read(sf_dir, "orders", ["o_orderkey"])
    n_orders = int(o_ds.count())
    refs = hash_group_apply(
        o_ds.map_batches(dedup_batch, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["o_orderkey"], count_part, return_refs=True,
    )
    n_distinct = sum(
        int(t["n_distinct"][0].as_py())
        for t in ray.get(refs) if t is not None and t.num_rows
    )
    counts["dup_pk"] = n_orders - n_distinct

    # -- cross-table ordering: l_shipdate < o_orderdate ------------
    lship = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    n_ord = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n_ord <= 2_000_000:
        odates = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
        )
    else:
        odates = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    joined = equi_join(
        lship, odates, "l_orderkey", "o_orderkey", ["o_orderdate"]
    )

    def ship_partial(b: pa.Table) -> pa.Table:
        bad = pc.less(b["l_shipdate"], b["o_orderdate"])
        return pa.table(
            {"c": pa.array(
                [int(pc.sum(bad).as_py() or 0)], type=pa.int64()
            )}
        )

    st = _collect(
        joined.map_batches(ship_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    )
    counts["ship_before_order"] = int(pc.sum(st["c"]).as_py() or 0)

    rules = sorted(counts)
    return pa.table(
        {
            "rule": pa.array(rules, type=pa.string()),
            "violations": pa.array(
                [counts[r] for r in rules], type=pa.int64()
            ),
        }
    )


def q_link_pred(sf_dir: str):
    """Neighborhood-Jaccard link prediction
    (ops/graph.link_prediction) over the _tri_edge_ds synthetic graph:
    non-adjacent pairs with ≥2 common neighbors, scored
    common/(da+db−common). Counts exact; jaccard one mirrored
    division; degrees tag back through a candidate-set semi-join (the
    corpus-sized degree table is never collected)."""
    from .ops.graph import link_prediction

    return link_prediction(_tri_edge_ds(sf_dir), min_common=2)


RMED_WINDOW = 5  # rolling-median ROWS frame (4 preceding + current)


def q_rolling_median(sf_dir: str):
    """Per-user rolling 5-row median of value-cents in (ts, event_id)
    order (ops/window.grouped_rolling_median) — exact int medians /
    dyadic even-window halves, mirroring the SQL ROWS-frame
    quantile_cont(0.5) bit-for-bit."""
    from .ops.window import grouped_rolling_median

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return grouped_rolling_median(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "user_id", "ts", "event_id", "v", window=RMED_WINDOW,
    )


def q_ab_test(sf_dir: str):
    """Two-sample pooled t² per event_type (ops/stats.grouped_ttest):
    cohort = user_id % 2 (the deterministic A/B split), value-cents.
    t² = D²·(n0+n1−2)/((A·n0+B·n1)·(n0+n1)) — numerator and
    denominator exact integers, ONE mirrored division."""
    from .ops.stats import grouped_ttest

    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def derive(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy()
        return pa.table(
            {
                "event_type": b["event_type"],
                "cohort": pa.array((u % 2).astype(np.int64)),
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return grouped_ttest(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "event_type", "cohort", "v",
    )


def q_growth(sf_dir: str):
    """Day-over-day revenue growth per event_type: exact integer-cents
    daily sums (grouped_sums_exact — only ≤ types×days partial rows
    reach the driver), then growth = (rev − prev)/prev as one mirrored
    division per row over the tiny result; first day (or prev = 0) is
    null. Days are exact epoch-day integers → date32."""
    from .ops.agg import grouped_sums_exact
    from .ops.temporal import _ts_i64

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "day": pa.array(
                    (_ts_i64(b["ts"]) // _DAY_US).astype(np.int32)
                ),
                "rev": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    rows = grouped_sums_exact(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "day"], sum_cols=["rev"],
    )
    rows.sort(key=lambda r: (r["event_type"], r["day"]))
    ets = [r["event_type"] for r in rows]
    days = [int(r["day"]) for r in rows]
    revs = [int(r["rev"]) for r in rows]
    growth = []
    for i, (et, rev) in enumerate(zip(ets, revs)):
        if i > 0 and ets[i - 1] == et and revs[i - 1] != 0:
            growth.append(
                float(rev - revs[i - 1]) / float(revs[i - 1])
            )
        else:
            growth.append(None)
    return pa.table(
        {
            "event_type": pa.array(ets, type=pa.string()),
            "day": pa.array(
                np.asarray(days, dtype=np.int32), type=pa.date32()
            ),
            "rev": pa.array(revs, type=pa.int64()),
            "growth": pa.array(growth, type=pa.float64()),
        }
    )


EQ_CODES = 255  # int8 quantization grid (code = floor((v-min)·255/span))


def q_embed_quant(sf_dir: str):
    """Scalar int8-quantization audit of the embedding table — the
    pre-deployment check of a vector-index build: per dimension, the
    exact float min/max (order-independent selections) and the number
    of DISTINCT codes the dimension actually uses under
    code = min(floor((v−min)·255/(max−min)), 255). The code expression
    is a fixed IEEE dag mirrored token-for-token in SQL (float32 →
    float64 casts are exact); distinct counting rides
    grouped_distinct_count (per-batch pair dedup, one 16 B/row pair
    shuffle — the corpus never gathers)."""
    from .ops.curate import grouped_distinct_count

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def mat(b: pa.Table) -> np.ndarray:
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        width = len(col[0])
        return np.asarray(
            col.flatten(), dtype=np.float64
        ).reshape(-1, width)

    def minmax_part(b: pa.Table) -> pa.Table:
        E = mat(b)
        d = E.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "vmin": pa.array(E.min(axis=0)),
                "vmax": pa.array(E.max(axis=0)),
            }
        )

    mm = _collect(
        ds.map_batches(minmax_part, batch_format="pyarrow",
                       zero_copy_batch=True)
    )
    g = mm.group_by(["dim"], use_threads=False).aggregate(
        [("vmin", "min"), ("vmax", "max")]
    ).rename_columns(["dim", "vmin", "vmax"]).sort_by("dim")
    mn = g["vmin"].to_numpy()
    mx = g["vmax"].to_numpy()
    if not (mx > mn).all():
        raise AssertionError(
            "embed_quant: constant dimension (vmax == vmin) — the "
            "quantizer span is zero"
        )

    def codes_part(b: pa.Table) -> pa.Table:
        E = mat(b)
        c = np.minimum(
            np.floor((E - mn) * 255.0 / (mx - mn)), float(EQ_CODES)
        ).astype(np.int64)
        d = E.shape[1]
        t = pa.table(
            {
                "dim": pa.array(
                    np.tile(np.arange(1, d + 1, dtype=np.int64),
                            E.shape[0])
                ),
                "code": pa.array(c.ravel()),
            }
        )
        return t.group_by(["dim", "code"], use_threads=False).aggregate([])

    pairs = ds.map_batches(
        codes_part, batch_format="pyarrow", zero_copy_batch=True
    )
    nc = grouped_distinct_count(pairs, "dim", "code",
                                count_col="n_codes")
    assert nc["dim"].to_pylist() == g["dim"].to_pylist()
    return pa.table(
        {
            "dim": g["dim"],
            "vmin": g["vmin"],
            "vmax": g["vmax"],
            "n_codes": nc["n_codes"],
        }
    )


NB_ALPHA = 1  # Laplace pseudo-count of the NB model


def q_nb_train(sf_dir: str):
    """Multinomial Naive Bayes training over documents (class = lang,
    whitespace tokens): per (lang, token) exact count + quantized
    Laplace log-likelihood qlog(c+1) − qlog(N_lang + V)
    (text/nb.naive_bayes_train; floor-quantized logs are bit-exact
    libm↔DuckDB at any magnitude). The model table stays distributed;
    the driver holds only per-class totals and V partials."""
    from .text.nb import naive_bayes_train

    return naive_bayes_train(
        _read(sf_dir, "documents", ["lang", "text"]),
        "lang", "text", alpha=NB_ALPHA,
    )


def q_session_len_pct(sf_dir: str):
    """Session-duration percentiles — sessionize (30-min gap) composed
    into the exact distributed quantile machinery: duration = exact
    µs int per session, global p50/p90/p99 with quantile_disc
    ceil-index semantics (grouped_quantiles, constant key)."""
    from .ops.curate import grouped_quantiles
    from .ops.sessions import sessionize
    from .ops.temporal import _ts_i64

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    sess = sessionize(ds, gap_minutes=30.0)

    def dur(b: pa.Table) -> pa.Table:
        d = _ts_i64(b["session_end"]) - _ts_i64(b["session_start"])
        return pa.table(
            {
                "k": pa.array(np.zeros(len(b), dtype=np.int64)),
                "dur": pa.array(d.astype(np.int64)),
            }
        )

    out = grouped_quantiles(
        sess.map_batches(dur, batch_format="pyarrow",
                         zero_copy_batch=True),
        "k", "dur",
        qs=((1, 2), (9, 10), (99, 100)),
        q_names=("p50", "p90", "p99"),
        final="driver",
    )
    return out.select(["n", "p50", "p90", "p99"])


def q_rolling_channel(sf_dir: str):
    """Per-user rolling 5-row min/max envelope of value-cents in
    (ts, event_id) order (ops/window.grouped_rolling_minmax) — pure
    integer selections, SQL ROWS-frame min/max parity."""
    from .ops.window import grouped_rolling_minmax

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return grouped_rolling_minmax(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "user_id", "ts", "event_id", "v", window=RMED_WINDOW,
    )


def q_top2_share(sf_dir: str):
    """Revenue concentration: the top-2 users' share of each
    event_type's exact integer revenue — (type, user) sums through
    one keyed exchange (grouped_sum_count shuffle-final), then a
    per-type vectorized (v DESC, user ASC) top-2 + total inside the
    partition; share is ONE mirrored division."""
    import ray

    from .ops.agg import grouped_sum_count
    from .ops.shuffle import hash_group_apply

    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "user_id": b["user_id"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    uv = grouped_sum_count(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "user_id"], sum_cols=["v"], final="shuffle",
    )

    _SCHEMA = pa.schema(
        [
            ("event_type", pa.string()),
            ("top_user1", pa.int64()),
            ("top_user2", pa.int64()),
            ("top2_rev", pa.int64()),
            ("total_rev", pa.int64()),
            ("share", pa.float64()),
        ]
    )

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            return _SCHEMA.empty_table()
        starts = np.asarray(starts, dtype=np.int64)
        bounds_ = np.append(starts, tbl.num_rows)
        v_all = tbl["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        u_all = tbl["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ets, u1s, u2s, t2s, tots, shares = [], [], [], [], [], []
        for g in range(len(starts)):
            s, e = bounds_[g], bounds_[g + 1]
            v, u = v_all[s:e], u_all[s:e]
            order = np.lexsort((u, -v))
            tot = int(v.sum())
            t1 = int(v[order[0]])
            t2 = int(v[order[1]]) if len(order) > 1 else 0
            ets.append(tbl["event_type"][int(s)].as_py())
            u1s.append(int(u[order[0]]))
            u2s.append(int(u[order[1]]) if len(order) > 1 else None)
            t2s.append(t1 + t2)
            tots.append(tot)
            shares.append(float(t1 + t2) / float(tot))
        return pa.table(
            {
                "event_type": pa.array(ets, type=pa.string()),
                "top_user1": pa.array(u1s, type=pa.int64()),
                "top_user2": pa.array(u2s, type=pa.int64()),
                "top2_rev": pa.array(t2s, type=pa.int64()),
                "total_rev": pa.array(tots, type=pa.int64()),
                "share": pa.array(shares, type=pa.float64()),
            }
        )

    out = hash_group_apply(uv, ["event_type"], part)
    tabs = [
        t for t in ray.get(out.materialize().to_arrow_refs())
        if t.num_rows
    ]
    return pa.concat_tables(tabs).combine_chunks().sort_by(
        "event_type"
    )


def _weighted_edge_ds(sf_dir: str):
    """The _tri_edge_ds synthetic graph with deterministic positive
    weights w = (u·13 + v·7) mod 997 + 1 (ties abound — exercises the
    (w, u, v) total-order tie-break)."""
    base = _tri_edge_ds(sf_dir)

    def weigh(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy()
        v = b["v"].to_numpy()
        return pa.table(
            {
                "u": b["u"],
                "v": b["v"],
                "w": pa.array(((u * 13 + v * 7) % 997 + 1)
                              .astype(np.int64)),
            }
        )

    return base.map_batches(weigh, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_mst(sf_dir: str):
    """Minimum spanning forest of the weighted synthetic graph
    (ops/graph.msf_boruvka — distributed Borůvka: per-component min
    edge election, CC contraction, ≤ log n BSP rounds). The forest is
    UNIQUE under the (w, u, v) total order; rows-only at the driver,
    brute-Kruskal-pinned in tests/test_msf.py and the sf0.001 e2e."""
    from .ops.graph import msf_boruvka

    return msf_boruvka(_weighted_edge_ds(sf_dir))


def q_pow2_hist(sf_dir: str):
    """Power-of-two (latency-style) histogram of value-cents per
    event_type: bucket = floor(log2(v)) computed EXACTLY via
    ``np.frexp`` exponents (no float-log rounding step); zero-cent
    rows land in bucket −1 (frexp(0) exponent is 0 → −1, matching the
    SQL CASE). Exact per-bucket counts + sums from per-batch
    partials. SQL mirror: length(bin(v)) − 1 — pure string/bit
    algebra, no ln anywhere."""
    from .ops.agg import grouped_sum_count

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
        ).to_numpy()
        _, e = np.frexp(v.astype(np.float64))
        return pa.table(
            {
                "event_type": b["event_type"],
                "bucket": pa.array((e - 1).astype(np.int64)),
                "v": pa.array(v),
            }
        )

    out = grouped_sum_count(
        ds.map_batches(bucket, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "bucket"], sum_cols=["v"], count_col="n",
        final="driver",
    )
    return out.combine_chunks().sort_by(
        [("event_type", "ascending"), ("bucket", "ascending")]
    ).select(["event_type", "bucket", "n", "v"])


CONCUR_WIN_US = 300_000_000  # each event holds a 5-minute session


def q_peak_concurrency(sf_dir: str):
    """Peak simultaneous open sessions per event_type
    (ops/temporal.peak_concurrency): every event opens a 5-minute
    half-open interval; +1/−1 sweep with the −1-first tie rule,
    exact depth cumsum, earliest peak timestamp (µs)."""
    from .ops.temporal import _ts_i64, peak_concurrency

    ds = _read(sf_dir, "events", ["event_type", "event_id", "ts"])

    def derive(b: pa.Table) -> pa.Table:
        t = _ts_i64(b["ts"])
        return pa.table(
            {
                "event_type": b["event_type"],
                "s": pa.array(t),
                "e": pa.array(t + CONCUR_WIN_US),
                "event_id": b["event_id"],
            }
        )

    return peak_concurrency(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "event_type", "s", "e", "event_id",
    )


def q_user_growth(sf_dir: str):
    """Cumulative distinct-user growth curve: each user's FIRST
    active day (per-batch min partials, one user-keyed exchange —
    disjoint per-partition day counts), then the tiny per-day
    (new_users, cum_users) table with an exact driver cumsum."""
    import ray

    from .ops.shuffle import hash_group_apply
    from .ops.temporal import _ts_i64

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": b["user_id"],
                "day": pa.array(
                    (_ts_i64(b["ts"]) // _DAY_US).astype(np.int64)
                ),
            }
        )
        g = t.group_by(["user_id"], use_threads=False).aggregate(
            [("day", "min")]
        )
        return g.rename_columns(["user_id", "day"])

    pruned = ds.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True)

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        schema = pa.schema(
            [("day", pa.int64()), ("new_users", pa.int64())]
        )
        if tbl is None or tbl.num_rows == 0:
            return schema.empty_table()
        starts = np.asarray(starts, dtype=np.int64)
        d = tbl["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        firsts = np.minimum.reduceat(d, starts)
        ud, cnt = np.unique(firsts, return_counts=True)
        return pa.table(
            {
                "day": pa.array(ud),
                "new_users": pa.array(cnt.astype(np.int64)),
            }
        )

    parts = hash_group_apply(pruned, ["user_id"], part)
    tabs = [
        t for t in ray.get(parts.materialize().to_arrow_refs())
        if t.num_rows
    ]
    merged = pa.concat_tables(tabs).group_by(
        ["day"], use_threads=False
    ).aggregate([("new_users", "sum")]).rename_columns(
        ["day", "new_users"]
    ).sort_by("day")
    nu = merged["new_users"].to_numpy()
    return pa.table(
        {
            "day": pc.cast(
                pc.cast(merged["day"], pa.int32()), pa.date32()
            ),
            "new_users": merged["new_users"],
            "cum_users": pa.array(np.cumsum(nu).astype(np.int64)),
        }
    )


def q_district_image_quality(sf_dir: str):
    """Image-corpus → spatial-join → quality-aggregate composite (the
    north-star DAG with a real decode stage): ONE decode pass per
    batch computes both the total-variation sharpness AND the
    phash-derived point (payload bytes never leave the stage), assign
    carries sharpness through the broadcast STRtree PIP join, and
    per-district exact (n_images, total_sharp) comes out of integer
    partials. Oracle = sharpness-by-base × bit-exact phash→xy ×
    rect districts — the composition is value-exact end to end."""
    import pyarrow.parquet as pq

    from .media.image import _same_shape_raw, decode_raw_batch
    from .ops.agg import grouped_sums_exact
    from .ops.assign import assign
    from .synth.images import image_dataset, phash_xy

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    images = image_dataset(n=n, png_every=3)

    def derive(batch: pa.Table) -> pa.Table:
        imgs = _same_shape_raw(batch)
        if imgs is not None:
            g = imgs.astype(np.int64).sum(axis=3)
            s = np.abs(np.diff(g, axis=2)).sum(axis=(1, 2))
            s += np.abs(np.diff(g, axis=1)).sum(axis=(1, 2))
        else:
            vals = []
            for im in decode_raw_batch(batch):
                g = im.astype(np.int64).sum(axis=2)
                vals.append(
                    int(np.abs(np.diff(g, axis=1)).sum())
                    + int(np.abs(np.diff(g, axis=0)).sum())
                )
            s = np.asarray(vals, dtype=np.int64)
        x, y = phash_xy(batch["phash"].to_numpy())
        return pa.table(
            {
                "image_id": batch["image_id"],
                "x": pa.array(x),
                "y": pa.array(y),
                "sharpness": pa.array(s.astype(np.int64)),
            }
        )

    pts = images.map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
    assigned = assign(
        pts,
        _districts(),
        source_id_col="image_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        keep_cols=("sharpness",),
    )
    rows = grouped_sums_exact(
        assigned, ["district_id"], sum_cols=["sharpness"],
        count_col="n_images",
    )
    rows.sort(key=lambda r: int(r["district_id"]))
    return pa.table(
        {
            "district_id": pa.array(
                [int(r["district_id"]) for r in rows], type=pa.int64()
            ),
            "n_images": pa.array(
                [int(r["n_images"]) for r in rows], type=pa.int64()
            ),
            "total_sharp": pa.array(
                [int(r["sharpness"]) for r in rows], type=pa.int64()
            ),
        }
    )


def q_quarantine(sf_dir: str):
    """Row-level DQ routing (the quarantine half of dq_audit): every
    event failing a rule emits (event_id, rule) — value_range
    (> {DQ_VALUE_MAX}), micro_value (< 1.00), weekend (epoch-day
    % 7 ∈ {{5, 6}}); a row can fail several rules. One stateless
    vectorized pass; mirrored by a UNION ALL of rule selects."""
    from .ops.temporal import _ts_i64

    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def route(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy()
        v = b["value"].to_numpy(zero_copy_only=False)
        day = _ts_i64(b["ts"]) // _DAY_US
        ids, rules = [], []
        for rule, mask in (
            ("value_range", v > DQ_VALUE_MAX),
            ("micro_value", v < 1.0),
            ("weekend", (day % 7) >= 5),
        ):
            sel = eid[mask]
            ids.append(sel)
            rules.append(np.full(len(sel), rule, dtype=object))
        return pa.table(
            {
                "event_id": pa.array(
                    np.concatenate(ids).astype(np.int64)
                ),
                "rule": pa.array(
                    np.concatenate(rules), type=pa.string()
                ),
            }
        )

    return ds.map_batches(
        route, batch_format="pyarrow", zero_copy_batch=True
    )


def q_transition_support(sf_dir: str):
    """Sequence-mining support of first-order transitions: how many
    DISTINCT users exhibit each consecutive (src, dst) event-type
    pair (ops/temporal.transition_counts distinct_keys=True — the
    per-partition (user, src, dst) dedup is global because a user's
    sequence is colocated)."""
    from .ops.temporal import transition_counts

    return transition_counts(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"]),
        distinct_keys=True,
    )


def q_powerlaw(sf_dir: str):
    """Power-law fit of the basket-size distribution: OLS of
    qlog(n_orders) on qlog(n_items) over the histogram rows (both
    floor-quantized logs — bit-exact libm↔DuckDB), integer OLS
    identity (trend discipline), slope/icept as the two mirrored
    divisions. The slope/2^0 is the log-log elasticity; quantization
    scales cancel in the slope."""
    from .ops.infotheory import qlog_floor

    hist = q_basket_hist(sf_dir)
    x = qlog_floor(hist["n_items"].to_numpy().astype(np.int64))
    y = qlog_floor(hist["n_orders"].to_numpy().astype(np.int64))
    n = len(x)
    sx = sum(int(v) for v in x)
    sy = sum(int(v) for v in y)
    sxy = sum(int(a) * int(b) for a, b in zip(x, y))
    sxx = sum(int(v) ** 2 for v in x)
    den = n * sxx - sx * sx
    slope = float(n * sxy - sx * sy) / float(den)
    icept = float(sy * sxx - sx * sxy) / float(den)
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "slope": pa.array([slope], type=pa.float64()),
            "icept": pa.array([icept], type=pa.float64()),
        }
    )


def q_gini_splits(sf_dir: str):
    """Decision-tree split scan (ops/stats.gini_split_scan): for
    every candidate threshold of value-cents per event_type, the
    exact scaled Gini numerators of both sides against the A/B label
    (user_id % 2) — integer-only; the argmin is the consumer's."""
    from .ops.stats import gini_split_scan

    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def derive(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy()
        return pa.table(
            {
                "event_type": b["event_type"],
                "y": pa.array((u % 2).astype(np.int64)),
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return gini_split_scan(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "event_type", "y", "v",
    )


def q_revenue_deciles(sf_dir: str):
    """Lorenz-style decile shares: value-cents rank-bucketed into 10
    ntile groups per event_type ((v, event_id) total order, standard
    SQL ntile fill — ops/window.grouped_ntile), then exact per-decile
    count + revenue (grouped_sums_exact partials)."""
    from .ops.agg import grouped_sums_exact
    from .ops.window import grouped_ntile

    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "event_id": b["event_id"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    tiled = grouped_ntile(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type"], ["v", "event_id"], 10, tile_name="decile",
    )
    rows = grouped_sums_exact(
        tiled, ["event_type", "decile"], sum_cols=["v"], count_col="n"
    )
    rows.sort(key=lambda r: (r["event_type"], int(r["decile"])))
    return pa.table(
        {
            "event_type": pa.array(
                [r["event_type"] for r in rows], type=pa.string()
            ),
            "decile": pa.array(
                [int(r["decile"]) for r in rows], type=pa.int64()
            ),
            "n": pa.array([int(r["n"]) for r in rows],
                          type=pa.int64()),
            "rev": pa.array([int(r["v"]) for r in rows],
                            type=pa.int64()),
        }
    )


def q_district_dispersion(sf_dir: str):
    """Spatial-join → statistics composition: assign points to
    districts (the engine's flagship op), then per-district EXACT
    point dispersion — n, vx_num = n·Σx²−(Σx)², vy_num likewise
    (coordinates are half-integers: 2x is integer, so moments of 2x
    are exact ints; the ×4 scaling cancels in nothing and is kept —
    documented in the SQL mirror), and mean squared distance from the
    centroid r2_mean = (vx_num+vy_num)/(4·n²) as ONE mirrored
    division."""
    from .ops.agg import grouped_sums_exact
    from .ops.assign import assign

    pts = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_points, batch_format="pyarrow", zero_copy_batch=True
    )
    out = assign(
        pts,
        _districts(),
        source_id_col="doc_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        keep_cols=("x", "y"),
        concurrency=8,
    )

    def moments(b: pa.Table) -> pa.Table:
        # 2x, 2y are exact ints (points sit at +0.5 offsets)
        x2 = np.round(b["x"].to_numpy() * 2.0).astype(np.int64)
        y2 = np.round(b["y"].to_numpy() * 2.0).astype(np.int64)
        return pa.table(
            {
                "district_id": b["district_id"],
                "sx": pa.array(x2),
                "sxx": pa.array(x2 * x2),
                "sy": pa.array(y2),
                "syy": pa.array(y2 * y2),
            }
        )

    rows = grouped_sums_exact(
        out.map_batches(moments, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["district_id"], sum_cols=["sx", "sxx", "sy", "syy"],
        count_col="n",
    )
    rows.sort(key=lambda r: r["district_id"])
    ids = [int(r["district_id"]) for r in rows]
    ns = [int(r["n"]) for r in rows]
    vx = [
        int(r["n"]) * int(r["sxx"]) - int(r["sx"]) ** 2 for r in rows
    ]
    vy = [
        int(r["n"]) * int(r["syy"]) - int(r["sy"]) ** 2 for r in rows
    ]
    r2 = [
        float(a + b_) / float(4 * n * n)
        for a, b_, n in zip(vx, vy, ns)
    ]
    for v in vx + vy:
        assert 0 <= v < (1 << 63), "dispersion numerator overflow"
    return pa.table(
        {
            "district_id": pa.array(ids, type=pa.int64()),
            "n": pa.array(ns, type=pa.int64()),
            "vx_num": pa.array(vx, type=pa.int64()),
            "vy_num": pa.array(vy, type=pa.int64()),
            "r2_mean": pa.array(r2, type=pa.float64()),
        }
    )


WINBACK_DAYS = 3  # dormancy threshold (events are day-dense; max observed gap is 3-4)


def q_winback(sf_dir: str):
    """Win-back detection per user over the events stream: the FIRST
    activity gap ≥ {WINBACK_DAYS} distinct-active-days apart →
    (user_id, dormant_day, react_day, gap_days). One user-keyed
    exchange of deduped (user, day) pairs, vectorized first-hit scan
    per partition."""
    from .ops.shuffle import hash_group_apply
    from .ops.temporal import _ts_i64

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def derive(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": b["user_id"],
                "day": pa.array(
                    (_ts_i64(b["ts"]) // _DAY_US).astype(np.int64)
                ),
            }
        )
        return t.group_by(["user_id", "day"],
                          use_threads=False).aggregate([])

    _SCHEMA = pa.schema(
        [
            ("user_id", pa.int64()),
            ("dormant_day", pa.date32()),
            ("react_day", pa.date32()),
            ("gap_days", pa.int64()),
        ]
    )

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            return _SCHEMA.empty_table()
        n = tbl.num_rows
        starts = np.asarray(starts, dtype=np.int64)
        sizes = np.diff(np.append(starts, n))
        gidx = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        d = tbl["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (gidx[1:] == gidx[:-1]) & (d[1:] == d[:-1])
        keep = ~dup
        d, gidx = d[keep], gidx[keep]
        kept_rows = np.flatnonzero(keep)
        gap_ok = np.zeros(len(d), dtype=bool)
        gap_ok[1:] = (gidx[1:] == gidx[:-1]) & (
            d[1:] - d[:-1] >= WINBACK_DAYS
        )
        hits = np.flatnonzero(gap_ok)
        if len(hits) == 0:
            return _SCHEMA.empty_table()
        # earliest hit per group
        hg = gidx[hits]
        first_of_g = np.flatnonzero(
            np.r_[True, hg[1:] != hg[:-1]]
        )
        hits = hits[first_of_g]
        return pa.table(
            {
                "user_id": tbl["user_id"].take(
                    pa.array(kept_rows[hits])
                ),
                "dormant_day": pa.array(
                    (d[hits - 1]).astype(np.int32), type=pa.date32()
                ),
                "react_day": pa.array(
                    d[hits].astype(np.int32), type=pa.date32()
                ),
                "gap_days": pa.array(d[hits] - d[hits - 1]),
            }
        )

    return hash_group_apply(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], part, sort_cols=("day",),
    )


def _donut_districts() -> pa.Table:
    """The BSP districts with a centered rectangular hole punched out
    of each (hole = middle half by integer quarter-offsets) — the
    polygon-WITH-INTERIOR-RING fixture that forces the assign path
    through real even-odd PIP instead of bbox shortcuts."""
    from .geom.wkb import encode_polygon

    r = bsp_rects(N_DISTRICTS)
    geoms = []
    for minx, miny, maxx, maxy in r:
        qx = (maxx - minx) // 4
        qy = (maxy - miny) // 4
        outer = np.array(
            [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]],
            dtype=np.float64,
        )
        hole = np.array(
            [
                [minx + qx, miny + qy],
                [minx + qx, maxy - qy],
                [maxx - qx, maxy - qy],
                [maxx - qx, miny + qy],
            ],
            dtype=np.float64,
        )
        geoms.append(encode_polygon([outer, hole]))
    return pa.table(
        {
            "district_id": pa.array(
                np.arange(len(r)), type=pa.int64()
            ),
            "geometry": pa.array(geoms, type=pa.binary()),
        }
    )


def q_assign_donut(sf_dir: str):
    """Point-in-donut-district assignment: districts with centered
    rectangular holes (interior rings), points in a hole get null and
    are dropped — exercises exact even-odd PIP on multi-ring polygons
    under a SQL oracle (outer-box AND NOT hole-box; points are
    half-integer so no boundary cases)."""
    from .ops.assign import assign

    pts = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_points, batch_format="pyarrow", zero_copy_batch=True
    )
    out = assign(
        pts,
        _donut_districts(),
        source_id_col="doc_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        concurrency=8,
    )

    def drop_null(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b["district_id"]))

    return out.select_columns(["doc_id", "district_id"]).map_batches(
        drop_null, batch_format="pyarrow", zero_copy_batch=True
    )


CHAIN_BLOCK = 100  # components query: chain blocks of 100 doc_ids


def q_components(sf_dir: str):
    """Connected components over the block-chain synthetic graph
    (edges i→i+1 and i→i+2 within each block of {CHAIN_BLOCK} ids):
    (node, component) with component = min reachable node
    (text/cluster.connected_components BSP min-label propagation) —
    mirrored by a recursive-CTE closure."""
    import pyarrow.parquet as pq

    from .text.cluster import connected_components

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy()
        u1 = i[(i % CHAIN_BLOCK != CHAIN_BLOCK - 1) & (i + 1 < n_docs)]
        u2 = i[(i % CHAIN_BLOCK < CHAIN_BLOCK - 2) & (i + 2 < n_docs)]
        return pa.table(
            {
                "a": pa.array(
                    np.concatenate([u1, u2]).astype(np.int64)
                ),
                "b": pa.array(
                    np.concatenate([u1 + 1, u2 + 2]).astype(np.int64)
                ),
            }
        )

    e = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        edges, batch_format="pyarrow", zero_copy_batch=True
    )
    return connected_components(e)


def q_reorder_gaps(sf_dir: str):
    """Per-customer median reorder interval (ops/temporal.gap_median):
    distinct order days per customer, consecutive-day gaps, exact
    quantile_disc median — customers with < 2 distinct days emit
    nothing."""
    from .ops.temporal import _ts_i64, gap_median

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "day": pa.array(
                    (_ts_i64(b["o_orderdate"]) // _DAY_US).astype(
                        np.int64
                    )
                ),
            }
        )

    return gap_median(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "o_custkey", "day",
    )


def q_mannwhitney(sf_dir: str):
    """Exact Mann–Whitney U between the deterministic A/B cohorts
    (user_id % 2) over value-cents (ops/stats.mannwhitney_u):
    midrank tie handling kept integer as u2 = 2·U1, one mirrored
    halving for u."""
    from .ops.stats import mannwhitney_u

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def derive(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy()
        return pa.table(
            {
                "side": pa.array((u % 2).astype(np.int64)),
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return mannwhitney_u(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "side", "v",
    )


def q_basket_hist(sf_dir: str):
    """Basket-size distribution: lineitems per order histogram —
    ONE orderkey-keyed exchange of per-batch (orderkey, count)
    partials (grouped_sum_count shuffle-final), then tiny (n_items,
    n_orders) histogram partials to the driver; the order table
    itself never gathers."""
    from .ops.agg import grouped_sum_count

    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    per_order = grouped_sum_count(
        ds, ["l_orderkey"], count_col="n_items", final="shuffle"
    )

    def hist_part(b: pa.Table) -> pa.Table:
        g = b.group_by(["n_items"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["n_items", "n_orders"])

    hist = grouped_sum_count(
        per_order.map_batches(hist_part, batch_format="pyarrow",
                              zero_copy_batch=True),
        ["n_items"], sum_cols=["n_orders"], final="driver",
    )
    return hist.combine_chunks().sort_by("n_items").select(
        ["n_items", "n_orders"]
    )


ZORD_RES = 10  # 2^10 cells/axis: cell width = EXTENT >> 10 = 1024
ZORD_PARTS = 32


def q_zorder_parts(sf_dir: str):
    """Balanced Z-order range-partition manifest of the doc-derived
    point cloud (ops/tiling.zorder_partition): Morton keys at res
    {ZORD_RES}, exact equal-count cut into {ZORD_PARTS} ranges via
    the engine's one legitimate total-order sort
    (global_row_number), per-partition (n, min/max key) manifest."""
    from .ops.tiling import zorder_partition

    pts = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_points, batch_format="pyarrow", zero_copy_batch=True
    )
    return zorder_partition(
        pts, "doc_id", res=ZORD_RES, n_parts=ZORD_PARTS,
        extent=float(EXTENT),
    )


def q_ks_test(sf_dir: str):
    """Exact two-sample KS drift statistic (ops/stats.ks_2samp):
    n_chars of even vs odd doc_ids — integer supremum numerator over
    the distinct-value grid, ONE mirrored division for d."""
    from .ops.stats import ks_2samp

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def derive(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        return pa.table(
            {
                "side": pa.array((d % 2).astype(np.int64)),
                "v": b["n_chars"],
            }
        )

    return ks_2samp(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "side", "v",
    )


def q_focal_stats(sf_dir: str):
    """3×3 focal sum over the district coverage mask
    (ops/raster.focal_sum): mask = cells with ≥ half coverage at
    MORPH_RES, cell value = (cx·7 + cy·13) % 100 (the zonal synthetic
    surface) — per present cell the present-neighbor sum and count,
    pure integer algebra mirrored by a 9-offset SQL self-join."""
    from .ops.raster import focal_sum, rasterize

    ras = rasterize(
        _districts(), (0.0, 0.0, float(EXTENT)), MORPH_RES,
        id_col="district_id",
    )
    cell = float(EXTENT) / float(1 << MORPH_RES)
    half = 0.5 * cell * cell
    mask = ras.filter(pc.greater_equal(ras["coverage_area"], half))
    cx = mask["cx"].to_numpy()
    cy = mask["cy"].to_numpy()
    mask = mask.append_column(
        "v", pa.array((cx * 7 + cy * 13) % 100, type=pa.int64())
    )
    return focal_sum(mask, id_col="district_id").sort_by(
        [("district_id", "ascending"), ("cx", "ascending"),
         ("cy", "ascending")]
    )


def q_max_drawdown(sf_dir: str):
    """Per-user maximum drawdown of value-cents in (ts, event_id)
    order (ops/window.grouped_max_drawdown): running-peak minus
    current, max per user with the earliest trough timestamp — exact
    ints, one keyed exchange, additive-shift vectorized cummax."""
    from .ops.window import grouped_max_drawdown

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return grouped_max_drawdown(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "user_id", "ts", "event_id", "v",
    )


def q_theil_sen(sf_dir: str):
    """Theil–Sen robust slope of daily revenue per event_type
    (ops/stats.theil_sen): median of floor-quantized pairwise slopes
    floor(Δcents·2^30/Δday) — exact integer selection, quantile_disc
    semantics; the SQL mirror floor-corrects DuckDB's truncating //."""
    from .ops.stats import theil_sen
    from .ops.temporal import _ts_i64

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "day": pa.array(
                    (_ts_i64(b["ts"]) // _DAY_US).astype(np.int64)
                ),
                "rev": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return theil_sen(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "event_type", "day", "rev",
    )


def q_dow_profile(sf_dir: str):
    """Day-of-week seasonality profile per event_type: for each
    (event_type, dow) the day count, exact total revenue-cents, and
    the peak deviation day — max |v_d·n_dow − S_dow| (the residual
    from the dow mean, scaled integer-exact by n_dow), earliest day
    on ties. One grouped_sums_exact pass (≤ types×days partials);
    the dow fold runs on the driver in Python ints."""
    from .ops.agg import grouped_sums_exact
    from .ops.temporal import _ts_i64

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "day": pa.array(
                    (_ts_i64(b["ts"]) // _DAY_US).astype(np.int32)
                ),
                "rev": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    rows = grouped_sums_exact(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "day"], sum_cols=["rev"],
    )
    # fold into (event_type, dow) groups; epoch day 0 is a Thursday
    # but the raw day % 7 class is what the SQL mirrors (dayofweek
    # conventions vary; the class label is what matters)
    from collections import defaultdict

    groups: dict = defaultdict(list)
    for r in rows:
        groups[(r["event_type"], int(r["day"]) % 7)].append(
            (int(r["day"]), int(r["rev"]))
        )
    ets, dows, nds, tots, pdays, pdevs = [], [], [], [], [], []
    for (et, dow) in sorted(groups):
        g = sorted(groups[(et, dow)])
        n = len(g)
        S = sum(v for _, v in g)
        best, bd = -1, None
        for d, v in g:
            dev = abs(v * n - S)
            if dev > best:
                best, bd = dev, d
        ets.append(et)
        dows.append(dow)
        nds.append(n)
        tots.append(S)
        pdays.append(bd)
        pdevs.append(best)
    return pa.table(
        {
            "event_type": pa.array(ets, type=pa.string()),
            "dow": pa.array(dows, type=pa.int64()),
            "n_days": pa.array(nds, type=pa.int64()),
            "rev": pa.array(tots, type=pa.int64()),
            "peak_day": pa.array(
                np.asarray(pdays, dtype=np.int32), type=pa.date32()
            ),
            "peak_dev": pa.array(pdevs, type=pa.int64()),
        }
    )


def q_benford(sf_dir: str):
    """Benford first-digit census of order totals (cents) — the
    classic fraud/DQ screen: per leading digit the exact count and
    sum. The digit is extracted from the decimal string (Arrow cast +
    utf8 slice — no float log10 step); integer-cents are positive so
    no sign handling."""
    from .ops.agg import grouped_sum_count

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def digit(b: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
        )
        d = pc.cast(
            pc.utf8_slice_codeunits(
                pc.cast(v, pa.string()), 0, 1
            ),
            pa.int64(),
        )
        return pa.table({"digit": d, "v": v})

    out = grouped_sum_count(
        ds.map_batches(digit, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["digit"], sum_cols=["v"], count_col="n", final="driver",
    )
    return out.combine_chunks().sort_by("digit").select(
        ["digit", "n", "v"]
    )


def q_nb_classify(sf_dir: str):
    """Train-then-score composition: the NB model from q_nb_train
    applied back to the corpus (text/nb.naive_bayes_classify) —
    per document the argmax-class and its exact int64 quantized
    log-likelihood score; ties break to the lexicographically
    smallest class (mirrored by min(lang)-over-max-score SQL)."""
    from .text.nb import naive_bayes_classify, naive_bayes_train

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    model, meta = naive_bayes_train(
        docs, "lang", "text", alpha=NB_ALPHA, with_meta=True
    )
    return naive_bayes_classify(
        docs, model, meta["qden"], alpha=NB_ALPHA,
        id_col="doc_id", text_col="text", class_col="lang",
    )


MORPH_RES = 6  # 64×64 grid: district interiors survive the opening


def q_raster_open(sf_dir: str):
    """Morphological opening of the district coverage mask
    (ops/raster.morphology): rasterize at res MORPH_RES, keep
    cells with ≥ half coverage, erode then dilate with the
    4-neighbourhood cross — pure integer set algebra, exact."""
    from .ops.raster import morphology, rasterize

    ras = rasterize(
        _districts(), (0.0, 0.0, float(EXTENT)), MORPH_RES,
        id_col="district_id",
    )
    cell = float(EXTENT) / float(1 << MORPH_RES)
    half = 0.5 * cell * cell
    mask = ras.filter(pc.greater_equal(ras["coverage_area"], half))
    return morphology(mask, MORPH_RES, op="open",
                      id_col="district_id").sort_by(
        [("district_id", "ascending"), ("cx", "ascending"),
         ("cy", "ascending")]
    )


def q_iqr_outliers(sf_dir: str):
    """Tukey-fence outlier census of value-cents per event_type
    (ops/curate.grouped_iqr_outliers): exact quantile_disc q1/q3,
    integer cross-multiplied 1.5·IQR fences, strict-outside counts."""
    from .ops.curate import grouped_iqr_outliers

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return grouped_iqr_outliers(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "event_type", "v",
    )


def q_cusum(sf_dir: str):
    """CUSUM changepoint per event_type over the daily revenue series
    (ops/temporal.cusum_changepoint): exact integer deviations
    dev_k = n·P_k − k·S over cents, earliest argmax |dev| day."""
    from .ops.temporal import _ts_i64, cusum_changepoint

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "day": pa.array(
                    (_ts_i64(b["ts"]) // _DAY_US).astype(np.int32)
                ),
                "rev": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    out = cusum_changepoint(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "event_type", "day", "rev",
    )
    return pa.table(
        {
            "event_type": out["event_type"],
            "n_days": out["n_periods"],
            "cp_day": pc.cast(
                pc.cast(out["cp"], pa.int32()), pa.date32()
            ),
            "max_dev": out["max_dev"],
        }
    )


def q_degree_hist(sf_dir: str):
    """Degree distribution of the _tri_edge_ds synthetic graph
    (ops/graph.degree_histogram): one center-keyed exchange, per-
    partition (deg, count) partials, tiny driver merge."""
    from .ops.graph import degree_histogram

    return degree_histogram(_tri_edge_ds(sf_dir))


IMPUTE_MOD = 13  # deterministic missingness marker (event_id % 13 == 0)


def q_impute(sf_dir: str):
    """Group-median imputation — the feature-cleaning primitive:
    deterministically mark every 13th event's value missing, compute
    each event_type's exact discrete median over the PRESENT values
    (grouped_quantiles histogram shape, driver-final on the few-key
    contract), broadcast the tiny median map inside the fill stage,
    and emit every row with missing values replaced. All integers
    end-to-end; the oracle's quantile_disc(0.5) indexes by exact
    ceil(n/2) (the DECIMAL-q discipline from `percentiles`)."""
    from .ops.curate import grouped_quantiles

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def derive(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy()
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)),
                    pa.int64(),
                ),
                "miss": pa.array(
                    (eid % IMPUTE_MOD == 0).astype(np.int64)
                ),
            }
        )

    dv = ds.map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
    present = dv.map_batches(
        lambda b: b.filter(pc.equal(b["miss"], pa.scalar(0, pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    med = grouped_quantiles(
        present,
        "event_type",
        "v",
        qs=((1, 2),),
        q_names=("med",),
        count_col="_n",
        final="driver",
    )
    types = med["event_type"].combine_chunks()
    meds = med["med"].to_numpy(zero_copy_only=False)

    def fill(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b["event_type"], types).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False)
        m = b["miss"].to_numpy(zero_copy_only=False)
        filled = np.where(m == 1, meds[idx], v)
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "v_filled": pa.array(filled),
                "was_missing": b["miss"],
            }
        )

    return dv.map_batches(
        fill, batch_format="pyarrow", zero_copy_batch=True
    )


CMS_W = 64  # small bucket space on purpose: collisions exercise the min
CMS_QMAX = 40


def _cms_hash_values() -> str:
    """The CMS hash rows as a SQL VALUES relation h(i, a, b)."""
    from .ops.sketch import CMS_HASHES

    rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(CMS_HASHES)
    )
    return f"(SELECT * FROM (VALUES {rows}) AS h(i, a, b))"


def q_cms_counts(sf_dir: str):
    """Count-min sketch frequency estimates (ops/sketch.count_min):
    build the d×w integer counter matrix over the events user stream
    (per-batch sparse partials, no input shuffle), then point-estimate
    every small user id alongside its true count. Deterministic
    sketch: exact integer counters + fixed affine-mod hash rows ⇒ the
    oracle replays the sketch cell-for-cell (the approx_percentiles
    discipline — approximate answer, bit-reproducible arithmetic).
    est ≥ n_true always (CMS one-sided error)."""
    from .ops.agg import grouped_sum_count
    from .ops.sketch import cms_estimate, count_min

    ds = _read(sf_dir, "events", ["user_id"])
    mat = count_min(ds, "user_id", w=CMS_W)
    truth = grouped_sum_count(
        ds, ["user_id"], count_col="n_true", final="driver"
    )
    truth = truth.filter(
        pc.less(truth["user_id"], pa.scalar(CMS_QMAX, pa.int64()))
    ).combine_chunks().sort_by([("user_id", "ascending")])
    keys = truth["user_id"].to_numpy(zero_copy_only=False)
    est = cms_estimate(mat, keys)
    return pa.table(
        {
            "user_id": truth["user_id"],
            "est": pa.array(est),
            "n_true": truth["n_true"],
        }
    )


def q_vocab_stats(sf_dir: str):
    """Per-language vocabulary statistics (text/analysis.vocab_stats):
    token count, type count, hapax count, type-token ratio — only
    distinct (lang, word, count) rows ever move; ttr is the one
    mirrored division."""
    from .text.analysis import vocab_stats

    return vocab_stats(
        _read(sf_dir, "documents", ["lang", "text"]), "lang", "text"
    )


EWMA_K = 8


def q_ewma(sf_dir: str):
    """Per-user trailing dyadic EWMA of event value-cents over the
    last 8 events (ops/temporal.grouped_ewma): exact int64
    numerator/denominator (power-of-two weights), ONE mirrored
    division per row. Oracle = bounded row_number self-join with
    weight 1 << (7 − rn gap)."""
    from .ops.temporal import grouped_ewma

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return grouped_ewma(
        ds.map_batches(cents, batch_format="pyarrow",
                       zero_copy_batch=True),
        k_lags=EWMA_K,
    )


def q_asof_join(sf_dir: str):
    """As-of join: odd-id events ("trades") matched to the latest
    even-id event ("quote") of the same user at or before their ts."""
    from .ops.temporal import asof_join

    def odd(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b["event_id"], 1), 1)
        ).select(["event_id", "user_id", "ts"])

    def even(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b["event_id"], 1), 0)
        ).select(["event_id", "user_id", "ts", "value"])

    trades = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        odd, batch_format="pyarrow", zero_copy_batch=True
    )
    quotes = _read(
        sf_dir, "events", ["event_id", "user_id", "ts", "value"]
    ).map_batches(even, batch_format="pyarrow", zero_copy_batch=True)
    return asof_join(
        trades,
        quotes,
        value_cols=(("value", "quote_value"),),
        out_left_id="trade_id",
        out_right_id="quote_id",
    )


def q_asof_forward(sf_dir: str):
    """Forward as-of join (pandas merge_asof direction="forward"
    parity): odd-id "trades" matched to the EARLIEST even-id "quote"
    of the same user at or after their ts (equal-ts ties → min quote
    id). Same one-exchange sorted-union machinery as `asof_join`,
    suffix-min fill."""
    from .ops.temporal import asof_join

    def odd(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b["event_id"], 1), 1)
        ).select(["event_id", "user_id", "ts"])

    def even(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b["event_id"], 1), 0)
        ).select(["event_id", "user_id", "ts", "value"])

    trades = _read(
        sf_dir, "events", ["event_id", "user_id", "ts"]
    ).map_batches(odd, batch_format="pyarrow", zero_copy_batch=True)
    quotes = _read(
        sf_dir, "events", ["event_id", "user_id", "ts", "value"]
    ).map_batches(even, batch_format="pyarrow", zero_copy_batch=True)
    return asof_join(
        trades,
        quotes,
        value_cols=(("value", "quote_value"),),
        out_left_id="trade_id",
        out_right_id="quote_id",
        direction="forward",
    )


def q_range_join(sf_dir: str):
    """Keyless interval join: every-17th event anchors a 1-hour
    interval [ts, ts+1h); count + sum event ids of ALL events inside
    (bucket co-partitioned, intervals replicate to <= 2 buckets)."""
    from .ops.temporal import range_join_agg

    points = _read(sf_dir, "events", ["event_id", "ts"])

    def anchors(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        a = b.filter(pa.array(eid % 17 == 0))
        hour = pa.scalar(3_600_000_000, type=pa.duration("us"))
        return pa.table(
            {
                "anchor_id": a["event_id"],
                "start": a["ts"],
                "end": pc.add(a["ts"], hour),
            }
        )

    intervals = _read(sf_dir, "events", ["event_id", "ts"]).map_batches(
        anchors, batch_format="pyarrow", zero_copy_batch=True
    )
    return range_join_agg(
        points,
        intervals,
        start_col="start",
        end_col="end",
        interval_id_col="anchor_id",
        bucket_minutes=60.0,
    )


SAMPLE_KEEP = 7  # keep 7% of documents in the deterministic split
TOPK_K = 3


def q_sample(sf_dir: str):
    """Deterministic hash sample (reproducible holdout split): keep
    documents whose affine-mod id bucket falls below the keep
    fraction. Stateless filter — nothing shuffles."""
    from .ops.curate import hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return hash_sample(ds, "doc_id", keep=SAMPLE_KEEP)


def q_topk_user(sf_dir: str):
    """Per-user top-3 events by value (integer cents, event_id ties):
    the distributed row_number() window. Per-batch combiner keeps at
    most k rows per (user × block) ahead of the keyed shuffle."""
    from .ops.curate import top_k_per_group

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "value_cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
                "event_id": b["event_id"],
            }
        )

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return top_k_per_group(
        ds, "user_id", "value_cents", TOPK_K, "event_id"
    )


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type — the aggregate
    Ray's native Unique cannot compute at high block counts (r2
    islands lesson): per-batch pair dedup → one 16 B/row pair-keyed
    shuffle → disjoint partial counts → driver sum."""
    from .ops.curate import grouped_distinct_count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_distinct_count(
        ds, "event_type", "user_id", count_col="n_users"
    )


def q_percentiles(sf_dir: str):
    """Exact per-event-type value percentiles (p50/p90/p99 over
    integer cents) via the distributed count-histogram. The cents
    domain is provably bounded (~18k distinct at any sf) and there
    are 5 event types, so the histogram merge + walk run driver-final
    (per-batch partials only reach the driver); the distributed
    final="shuffle" mode is the wide-key scale path and is
    equivalence-tested in tests/test_curate.py."""
    from .ops.curate import grouped_quantiles

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "value_cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_quantiles(ds, "event_type", "value_cents", final="driver")


def q_order_totals(sf_dir: str):
    """Distributed equi-join + grouped aggregate (the relational
    backbone behind every enrichment pass): orders ⋈ customer on
    custkey, then count + exact integer-cents revenue per nation.
    Both sides are column-pruned at the read; the join picks its plan
    by measured size (ops/join.equi_join): the 2-column customer
    dimension broadcasts under the same 2M-row limit prorate uses —
    Ray Data's hash-join operator costs ~6 s of aggregator-actor
    fixed latency at bench scale — and co-shuffles above it. The
    reaggregation ships per-batch Arrow partials only (ops/agg
    discipline)."""
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sum_count
    from .ops.join import equi_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    # plan by metadata BEFORE touching data: only a provably-small
    # dimension is ever pulled to the driver for broadcast
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_cust <= 2_000_000:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        )
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "price_cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    orders = orders.map_batches(
        cents, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = equi_join(
        orders, cust, "o_custkey", "c_custkey", ["c_nationkey"]
    )
    out = grouped_sum_count(
        joined,
        ["c_nationkey"],
        sum_cols=["price_cents"],
        count_col="n_orders",
        final="driver",
    )
    return out.sort_by("c_nationkey")


PRICING_CUTOFF = "2000-09-02"


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary over the lineitem stream:
    filtered scan → per-batch integer partials → 6-group rollup.

    Scale shape: the shipdate predicate pushes down to the parquet
    read (row-group pruning — rows past the cutoff never leave
    storage); each batch groups locally (Arrow C++) so the final
    reduction sees n_groups × n_blocks partial rows; the 6-group
    finish runs on the driver (ops/agg ``final="driver"`` rationale).

    Exactness: money flows as integers end to end — cents,
    cents×(100−disc) [10⁻⁴ $], cents×(100−disc)×(100+tax) [10⁻⁶ $] —
    so sums are order-independent; each avg_* is ONE IEEE division
    sum/count mirrored exactly by the oracle's
    ``CAST(sum AS DOUBLE)/count(*)``."""
    from datetime import datetime

    import pyarrow.dataset as pads
    import ray.data

    from .ops.agg import grouped_sum_count

    cutoff = datetime.fromisoformat(PRICING_CUTOFF)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
        filter=(pads.field("l_shipdate") <= pa.scalar(cutoff)),
    )

    def ints(b: pa.Table) -> pa.Table:
        def cents(col, scale):
            return pc.cast(
                pc.round(pc.multiply(b[col], scale)), pa.int64()
            )

        qty = cents("l_quantity", 1.0)
        price = cents("l_extendedprice", 100.0)
        disc = cents("l_discount", 100.0)
        tax = cents("l_tax", 100.0)
        disc_u = pc.multiply(price, pc.subtract(pa.scalar(100), disc))
        charge_u = pc.multiply(disc_u, pc.add(pa.scalar(100), tax))
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": qty,
                "base_cents": price,
                "disc_u": disc_u,
                "charge_u": charge_u,
                "disc_pct": disc,
            }
        )

    t = grouped_sum_count(
        ds.map_batches(ints, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"],
        sum_cols=["sum_qty", "base_cents", "disc_u", "charge_u",
                  "disc_pct"],
        count_col="n",
        final="driver",
    )
    n = t["n"].to_numpy().astype(np.float64)
    for avg, src in (
        ("avg_qty", "sum_qty"),
        ("avg_price_cents", "base_cents"),
        ("avg_disc_pct", "disc_pct"),
    ):
        t = t.append_column(
            avg, pa.array(t[src].to_numpy().astype(np.float64) / n)
        )
    t = t.drop_columns(["disc_pct"])
    return t.combine_chunks().sort_by(
        [("l_returnflag", "ascending"), ("l_linestatus", "ascending")]
    )


def q_snapshot_diff(sf_dir: str):
    """Keyed table reconciliation (ops/diff.table_diff): events vs a
    derived v2 snapshot (every-97th row dropped, every-31st value
    bumped one cent, synthetic new rows appended from documents) —
    the migration-regression check. ONE id-hash co-shuffle with a
    side tag; exact VALUE comparison (never hash-only), output
    bounded by the delta; summary = (status, n, id_sum)."""
    from .ops.diff import table_diff

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "vc": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    base = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        cents, batch_format="pyarrow", zero_copy_batch=True
    )

    def v2(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy()
        keep = (eid % 97) != 0
        vc = b["vc"].to_numpy(zero_copy_only=False) + (
            (eid % 31) == 0
        ).astype(np.int64)
        t = pa.table(
            {
                "event_id": b["event_id"],
                "vc": pa.array(vc, type=pa.int64()),
            }
        )
        return t.filter(pa.array(keep))

    right = base.map_batches(
        v2, batch_format="pyarrow", zero_copy_batch=True
    )

    def adds(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy()
        k = k[(k % 11) == 0]
        return pa.table(
            {
                "event_id": pa.array(10**9 + k, type=pa.int64()),
                "vc": pa.array(k * 7 + 5, type=pa.int64()),
            }
        )

    extra = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        adds, batch_format="pyarrow", zero_copy_batch=True
    )
    return table_diff(
        base, right.union(extra), "event_id", ["vc"], summary=True
    )


def q_trajectory(sf_dir: str):
    """Per-user trajectory step statistics: derive each event's
    integer position from its id (affine-mod lattice), order by
    (ts, id) within user, and reduce the squared step lengths
    dx²+dy² (EXACT ints — no sqrt, so sums are order-independent) to
    (n_steps, total_d2, max_d2) per user. One pruned keyed exchange +
    one vectorized shift per partition — the movement-analytics shape
    on the sessions machinery."""
    from .ops.shuffle import hash_group_apply
    import ray

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def derive(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy()
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "x": pa.array((k * 48271 + 11) % 4096),
                "y": pa.array((k * 69621 + 23) % 4096),
            }
        )

    pruned = ds.map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )

    def part(tbl, starts):
        schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_steps", pa.int64()),
                ("total_d2", pa.int64()),
                ("max_d2", pa.int64()),
            ]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        n = tbl.num_rows
        x = tbl["x"].to_numpy(zero_copy_only=False)
        y = tbl["y"].to_numpy(zero_copy_only=False)
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        nxt_is_start = np.zeros(n, dtype=bool)
        nxt_is_start[starts] = True
        valid = ~nxt_is_start[1:]
        dx = x[1:] - x[:-1]
        dy = y[1:] - y[:-1]
        d2 = (dx * dx + dy * dy)[valid]
        if len(d2) == 0:
            return schema.empty_table()
        src_row = np.arange(n - 1, dtype=np.int64)[valid]
        gi = np.searchsorted(starts, src_row, side="right") - 1
        # gi is nondecreasing (src_row ascending): one reduceat per
        # stat over segment boundaries — no per-group python, no
        # per-group full-array masks (zero-step users never appear)
        seg = np.flatnonzero(np.diff(gi, prepend=gi[0] - 1))
        return pa.table(
            {
                "user_id": pa.array(
                    uid[starts[gi[seg]]], type=pa.int64()
                ),
                "n_steps": pa.array(
                    np.diff(np.append(seg, len(d2))), type=pa.int64()
                ),
                "total_d2": pa.array(
                    np.add.reduceat(d2, seg), type=pa.int64()
                ),
                "max_d2": pa.array(
                    np.maximum.reduceat(d2, seg), type=pa.int64()
                ),
            }
        )

    refs = hash_group_apply(
        pruned, ["user_id"], part, sort_cols=("ts", "event_id"),
        return_refs=True,
    )
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    return (
        pa.concat_tables(tabs).combine_chunks().sort_by("user_id")
        if tabs else part(None, np.array([], dtype=np.int64))
    )


def q_transitions(sf_dir: str):
    """First-order event-type transition matrix per the whole corpus
    (ops/temporal.transition_counts): one pruned keyed exchange,
    vectorized successor shift, per-partition (src,dst) pre-reduce —
    the Markov/session-flow statistic, exact counts vs the lead()
    window oracle."""
    from .ops.temporal import transition_counts

    return transition_counts(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"])
    )


def q_event_gaps(sf_dir: str):
    """Per-user inter-arrival LAG deltas over the events stream (the
    window-function shape): int64 µs since the user's previous event,
    null on each user's first — ONE 24 B/row keyed shuffle, one
    vectorized diff per partition (ops/temporal.lag_deltas)."""
    from .ops.temporal import lag_deltas

    return lag_deltas(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    )


def q_customer_orders(sf_dir: str):
    """LEFT OUTER enrichment: every customer with order count + exact
    integer-cents revenue, zero-order customers included at 0 — the
    outer-join semantics the inner `order_totals` plan cannot express.

    Scale shape: the fact stream pre-aggregates per custkey (partial
    counts per batch, one keyed reduce bounded by |customers|), the
    aggregate broadcasts once, and the customer dimension streams
    through one vectorized index_in + null-mask take
    (ops/join.left_broadcast_join) — no shuffle of either dimension.
    """
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sum_count
    from .ops.join import left_broadcast_join

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_cust > 2_000_000:  # same plan bound as order_totals/prorate
        raise NotImplementedError(
            "customer_orders broadcast plan needs |customers| <= 2M; "
            "use the co-shuffle equi_join plan above it"
        )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "price_cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    agg = grouped_sum_count(
        orders.map_batches(
            cents, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["o_custkey"],
        sum_cols=["price_cents"],
        count_col="n_orders",
        final="driver",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return left_broadcast_join(
        cust,
        agg,
        "c_custkey",
        "o_custkey",
        ["price_cents", "n_orders"],
        fill={"price_cents": 0, "n_orders": 0},
    )


def q_running_total(sf_dir: str):
    """Per-user cumulative integer-cents revenue in (ts, event_id)
    order — the SUM OVER (... ROWS UNBOUNDED PRECEDING) window shape
    (ops/temporal.running_total: one pruned keyed shuffle, global
    cumsum re-based per group, exact int64)."""
    from .ops.temporal import running_total

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "value_cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    return running_total(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "value_cents",
        out_col="running_cents",
    )


def q_retention(sf_dir: str):
    """Cohort retention over the events stream: users cohorted by
    first active day; one row per (cohort, day-offset) with the
    distinct-user count (ops/sessions.retention — per-batch distinct
    (user, day) 12 B/row projection, ONE user-keyed shuffle,
    disjoint-by-construction partition counts)."""
    from .ops.sessions import retention

    return retention(_read(sf_dir, "events", ["user_id", "ts"]))


def q_zonal(sf_dir: str):
    """Zonal statistics (the raster-analysis classic): per-district
    coverage-weighted sum of a per-cell integer value surface, as
    rasterize → vectorized value derive → grouped reduce in one
    streaming composition.

    Exactness: with integer-coordinate geometry every coverage_area is
    an integral double ≤ EXTENT²/256 < 2^53, so area × value casts to
    int64 EXACTLY and the zonal sums are order-independent integers —
    the oracle mirrors the cast, not a float Σ."""
    from .ops.agg import grouped_sum_count
    from .ops.raster import rasterize

    ras = rasterize(
        _districts(),
        (0.0, 0.0, float(EXTENT)),
        RASTER_RES,
        id_col="district_id",
    )

    def weight(b: pa.Table) -> pa.Table:
        val = (
            b["cx"].to_numpy() * 7 + b["cy"].to_numpy() * 13
        ) % 100
        wv = (b["coverage_area"].to_numpy() * val).astype(np.int64)
        return pa.table(
            {
                "district_id": b["district_id"],
                "zonal_value": pa.array(wv),
            }
        )

    if hasattr(ras, "map_batches"):
        ws = ras.map_batches(
            weight, batch_format="pyarrow", zero_copy_batch=True
        )
    else:  # district table is driver-local → rasterize returned a Table
        import ray.data

        ws = ray.data.from_arrow(weight(ras))
    out = grouped_sum_count(
        ws,
        ["district_id"],
        sum_cols=["zonal_value"],
        count_col="n_cells",
        final="driver",
    )
    return out.combine_chunks().sort_by([("district_id", "ascending")])


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


TOPVAL_K = 2


def q_top_event_types(sf_dir: str):
    """Top-k most-frequent event types per user
    (ops/curate.grouped_value_topk): distinct (user, type, count)
    partials are the only exchange; vectorized per-partition lexsort
    top-k with (count DESC, type ASC) total order."""
    from .ops.curate import grouped_value_topk

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return grouped_value_topk(ds, "user_id", "event_type", TOPVAL_K)


def q_spearman(sf_dir: str):
    """Exact grouped Spearman rank correlation
    (ops/stats.grouped_spearman): quantity vs discount-cents per
    lineitem line number — tie-averaged ranks kept ×2 integral, exact
    int moments, ONE mirrored num/sqrt(denx·deny) expression."""
    from .ops.stats import grouped_spearman

    ds = _read(
        sf_dir, "lineitem", ["l_linenumber", "l_quantity", "l_discount"]
    )

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["l_linenumber"], pa.int64()),
                "x": pc.cast(b["l_quantity"], pa.int64()),
                "y": pc.cast(
                    pc.round(pc.multiply(b["l_discount"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    return grouped_spearman(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "k", "x", "y",
    )


def q_kendall(sf_dir: str):
    """Exact grouped Kendall tau-b (ops/stats.grouped_kendall):
    time-vs-value rank concordance per user over the event stream —
    all pair counts exact integers, ONE mirrored
    float(C−D)/sqrt(float·float) expression; keys with fewer than two
    events drop (no pairs), matching the oracle's pair-join inner
    semantics."""
    from .ops.stats import grouped_kendall

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return grouped_kendall(ds, "user_id", "ts", "value")


def q_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user
    (ops/window.grouped_streaks) — the gaps-and-islands retention
    metric: distinct active days collapse per batch, one keyed
    exchange of (user, day) pairs, vectorized run-length reduction.
    Oracle = the classic ``day − row_number()`` island grouping."""
    from .ops.window import grouped_streaks

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    out = _collect(grouped_streaks(ds, "user_id", "ts"))
    return out.sort_by("user_id")



def q_scd2(sf_dir: str):
    """SCD2 intervalization (ops/temporal.intervalize): the events CDC
    stream becomes validity intervals — valid_from = ts, valid_to =
    the user's next event time (the 2200-01-01 warehouse high-date
    sentinel for the open record — null-free so value hashes compare
    exactly), value carried in its source Arrow type. One pruned keyed
    exchange, one vectorized lead per partition. Oracle = coalesced
    LEAD(ts) OVER (PARTITION BY user ORDER BY ts, event_id)."""
    from .ops.temporal import intervalize

    # 2200-01-01 in epoch microseconds — a high-date sentinel that
    # still fits pandas datetime64[ns] (9999-12-31 does not)
    HIGH_DATE_US = 7258118400000000

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    # per-row output: return the Dataset itself (streaming — the
    # gate's compare is order-insensitive, so no driver-side sort)
    return intervalize(ds, open_end_us=HIGH_DATE_US)


def q_inverted(sf_dir: str):
    """Inverted-index build (text/rank.inverted_index): per token df,
    cf, and the ascending comma-joined posting list — per-batch
    distinct (token, doc) partials, ONE token-hash exchange, Arrow
    binary_join posting assembly. min_df=5 filters in the reducer."""
    from .text.rank import inverted_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = _collect(inverted_index(ds, min_df=5))
    return out.sort_by("token")


def q_url_hosts(sf_dir: str):
    """Web-corpus host curation (text/web.host_stats): canonicalize
    deterministic synthetic URLs (scheme/case/www/query noise all
    derived from doc_id — exercises lower + www-strip + query
    truncation) and aggregate per-host n_urls / n_paths. RE2 regex
    extraction on BOTH engines (the redact byte-parity precedent)."""
    from .text.web import host_stats

    def synth(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy()
        site = ((k * 7919) % 97).astype(np.str_)
        tld = np.array(["com", "org", "net"])[k % 3]
        www = np.where(k % 2 == 0, "www.", "")
        host = np.char.add(
            np.char.add(np.char.add(www, "site"), site),
            np.char.add(".example.", tld),
        )
        host = np.where(
            k % 5 == 0, np.char.upper(host), host
        )
        scheme = np.where(k % 4 == 0, "http://", "https://")
        path = np.where(
            k % 7 == 0,
            "",
            np.char.add("/p/", (k % 41).astype(np.str_)),
        )
        qs = np.where(
            k % 3 == 0,
            np.char.add(
                "?utm_source=feed&ref=", (k % 11).astype(np.str_)
            ),
            "",
        )
        url = np.char.add(
            np.char.add(np.char.add(scheme, host), path), qs
        )
        return pa.table(
            {"doc_id": b["doc_id"], "url": pa.array(url.tolist())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", zero_copy_batch=True
    )
    out = _collect(host_stats(ds))
    return out.sort_by("host")


def q_event_pivot(sf_dir: str):
    """Wide pivot (crosstab): per-user event-type count matrix in ONE
    streaming pass — the reshape is free: each batch derives one int64
    indicator column per type (pc.equal), and the partial-sum groupby
    (ops/agg) reduces them; no (user,type) pair shuffle, no second
    reshape job. Column set is the fixed type vocabulary, so the
    output schema is deterministic."""
    from .ops.agg import grouped_sum_count

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def ind(b: pa.Table) -> pa.Table:
        cols = {"user_id": b["user_id"]}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pc.cast(
                pc.equal(b["event_type"], t), pa.int64()
            )
        return pa.table(cols)

    # final="hash": the wide-key scale shape (per-user cardinality is
    # corpus-sized at 100 TB) without the Ray Aggregate operator's
    # actor spin-up; integer counts merge exactly in any order.
    return grouped_sum_count(
        ds.map_batches(ind, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        sum_cols=[f"n_{t}" for t in EVENT_TYPES],
        count_col="n_total",
        final="hash",
    )


def q_covar(sf_dir: str):
    """Exact grouped covariance + correlation (quantity vs discount
    per returnflag): per-batch integer second-moment partials
    (Σx, Σy, Σxy, Σx², Σy², n — Arrow C++ group_by per block), tiny
    driver merge in arbitrary-precision Python ints (n·Σxy overflows
    int64 at web scale), ONE fixed IEEE expression per output value
    mirrored token-for-token by the oracle — the same discipline as
    bm25. Note the mirrored form is the exact-integer identity
    (n·Σxy − ΣxΣy)/n², NOT the engine-specific streaming covar_pop()
    kernel, precisely so both sides round identically."""
    from .ops.agg import grouped_sums_exact

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"]
    )

    def moments(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(b["l_quantity"]), pa.int64())
        y = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "sx": x,
                "sy": y,
                "sxy": pc.multiply(x, y),
                "sxx": pc.multiply(x, x),
                "syy": pc.multiply(y, y),
            }
        )

    rows = grouped_sums_exact(
        ds.map_batches(
            moments, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["l_returnflag"],
        sum_cols=["sx", "sy", "sxy", "sxx", "syy"],
        count_col="n",
    )  # ≤ |returnflag| dicts, Python-int exact at any corpus size
    import math
    out = {
        "l_returnflag": [],
        "n": [],
        "covar_pop": [],
        "corr": [],
    }
    for r in sorted(rows, key=lambda r: r["l_returnflag"]):
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sxx, syy = int(r["sxy"]), int(r["sxx"]), int(r["syy"])
        num = n * sxy - sx * sy
        d2x = n * sxx - sx * sx
        d2y = n * syy - sy * sy
        out["l_returnflag"].append(r["l_returnflag"])
        out["n"].append(n)
        out["covar_pop"].append(float(num) / float(n * n))
        out["corr"].append(
            float(num) / math.sqrt(float(d2x) * float(d2y))
        )
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"]),
            "n": pa.array(out["n"], type=pa.int64()),
            "covar_pop": pa.array(out["covar_pop"]),
            "corr": pa.array(out["corr"]),
        }
    )


CELL_RES = 10  # 1024×1024 grid (cell width 1024 over EXTENT 2^20)
CELL_ANCHOR_RES = 3


def q_cell_compact(sf_dir: str):
    """H3-``compact`` parity: cover every document's derived rect with
    resolution-10 cells, then reduce the corpus-wide distinct cover to
    the minimal multi-resolution ancestor set (fully-covered sibling
    quads promote recursively — the standard tile-inventory shrink
    before a cell set is broadcast as a spatial filter).

    Scale shape (ops/tiling.compact): per-batch dedup, ONE
    anchor-keyed hash shuffle (each partition holds complete
    res-{CELL_ANCHOR_RES} subtrees, so the promotion loop is
    partition-local), ≤ 4^anchor survivors finish on the driver. The
    rect cover itself is a flat vectorized emission
    (geom/cells.cells_covering_rects) whose clamped-then-divided
    arithmetic is mirrored 1:1 by the oracle's
    greatest/least + `//` + range() lateral."""
    from .geom.cells import cells_covering_rects
    from .ops.tiling import compact

    def cover(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy()
        cx = (k * AX + BX) % EXTENT
        cy = (k * AY + BY) % EXTENT
        hx = 1000 + (k % 97) * 50
        hy = 1000 + (k % 89) * 50
        _, cells = cells_covering_rects(
            cx - hx, cy - hy, cx + hx, cy + hy, CELL_RES, EXTENT
        )
        return pa.table({"cell": pa.array(cells.astype(np.int64))})

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        cover, batch_format="pyarrow", zero_copy_batch=True
    )
    return compact(ds, anchor_res=CELL_ANCHOR_RES)


def q_top_event_type(sf_dir: str):
    """Exact grouped MODE: each user's most frequent event_type (ties
    → lexicographically smallest), via per-batch (user,type) count
    partials + ONE keyed shuffle with a reduceat merge and one Arrow
    argmax sort per partition (ops/curate.grouped_mode)."""
    from .ops.curate import grouped_mode

    return grouped_mode(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        "user_id",
        "event_type",
        out_col="top_type",
    )


def q_normalize_text(sf_dir: str):
    """Text normalization (lower → collapse whitespace → trim) over
    deterministically-messied documents (the redact_pii planting
    discipline: both sides derive the same mess — upper-case, a
    doubled first space, pad + tab — so the normalizer has real work
    and the RE2/utf8 kernels are exercised byte-for-byte)."""
    from .text.analysis import normalize_text

    def messy(b: pa.Table) -> pa.Table:
        up = pc.utf8_upper(b["text"])
        sp = pc.replace_substring(up, " ", "  ", max_replacements=1)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "text": pc.binary_join_element_wise(
                    " ", sp, " \t", ""
                ),
            }
        )

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        messy, batch_format="pyarrow", zero_copy_batch=True
    )
    return normalize_text(docs)


FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel(sf_dir: str):
    """Conversion funnel view→click→purchase per user: greedy
    earliest-first step matching with strict-after semantics — one
    user-keyed hash shuffle + per-partition segment-min arithmetic,
    value-exact vs the chained min-ts correlated-subquery oracle."""
    from .ops.sessions import funnel

    return funnel(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        steps=FUNNEL_STEPS,
    )


LOGREG_FEATURES = [
    "n_chars",
    "n_tokens",
    "mean_token_len",
    "stopword_ratio",
]


def q_quality_model(sf_dir: str):
    """Model-based quality filtering (the fastText/CCNet public
    pipeline shape, distant-supervision variant): train a logistic
    classifier on the cheap quality features against weak labels from
    the stopword lang-id heuristic (text-derived — the metadata lang
    column is uncorrelated with the synthetic text), then score every
    document in one streaming pass. Rows-only — gradient descent is
    not SQL-expressible; pytest pins the full output hash, the numpy
    replica equality, and partition invariance (fixed-point integer
    gradient accumulation, vector/logreg.py)."""
    from .text.analysis import langid_batch, quality_batch
    from .vector.logreg import logreg_fit, logreg_score

    def features(b: pa.Table) -> pa.Table:
        q = quality_batch(b)
        lid = langid_batch(b)
        return q.append_column(
            "is_en",
            pc.cast(pc.equal(lid["lang_pred"], "en"), pa.int64()),
        )

    feats = (
        _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        .map_batches(
            features, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize()  # reused by 1+iters fit passes AND the score pass
    )
    # AUC vs the weak labels at sf0.001: 0.87@30it → 0.94@100it; each
    # iteration is one O(d)-partial streaming pass over the
    # materialized 5-column feature table
    model = logreg_fit(
        feats, LOGREG_FEATURES, "is_en", iters=100, lr=3.0, l2=1e-4
    )
    return logreg_score(feats, model, LOGREG_FEATURES, "doc_id")


def q_region_revenue(sf_dir: str):
    """Star-schema chain (orders ⋈ customer ⋈ nation ⋈ region → revenue
    per region name) collapsed the way a 100-TB plan should be: the
    dim-dim joins (customer→nation→region, all provably small) happen
    DRIVER-side with plain Arrow take, producing ONE custkey→r_name
    dimension that broadcasts once; the orders fact stream then does a
    single vectorized join pass + exact integer-cents reaggregation.
    Four logical joins, zero shuffles."""
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sum_count
    from .ops.join import equi_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    n_reg = region["r_name"].take(
        pc.index_in(nation["n_regionkey"], region["r_regionkey"].combine_chunks())
    )
    c_reg = n_reg.take(
        pc.index_in(cust["c_nationkey"], nation["n_nationkey"].combine_chunks())
    )
    dim = pa.table({"c_custkey": cust["c_custkey"], "r_name": c_reg})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "revenue_cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    joined = equi_join(
        orders.map_batches(
            cents, batch_format="pyarrow", zero_copy_batch=True
        ),
        dim,
        "o_custkey",
        "c_custkey",
        ["r_name"],
    )
    out = grouped_sum_count(
        joined,
        ["r_name"],
        sum_cols=["revenue_cents"],
        count_col="n_orders",
        final="driver",
    )
    return out.sort_by("r_name")


def q_winsorize(sf_dir: str):
    """Grouped winsorization (ops/curate.winsorize): every event's
    value capped at its event_type's exact p90 — the quantile caps
    come from the distinct-value count-histogram path (corpus never
    shuffles), the clamp is one stateless vectorized pass. quantile
    semantics = DuckDB quantile_disc under exact rational q."""
    from .ops.curate import winsorize

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "v_cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
                "event_id": b["event_id"],
            }
        )

    ds = _read(
        sf_dir, "events", ["event_type", "value", "event_id"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return winsorize(
        ds, "event_type", "v_cents", q=(9, 10), keep_cols=["event_id"]
    )


def q_weighted_sample(sf_dir: str):
    """Importance sampling (ops/curate.weighted_sample): keep events
    with probability ∝ value — a stateless deterministic int64
    compare per row (hash·max_weight < weight·mod), nothing shuffles,
    reproducible across runs and partitionings; the oracle runs the
    identical integer expression."""
    from .ops.curate import weighted_sample

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "v_cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    ds = _read(
        sf_dir, "events", ["event_id", "user_id", "event_type", "value"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return weighted_sample(
        ds, "event_id", "v_cents", max_weight=100_000
    )


def q_order_rank(sf_dir: str):
    """GLOBAL row_number over every order by (totalprice DESC,
    orderkey) — ops/window.global_row_number: one range-partitioned
    Ray sort of the pruned 16 B/row projection, then per-block arange
    stamps offset by block COUNTS (ints cross the wire, not rows)."""
    from .ops.window import global_row_number

    return global_row_number(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        ["o_totalprice", "o_orderkey"],
        descending=[True, False],
        rank_name="rank",
    )


def q_cooccur(sf_dir: str):
    """Market-basket co-occurrence (ops/curate.cooccurrence_counts):
    for every unordered event_type pair, how many users triggered
    both — distinct (user, type) pairs exchange once, the pair
    expansion is the triangle-count segment-arange kernel, counts
    finish as exact integer partial sums."""
    from .ops.curate import cooccurrence_counts

    return cooccurrence_counts(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        "user_id",
        "event_type",
        count_col="n_users",
    )


def q_item_sim(sf_dir: str):
    """Item-item similarity from the co-click matrix: for every
    unordered event_type pair, cosine = n_xy/√(n_x·n_y) and
    jaccard = n_xy/(n_x+n_y−n_xy) over DISTINCT-user counts — the
    collaborative-filtering neighborhood shape. Composition of two
    existing reductions (cooccurrence_counts + grouped_distinct_count,
    both exact-integer, both moving only distinct pairs); the type
    margin table is dimension-sized, so the fuse step is a driver map.
    cosine is the fixed mirrored chain float/(sqrt(float)·sqrt(float));
    jaccard is ONE division of exact ints."""
    import math

    from .ops.curate import cooccurrence_counts, grouped_distinct_count

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    co = cooccurrence_counts(ds, "user_id", "event_type",
                             count_col="n_xy")
    co = _collect(co) if not isinstance(co, pa.Table) else co
    marg = grouped_distinct_count(
        ds, "event_type", "user_id", count_col="n_users"
    )
    marg = _collect(marg) if not isinstance(marg, pa.Table) else marg
    m = {
        r["event_type"]: int(r["n_users"]) for r in marg.to_pylist()
    }
    co = co.combine_chunks().sort_by(
        [("item_a", "ascending"), ("item_b", "ascending")]
    )
    rows = co.to_pylist()
    cos, jac = [], []
    for r in rows:
        nx, ny, nxy = m[r["item_a"]], m[r["item_b"]], int(r["n_xy"])
        cos.append(
            float(nxy) / (math.sqrt(float(nx)) * math.sqrt(float(ny)))
        )
        jac.append(float(nxy) / float(nx + ny - nxy))
    return pa.table(
        {
            "item_a": co["item_a"],
            "item_b": co["item_b"],
            "n_xy": co["n_xy"],
            "cosine": pa.array(cos, type=pa.float64()),
            "jaccard": pa.array(jac, type=pa.float64()),
        }
    )


def q_intervals(sf_dir: str):
    """Gaps-and-islands (ops/temporal.merge_intervals): each event
    opens an availability window of value-cents hours; overlapping-or-
    touching windows per user merge into maximal islands. All-integer
    µs arithmetic both sides (epoch µs + cents×3.6e6), so the island
    cuts are bit-exact vs the SQL running-max window oracle."""
    from .ops.temporal import merge_intervals

    def iv(b: pa.Table) -> pa.Table:
        s = pc.cast(b["ts"], pa.int64())
        dur = pc.multiply(
            pc.cast(
                pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
            ),
            3_600_000,
        )
        return pa.table(
            {
                "user_id": b["user_id"],
                "start_us": s,
                "end_us": pc.add(s, dur),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        iv, batch_format="pyarrow", zero_copy_batch=True
    )
    return merge_intervals(ds, ["user_id"], "start_us", "end_us")


def _tri_edge_ds(sf_dir: str):
    """The deterministic synthetic graph on the documents universe
    shared by q_triangles / q_clustering: node i links to i+1, i+2 and
    (7i+3) mod N — the ring guarantees N consecutive-triple triangles,
    the affine map adds random-like closures."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows

    def edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy()
        u = np.concatenate([i, i, i])
        v = np.concatenate(
            [(i + 1) % n_docs, (i + 2) % n_docs, (i * 7 + 3) % n_docs]
        )
        return pa.table(
            {
                "u": pa.array(u.astype(np.int64)),
                "v": pa.array(v.astype(np.int64)),
            }
        )

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        edges, batch_format="pyarrow", zero_copy_batch=True
    )


def q_triangles(sf_dir: str):
    """Exact triangle count (ops/graph.triangle_count) over the
    _tri_edge_ds synthetic graph. Two keyed rounds (wedge generation
    by lower endpoint, wedge–edge closure by pair), 17 B/row
    exchanges, single-int partials; oracle = DuckDB 3-way self-join
    on the same edge CTE."""
    from .ops.graph import triangle_count

    return triangle_count(_tri_edge_ds(sf_dir))


RL_AY, RL_BY = 69427, 311  # road y-line derive (distinct from AX/AY)
RL_AX, RL_BX = 50377, 89
RL_AL, RL_BL = 28661, 5
RL_MAXLEN = 1 << 14


def q_road_lengths(sf_dir: str):
    """Line-in-region overlay (ops/lines.segment_zonal_length): total
    clipped length + segment count per district for a synthetic
    horizontal road network (one segment per doc: integer x-endpoints,
    off-lattice y = int + 0.5). The district table broadcasts once;
    each batch reduces to ≤64 partial rows through one vectorized
    interval-clip matrix — segment bytes never shuffle. Every clipped
    length is an exact integral double → int64; the oracle is the
    least/greatest interval formula over the same VALUES rects."""
    from .ops.lines import segment_zonal_length

    ds = _read(sf_dir, "documents", ["doc_id"])

    def derive(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy()
        yi = (k * RL_AY + RL_BY) % EXTENT
        x0 = (k * RL_AX + RL_BX) % EXTENT
        ln = (k * RL_AL + RL_BL) % RL_MAXLEN + 1
        x1 = np.minimum(x0 + ln, EXTENT)
        return pa.table(
            {
                "y": pa.array(yi.astype(np.float64) + 0.5),
                "x0": pa.array(x0.astype(np.float64)),
                "x1": pa.array(x1.astype(np.float64)),
            }
        )

    segs = ds.map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
    return segment_zonal_length(segs, _districts())


KCORE_K = 2
KCORE_ROUNDS = 4  # chain depth 3 ⇒ fixpoint at 3; one slack round


def q_kcore(sf_dir: str):
    """2-core by distributed BSP peeling (ops/graph.kcore) over the
    ring-plus-pendant-chains graph: node i links to i±1, i±2 (mod N);
    every 10th node grows a 3-node pendant chain i—(N+i)—(2N+i)—(3N+i).
    The chains peel tail-first over exactly 3 rounds (deg-1 tail, then
    the exposed middles); the ring survives at degree 4. rounds=4 =
    fixpoint + one slack round, which a 4-step unrolled SQL dead-set
    oracle mirrors exactly. Decrement messages total ≤ 2·E over the
    whole run — each edge direction fires once, when its src dies."""
    import pyarrow.parquet as pq

    from .ops.graph import kcore

    n_docs = pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows

    def edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy()
        ch = i[i % 10 == 0]
        u = np.concatenate([i, i, ch, n_docs + ch, 2 * n_docs + ch])
        v = np.concatenate(
            [
                (i + 1) % n_docs,
                (i + 2) % n_docs,
                n_docs + ch,
                2 * n_docs + ch,
                3 * n_docs + ch,
            ]
        )
        return pa.table(
            {
                "u": pa.array(u.astype(np.int64)),
                "v": pa.array(v.astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        edges, batch_format="pyarrow", zero_copy_batch=True
    )
    return kcore(ds, k=KCORE_K, rounds=KCORE_ROUNDS)


def q_clustering(sf_dir: str):
    """Per-node degree / triangle count / local clustering coefficient
    (ops/graph.clustering_coefficients) over the _tri_edge_ds graph:
    the wedge-closure rounds credit each closed triangle to all three
    nodes, only pre-combined (node, tri, deg) int partials leave each
    partition, and lcc = 2·tri/(deg·(deg−1)) is the one mirrored
    division (NULL when deg < 2). Oracle = per-node role-union over
    the DuckDB 3-way self-join triangle CTE."""
    from .ops.graph import clustering_coefficients

    return clustering_coefficients(_tri_edge_ds(sf_dir))


def q_outliers(sf_dir: str):
    """Grouped anomaly filter: events more than 1.5 population σ above
    their event_type's mean value (ops/curate.grouped_outliers) — the
    z-test collapses to ONE int64 compare per row against a per-group
    integer threshold derived with exact integer sqrt on the driver
    (no float rounding step anywhere), so the filter set is bit-exact
    vs the oracle's HUGEINT inequality."""
    from .ops.curate import grouped_outliers

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "v_cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
                "event_id": b["event_id"],
            }
        )

    ds = _read(
        sf_dir, "events", ["event_type", "value", "event_id"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_outliers(
        ds,
        "event_type",
        "v_cents",
        sigmas=(3, 2),
        keep_cols=["event_id"],
    )


def q_gini(sf_dir: str):
    """Per-priority Gini concentration of order value (ops/stats.
    grouped_gini) — the source-contribution-inequality monitor. Only
    distinct (priority, cents, count) histogram rows move; gini is a
    pure tie-invariant function of that histogram (module docstring
    derivation), every intermediate an exact integer, and the single
    float is ONE correctly-rounded division mirrored in the oracle's
    CAST(HUGEINT AS DOUBLE) expression (parity validated bit-for-bit
    over ±10^25 before wiring). Five keys ⇒ driver-final."""
    from .ops.stats import grouped_gini

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "v_cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    ds = _read(
        sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_gini(ds, "o_orderpriority", "v_cents", final="driver")


def q_wmedian(sf_dir: str):
    """Quantity-weighted median unit price per returnflag
    (ops/stats.grouped_weighted_median): the smallest price cents p
    with 2·Σ_{x≤p} qty ≥ Σ qty. The shuffle carries the weighted
    distinct-price histogram (price never re-reads); the walk is a
    ceil((W+1)/2) searchsorted per group — all-integer, so the oracle's
    window-cumsum formulation matches exactly. Three keys ⇒
    driver-final."""
    from .ops.stats import grouped_weighted_median

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "p_cents": pc.cast(
                    pc.round(pc.multiply(b["l_extendedprice"], 100.0)),
                    pa.int64(),
                ),
                "qty": pc.cast(
                    pc.round(b["l_quantity"]), pa.int64()
                ),
            }
        )

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_weighted_median(
        ds, "l_returnflag", "p_cents", "qty", final="driver"
    )


def q_mad(sf_dir: str):
    """Per-event_type median absolute deviation of value
    (ops/stats.grouped_mad) — the robust spread monitor for score
    drift. Two distinct-value histogram passes (median, then
    |v − median| with the one-row-per-key median map riding the stage
    closure); both quantiles are DuckDB quantile_disc semantics under
    exact rational q=(1,2)."""
    from .ops.stats import grouped_mad

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "v_cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    ds = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        cents, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_mad(ds, "event_type", "v_cents")


def q_typo_pairs(sf_dir: str):
    """Edit-distance-1 fuzzy self-join (text/fuzzy.edit1_pairs — the
    SymSpell deletion-variant blocking shape): all distinct code pairs
    exactly one edit apart. Codes derive deterministically from doc_id
    (5 base-5 letter digits, leading 'a's stripped — variable length,
    so deletion/insertion pairs exist alongside substitutions; the
    corpus vocabulary itself has zero d1 pairs). Exchanges are
    vocabulary-sized (variant rows, then candidate pairs); equal-length
    verification is one fixed-width codepoint compare per length
    class. The oracle is the brute levenshtein cross-join."""
    from .text.fuzzy import edit1_pairs

    letters = np.array(list("abcde"), dtype="<U1")

    def codes(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy(zero_copy_only=False)
        digs = np.empty((len(k), 5), dtype="<U1")
        for j in range(5):
            digs[:, 4 - j] = letters[(k // (5**j)) % 5]
        full = digs.view("<U5").ravel()
        return pa.table(
            {"tok": pa.array(np.char.lstrip(full, "a"), type=pa.string())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        codes, batch_format="pyarrow", zero_copy_batch=True
    )
    return edit1_pairs(ds, "tok")


def q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(region, nation) revenue — the reporting-
    hierarchy shape (ops/agg.grouped_rollup): the orders stream is
    reduced ONCE at the finest (r_name, n_name) level (per-batch
    integer-cents partials, driver merge), then each coarser level
    re-sums that ≤125-row aggregate. Rolled-up keys surface as 'ALL'
    (fill_null) so the driver hash never compares raw NULL cells."""
    import pyarrow.parquet as pq

    from .ops.agg import grouped_rollup
    from .ops.join import equi_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_regionkey", "n_name"],
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    nidx = pc.index_in(
        cust["c_nationkey"], nation["n_nationkey"].combine_chunks()
    )
    ridx = pc.index_in(
        nation["n_regionkey"].take(nidx),
        region["r_regionkey"].combine_chunks(),
    )
    dim = pa.table(
        {
            "c_custkey": cust["c_custkey"],
            "r_name": region["r_name"].take(ridx),
            "n_name": nation["n_name"].take(nidx),
        }
    )

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "revenue_cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    joined = equi_join(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            cents, batch_format="pyarrow", zero_copy_batch=True
        ),
        dim,
        "o_custkey",
        "c_custkey",
        ["r_name", "n_name"],
    )
    out = grouped_rollup(
        joined,
        ["r_name", "n_name"],
        sum_cols=["revenue_cents"],
        count_col="n_orders",
    )
    return pa.table(
        {
            "r_name": pc.fill_null(out["r_name"], "ALL"),
            "n_name": pc.fill_null(out["n_name"], "ALL"),
            "revenue_cents": out["revenue_cents"],
            "n_orders": out["n_orders"],
        }
    )


KNN_K = 3
RASTER_RES = 4


def q_knn(sf_dir: str):
    """Spatial kNN block matching: each document point's 3 nearest
    other document points (exact integer d², deterministic ties).

    Runs the distributed exact self-join (cell co-partition +
    certified-ring rounds) — the point table is never gathered to the
    driver or broadcast (VERDICT r1 #2)."""
    from .ops.knn import knn_self_join

    pts_ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_points, batch_format="pyarrow", zero_copy_batch=True
    )
    out = knn_self_join(
        pts_ds,
        k=KNN_K,
        extent=(0.0, 0.0, float(EXTENT)),
        id_col="doc_id",
    )
    return out


def q_knn_xl(sf_dir: str):
    """Corpus-scale exact kNN (10⁴–10⁵ points from events through the
    distributed cell-co-partitioned self-join with certified-ring
    rounds). The engine computes ALL points' neighbours; the gate
    output keeps the deterministic 1%% source sample (event_id % 100
    == 0) so the DuckDB oracle's cross join stays ~n²/100 — the
    sampled rows are only correct if the WHOLE self-join is."""
    from .ops.knn import knn_self_join

    def pts(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy()
        x = ((k * AX + BX) % EXTENT).astype(np.float64) + 0.5
        y = ((k * AY + BY) % EXTENT).astype(np.float64) + 0.5
        return pa.table(
            {
                "event_id": b["event_id"],
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    out = knn_self_join(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            pts, batch_format="pyarrow", zero_copy_batch=True
        ),
        k=KNN_K,
        extent=(0.0, 0.0, float(EXTENT)),
        id_col="event_id",
    )
    def sample(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(k % 100 == 0))

    if isinstance(out, pa.Table):
        return sample(out)
    return out.map_batches(sample, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_rasterize(sf_dir: str):
    """Vector→raster: district polygons to exact per-cell coverage
    areas at res RASTER_RES (sf-independent geometry, engine path)."""
    from .ops.raster import rasterize

    out = rasterize(
        _districts(),
        (0.0, 0.0, float(EXTENT)),
        RASTER_RES,
        id_col="district_id",
    )
    return out


# ------------------------------------------------- repair-family queries
# (rows-only: clipping/repair semantics aren't SQL-expressible; pytest
# brute-force oracles cover correctness — FIXTURES.md F9)


def _defect_grid(sf_dir: str) -> pa.Table:
    """Deterministic jittered tessellation with gaps+overlaps, sized by
    the sf documents table so larger sf exercises larger repairs."""
    import pyarrow.parquet as pq

    from .geom.wkb import encode_polygon

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    k = max(4, min(8, int(np.sqrt(n_docs) // 4)))
    rng = np.random.RandomState(2023)
    ids, geoms = [], []
    for x in range(k):
        for y in range(k):
            d = rng.uniform(-0.04, 0.04)
            ring = np.array(
                [
                    [x - d, y - d],
                    [x + 1 + d, y - d],
                    [x + 1 + d, y + 1 + d],
                    [x - d, y + 1 + d],
                ]
            )
            ids.append(f"c{x:02d}{y:02d}")
            geoms.append(encode_polygon([ring]))
    return pa.table(
        {"id": ids, "geometry": pa.array(geoms, type=pa.binary())}
    )


def _repair_summary(out: pa.Table) -> pa.Table:
    """Rich per-geometry repair evidence (VERDICT r3 #9): area,
    component count, perimeter and the SORTED positive-length rook
    neighbor set per id, so the driver's rows-only check pins geometry
    CONTENT (values hash over all columns), not just row counts.
    Hashes of these tables are pinned in tests/test_e2e_pipelines.py."""
    from .geom.core import area as parea
    from .geom.core import ensure_multi, perimeter
    from .geom.wkb import decode_polygons
    from .ops.adjacencies import adjacencies

    ids = out["id"].to_pylist()
    geoms = [decode_polygons(b.as_py()) for b in out["geometry"]]
    adj = adjacencies(
        out, id_col="id", adjacency_type="rook", include_geometry=False
    )
    neigh: dict = {i: [] for i in ids}
    for a, b_, ln in zip(
        adj["id_i"].to_pylist(),
        adj["id_j"].to_pylist(),
        adj["length"].to_pylist(),
    ):
        if ln > 0:
            neigh[a].append(b_)
            neigh[b_].append(a)
    return pa.table(
        {
            "id": pa.array(ids),
            "area": pa.array(np.round([parea(g) for g in geoms], 9)),
            "n_parts": pa.array(
                [len(ensure_multi(g)) for g in geoms], type=pa.int64()
            ),
            "perimeter": pa.array(
                np.round([perimeter(g) for g in geoms], 9)
            ),
            "neighbors": pa.array(
                [",".join(sorted(neigh[i])) for i in ids]
            ),
        }
    )


def q_quick_repair(sf_dir: str):
    """Repair pipeline health summary after quick_repair: per-geometry
    area / component count / perimeter / rook-neighbor set (rows-only
    driver check; table hash pinned in pytest)."""
    from .ops.repair import quick_repair

    return _repair_summary(quick_repair(_defect_grid(sf_dir)))


def q_smart_repair(sf_dir: str):
    from .ops.smart_repair import smart_repair_table

    out = smart_repair_table(_defect_grid(sf_dir), fill_gaps_threshold=None)
    return _repair_summary(out)


def q_doctor(sf_dir: str):
    from .geom.core import area as parea
    from .geom.wkb import decode_polygons
    from .ops.repair import doctor, quick_repair, union_all_table

    t = _defect_grid(sf_dir)
    fixed = quick_repair(t)
    rows = []
    for stage, tbl in (("pre", t), ("post", fixed)):
        rep = doctor(tbl)
        total = sum(
            parea(decode_polygons(b.as_py())) for b in tbl["geometry"]
        )
        rows.append(
            {
                "stage": stage,
                "n_overlaps": rep["n_overlaps"],
                "n_gaps": rep["n_gaps"],
                "all_valid": rep["all_valid"],
                "ok": rep["ok"],
                "n_geoms": tbl.num_rows,
                # full-precision: a one-ulp area leak fails the hash
                "total_area": total,
                "union_area": parea(union_all_table(tbl)),
            }
        )
    return pa.table(
        {
            "stage": pa.array([r["stage"] for r in rows]),
            "n_overlaps": pa.array(
                [r["n_overlaps"] for r in rows], type=pa.int64()
            ),
            "n_gaps": pa.array(
                [r["n_gaps"] for r in rows], type=pa.int64()
            ),
            "all_valid": pa.array([r["all_valid"] for r in rows]),
            "ok": pa.array([r["ok"] for r in rows]),
            "n_geoms": pa.array(
                [r["n_geoms"] for r in rows], type=pa.int64()
            ),
            "total_area": pa.array([r["total_area"] for r in rows]),
            "union_area": pa.array([r["union_area"] for r in rows]),
        }
    )


def q_supplier_rank(sf_dir: str):
    """Per-nation dense_rank of suppliers by account balance — the
    grouped window-rank shape (ops/window.grouped_dense_rank): one
    keyed shuffle of the pruned projection, one Arrow sort + cumsum of
    value-change flags per partition. Dense semantics make the result
    tie-order-invariant, hence value-exact vs the SQL window oracle."""
    from .ops.window import grouped_dense_rank

    return grouped_dense_rank(
        _read(sf_dir, "supplier", ["s_nationkey", "s_suppkey", "s_acctbal"]),
        ["s_nationkey"],
        "s_acctbal",
        rank_name="bal_rank",
        descending=True,
        keep_cols=["s_suppkey"],
    )


def q_order_concat(sf_dir: str):
    """Ordered grouped string_agg: each customer's order priorities
    concatenated in o_orderkey order (ops/window.grouped_concat) — one
    keyed shuffle, then ONE pc.binary_join over a group-sliced list
    array per partition (no per-group Python)."""
    from .ops.window import grouped_concat

    return grouped_concat(
        _read(
            sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderpriority"]
        ),
        ["o_custkey"],
        "o_orderpriority",
        order_col="o_orderkey",
        sep=",",
        out_name="priorities",
        count_name="n_orders",
    )


def q_custdist(sf_dir: str):
    """TPC-H Q13 shape — DOUBLE aggregation: orders-per-customer
    (bytes-aware keyed hash exchange of per-batch partials over the
    customer-cardinality key), then the tiny histogram of those counts
    (driver merge — ≤ max_orders_per_customer rows). The zero-order
    bucket is arithmetic (total customers − customers with orders, one
    metadata read), not a corpus-sized outer join."""
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sum_count

    per_cust = grouped_sum_count(
        _read(sf_dir, "orders", ["o_custkey"]),
        ["o_custkey"],
        count_col="c_count",
        final="hash",
    )
    hist = grouped_sum_count(
        per_cust, ["c_count"], count_col="custdist", final="driver"
    )
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    n_zero = n_cust - int(pc.sum(hist["custdist"]).as_py() or 0)
    if n_zero > 0:
        hist = pa.concat_tables(
            [
                hist,
                pa.table(
                    {
                        "c_count": pa.array([0], type=pa.int64()),
                        "custdist": pa.array([n_zero], type=pa.int64()),
                    }
                ),
            ]
        )
    return hist


def q_nearest_district(sf_dir: str):
    """1-NN join: each derived document point → nearest district
    CENTER (squared Euclidean, ties → smallest district_id). The 64
    centers ship in the stage closure; each batch is one vectorized
    (n×64) distance matrix + argmin — the brute-force leg of a
    cell-bucketed nearest-facility join (the kNN ring-round path
    covers the corpus-sized-targets case). Value-exact: points and
    centers are multiples of 0.5 with |coord| < 2^20, so every squared
    distance is an exact dyadic double on both sides."""
    cents = district_table(N_DISTRICTS)
    cx = (
        (cents["minx"].to_numpy() + cents["maxx"].to_numpy()) / 2.0
    )
    cy = (
        (cents["miny"].to_numpy() + cents["maxy"].to_numpy()) / 2.0
    )
    ids = cents["district_id"].to_numpy()

    def nearest(batch: pa.Table) -> pa.Table:
        k = batch["doc_id"].to_numpy()
        x = ((k * AX + BX) % EXTENT).astype(np.float64) + 0.5
        y = ((k * AY + BY) % EXTENT).astype(np.float64) + 0.5
        dx = x[:, None] - cx[None, :]
        dy = y[:, None] - cy[None, :]
        d2 = dx * dx + dy * dy
        j = np.argmin(d2, axis=1)  # first min → smallest district_id
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "district_id": pa.array(ids[j]),
                "d2": pa.array(d2[np.arange(len(k)), j]),
            }
        )

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        nearest, batch_format="pyarrow", zero_copy_batch=True
    )


def q_event_tiles(sf_dir: str):
    """Per-user ntile(4) bucketing over the events stream ordered by
    (ts, event_id) — the quantile-bucket window shape
    (ops/window.grouped_ntile): one keyed shuffle of the 24 B/row
    projection, one vectorized bucket-fill expression per partition."""
    from .ops.window import grouped_ntile

    return grouped_ntile(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]),
        ["user_id"],
        ["ts", "event_id"],
        4,
        tile_name="tile",
    )


def q_latest_event(sf_dir: str):
    """Latest event per user (the SCD current-state shape,
    ops/window.grouped_latest): each batch PRE-COMBINES to one row per
    user (one Arrow sort + group-last take), so the keyed exchange
    carries ≤ 1 row per user × block; the identical take-last
    reduction runs once per partition. (ts, event_id) totalizes order
    within a user, so the result is partition-invariant and value-
    exact vs the SQL row_number()=1 window oracle."""
    from .ops.window import grouped_latest

    return grouped_latest(
        _read(
            sf_dir,
            "events",
            ["user_id", "ts", "event_id", "event_type", "value"],
        ),
        ["user_id"],
        ["ts", "event_id"],
        value_cols=["event_type", "value"],
    )


def q_first_order(sf_dir: str):
    """Each customer's FIRST order (earliest o_orderdate, orderkey
    tie-break) — the cohort-entry twin of `latest_event`
    (ops/window.grouped_latest take="first"): same ≤1-row-per-key×block
    pre-combine, same partition-invariant take-extreme reduction."""
    from .ops.window import grouped_latest

    return grouped_latest(
        _read(
            sf_dir,
            "orders",
            ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
        ),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        value_cols=["o_totalprice"],
        take="first",
    )


Q3_CUTOFF = "1998-06-01"
Q3_SEGMENT = "BUILDING"
Q3_TOPN = 10


def q_top_unshipped(sf_dir: str, broadcast_limit: int = 2_000_000):
    """TPC-H Q3 shape — top-N unshipped-revenue orders for one market
    segment: lineitem (shipdate predicate pushed to the parquet read)
    → integer-cents revenue → semi-filter against the qualifying-order
    key set (broadcast; date + segment filters applied on the
    dimension side) → per-batch revenue partials + bytes-aware keyed
    merge → orderdate attach (broadcast) → per-block top-N combiner +
    driver merge. Revenue is cents×(100−disc) [10⁻⁴ $] so sums are
    order-independent (pricing_summary discipline); rank order is
    totalized by (revenue DESC, orderkey).

    Plan by metadata (order_totals pattern): an orders table past
    ``broadcast_limit`` switches to the corpus-sized path — customer
    and orders co-shuffle through Ray Data's hash join, the semi
    filter folds into that inner join, and only the per-order partials
    (already reduced) join the dimension stream; equivalence with the
    broadcast plan is pinned in tests/test_e2e_pipelines.py."""
    from datetime import datetime

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data

    from .ops.agg import grouped_sum_count
    from .ops.join import broadcast_hash_join, semi_join

    cutoff = datetime.fromisoformat(Q3_CUTOFF)
    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") > pa.scalar(cutoff)),
    )

    def rev(b: pa.Table) -> pa.Table:
        price = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64()
        )
        disc = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "revenue_u": pc.multiply(
                    price, pc.subtract(pa.scalar(100, pa.int64()), disc)
                ),
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)

    if n_orders <= broadcast_limit:
        # dimension: date-filtered orders of the segment's customers,
        # driver-local (provably small) and broadcast
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
        )
        ckeys = pc.filter(
            cust["c_custkey"],
            pc.equal(cust["c_mktsegment"], Q3_SEGMENT),
        )
        ot = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
        dim = ot.filter(
            pc.and_(
                pc.less(ot["o_orderdate"], pa.scalar(cutoff)),
                pc.is_in(
                    ot["o_custkey"], value_set=ckeys.combine_chunks()
                ),
            )
        ).select(["o_orderkey", "o_orderdate"])
        li = semi_join(li, dim, "l_orderkey", right_on="o_orderkey")
        per_order = grouped_sum_count(
            li, ["l_orderkey"], sum_cols=["revenue_u"], final="hash"
        )
        dated = broadcast_hash_join(
            per_order, dim, "l_orderkey", "o_orderkey", ["o_orderdate"]
        )
    else:
        # corpus-sized dimension: everything co-shuffles. The revenue
        # partials are reduced per orderkey BEFORE the join, so the
        # join's left side is orders-sized, not lineitem-sized.
        ncpu = max(8, int(
            __import__("ray").cluster_resources().get("CPU", 8)
        ))
        cust_ds = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
            filter=(pads.field("c_mktsegment") == Q3_SEGMENT),
        ).select_columns(["c_custkey"])
        orders_ds = (
            ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_custkey", "o_orderdate"],
                filter=(pads.field("o_orderdate") < pa.scalar(cutoff)),
            )
            .join(
                cust_ds,
                join_type="inner",
                num_partitions=ncpu,
                on=("o_custkey",),
                right_on=("c_custkey",),
            )
            .select_columns(["o_orderkey", "o_orderdate"])
        )
        per_order = grouped_sum_count(
            li, ["l_orderkey"], sum_cols=["revenue_u"], final="hash"
        )
        dated = per_order.join(
            orders_ds,
            join_type="inner",
            num_partitions=ncpu,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

    def top_block(b: pa.Table) -> pa.Table:
        r = b["revenue_u"].to_numpy(zero_copy_only=False)
        k = b["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -r))[:Q3_TOPN]
        # normalize: the co-shuffle join path may carry its key twins
        return b.select(
            ["l_orderkey", "revenue_u", "o_orderdate"]
        ).take(pa.array(order))

    winners = pa.concat_tables(
        [
            t
            for t in (
                __import__("ray").get(r)
                for r in dated.map_batches(
                    top_block, batch_format="pyarrow", zero_copy_batch=True
                ).materialize().to_arrow_refs()
            )
            if t.num_rows
        ]
        or [
            pa.schema(
                [
                    ("l_orderkey", pa.int64()),
                    ("revenue_u", pa.int64()),
                    ("o_orderdate", pa.timestamp("us")),
                ]
            ).empty_table()
        ]
    )
    r = winners["revenue_u"].to_numpy(zero_copy_only=False)
    k = winners["l_orderkey"].to_numpy(zero_copy_only=False)
    order = np.lexsort((k, -r))[:Q3_TOPN]
    return winners.take(pa.array(order))


DWITHIN_R = 1 << 15  # power of two → R² compares exactly


def q_points_within(sf_dir: str):
    """Fixed-radius spatial self-join (the geo range join): all
    document-point pairs within R (ops/dwithin.dwithin_self_join) —
    ≤4× cell replication of a 41 B projection, one cell-keyed shuffle,
    one vectorized home×resident distance pass per partition,
    structural dedup (no pair shuffle). Value-exact vs the cross-join
    oracle (integer dx/dy, power-of-two R²)."""
    from .ops.dwithin import dwithin_self_join

    pts = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        derive_points, batch_format="pyarrow", zero_copy_batch=True
    )
    return dwithin_self_join(
        pts, float(DWITHIN_R), id_col="doc_id"
    )


EMB_DIM = 64
EMB_QSCALE = 1 << 20  # power of two → the quantizing multiply is EXACT


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids — the list-column grouped
    aggregate (vector-building shape: class means for SemDeDup-style
    pruning / nearest-class-mean labeling). Each batch reshapes the
    flattened list<float> to (n, 64) and emits per-label integer
    partial sums (one reduceat per batch, ≤ labels×64 partial rows per
    block); the 640-group finish runs on the driver.

    Exactness: float32→float64 is exact, ×2^20 is exact (power of
    two), floor has no rounding ties (unlike round-half modes, which
    differ between Arrow and DuckDB), so the quantized sums are exact
    ints on both sides and each centroid is ONE IEEE division."""
    t = _centroid_sums(sf_dir)
    centroid = t["sum_q"].to_numpy().astype(np.float64) / t[
        "n"
    ].to_numpy().astype(np.float64)
    return t.append_column("centroid", pa.array(centroid))


def _centroid_sums(sf_dir: str) -> pa.Table:
    """Distributed (label, dim, sum_q, n) exact quantized-embedding
    sums — the shared reduction behind q_label_centroids and
    q_centroid_sim (exactness contract in q_label_centroids)."""
    from .ops.agg import grouped_sum_count

    def partial(batch: pa.Table) -> pa.Table:
        n = len(batch)
        emb = batch["embedding"].combine_chunks()
        if isinstance(emb, pa.ChunkedArray):
            emb = (
                emb.chunk(0)
                if emb.num_chunks
                else pa.array([], type=pa.list_(pa.float32()))
            )
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        assert len(flat) == n * EMB_DIM, "embedding dim mismatch"
        q = np.floor(
            flat.astype(np.float64).reshape(n, EMB_DIM) * EMB_QSCALE
        ).astype(np.int64)
        labels = batch["label"].to_numpy(zero_copy_only=False)
        order = np.argsort(labels, kind="stable")
        ls = labels[order]
        starts = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]])
        sums = np.add.reduceat(q[order], starts, axis=0)
        counts = np.diff(np.append(starts, n))
        g = len(starts)
        return pa.table(
            {
                "label": pa.array(
                    np.repeat(ls[starts], EMB_DIM), type=pa.int32()
                ),
                "dim": pa.array(
                    np.tile(
                        np.arange(1, EMB_DIM + 1, dtype=np.int64), g
                    )
                ),
                "sum_q": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(counts, EMB_DIM)),
            }
        )

    parts = _read(sf_dir, "embeddings", ["label", "embedding"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_sum_count(
        parts, ["label", "dim"], sum_cols=["sum_q", "n"], final="driver"
    )


def q_centroid_sim(sf_dir: str):
    """Pairwise cosine similarity between per-label embedding
    centroids — the class-confusability / near-duplicate-class monitor
    of a SemDeDup-style pipeline. Rides the exact quantized-sum
    reduction of q_label_centroids (cosine of the MEAN vector equals
    cosine of the SUM vector — scale invariance — so the n division
    drops out entirely); all dot products are exact Python ints on the
    driver (labels×dims is dimension-sized; int64 would overflow at
    Σq ≈ 4e9 squared), and each output is the fixed mirrored IEEE
    chain float(dot) / (sqrt(float(naa)) · sqrt(float(nbb)))."""
    import math

    t = _centroid_sums(sf_dir).combine_chunks().sort_by(
        [("label", "ascending"), ("dim", "ascending")]
    )
    labels = np.unique(t["label"].to_numpy(zero_copy_only=False))
    sums = t["sum_q"].to_numpy(zero_copy_only=False).reshape(
        len(labels), -1
    )
    svecs = [[int(x) for x in row] for row in sums]
    norms = [sum(x * x for x in v) for v in svecs]
    la, lb, dots, coss = [], [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            d = sum(x * y for x, y in zip(svecs[i], svecs[j]))
            la.append(labels[i])
            lb.append(labels[j])
            dots.append(float(d))
            coss.append(
                float(d)
                / (math.sqrt(float(norms[i])) * math.sqrt(float(norms[j])))
            )
    return pa.table(
        {
            "label_a": pa.array(la, type=pa.int32()),
            "label_b": pa.array(lb, type=pa.int32()),
            "dot": pa.array(dots, type=pa.float64()),
            "cos": pa.array(coss, type=pa.float64()),
        }
    )


IMG_MULT = 16  # image rows per documents row (entry()'s flagship ratio)


def _image_points(sf_dir: str):
    """Streaming image+caption table (BASELINE.json input_hint schema)
    sized from the sf's documents table → phash-derived (x, y) points.
    The Morton de-interleave of the phash's low 40 bits is mirrored
    bit-for-bit by the oracle's HUGEINT-mod-2^64 multiply + 20-term
    bit-extraction expression (``_image_pts_cte``)."""
    import pyarrow.parquet as pq

    from .synth.images import image_dataset, phash_xy

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    images = image_dataset(n=n)

    def derive(batch: pa.Table) -> pa.Table:
        x, y = phash_xy(batch["phash"].to_numpy())
        return pa.table(
            {
                "image_id": batch["image_id"],
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    return images.map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )


def q_image_assign(sf_dir: str):
    """THE flagship north-star pipeline, driver-oracled: image+caption
    table → phash-derived coordinates → district assign (broadcast
    STRtree index, exact point-in-polygon) → per-district image count.
    Same DAG as ``__ray_entry__.entry()`` but with a value-exact DuckDB
    oracle (the BSP rect districts + the bit-exact phash→xy SQL)."""
    from .ops.agg import grouped_sum_count
    from .ops.assign import assign

    assigned = assign(
        _image_points(sf_dir),
        _districts(),
        source_id_col="image_id",
        target_id_col="district_id",
        targets_id_col="district_id",
    )
    return grouped_sum_count(
        assigned, ["district_id"], count_col="n_images", final="driver"
    )


def q_image_cells(sf_dir: str):
    """Tile (cell) assignment over the image table — the north rule's
    "tile assignments" check as a value-exact query: phash→xy → res-4
    hierarchical cell → count per cell (per-batch partials, 256-group
    driver merge)."""
    from .ops.agg import grouped_sum_count

    def tile(batch: pa.Table) -> pa.Table:
        from .geom.cells import CellGrid

        g = CellGrid(0, 0, EXTENT)
        cells = g.cell_of_points(
            batch["x"].to_numpy(), batch["y"].to_numpy(), 4
        )
        cx, cy, _ = CellGrid.unpack(cells)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy)})

    ds = _image_points(sf_dir).map_batches(
        tile, batch_format="pyarrow"
    )
    return grouped_sum_count(
        ds, ["cx", "cy"], count_col="n_images", final="driver"
    )


TILE_MAX_ZOOM = 4


def q_tile_pyramid(sf_dir: str):
    """Multi-zoom tile-pyramid build over the image corpus
    (ops/tiles.tile_pyramid): per-batch counts at the finest zoom,
    coarser levels rolled up from the PARTIALS by integer halving —
    one pass over the points, only tile partials move. The overview
    layer every web-map / COG pipeline precomputes."""
    from .ops.tiles import tile_pyramid

    return tile_pyramid(
        _image_points(sf_dir), "x", "y", extent=EXTENT,
        max_zoom=TILE_MAX_ZOOM,
    )


def q_caption_stats(sf_dir: str):
    """Cross-modal flagship composite: image+caption table →
    phash-derived points → district assign (broadcast STRtree, exact
    PIP) → join each image back to its source DOCUMENT (equi_join:
    measured-size broadcast-vs-coshuffle plan) → per-district caption
    statistics (image count + exact caption-chars sum). The image→doc
    key parses the zero-padded decimal in image_id — deterministic
    parity with the oracle's doc_id-carrying point CTE."""
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sum_count
    from .ops.assign import assign
    from .ops.join import equi_join

    def with_doc(b: pa.Table) -> pa.Table:
        # image_id = 'img' + 12-digit row index; doc_id = idx // 16
        idx = pc.cast(
            pc.utf8_slice_codeunits(b["image_id"], 3, 15), pa.int64()
        )
        return pa.table(
            {
                "image_id": b["image_id"],
                "doc_id": pc.divide(idx, IMG_MULT),
                "x": b["x"],
                "y": b["y"],
            }
        )

    pts = _image_points(sf_dir).map_batches(
        with_doc, batch_format="pyarrow", zero_copy_batch=True
    )
    assigned = assign(
        pts,
        _districts(),
        source_id_col="image_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        keep_cols=("doc_id",),
    )
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    joined = equi_join(
        assigned, docs, "doc_id", "doc_id", ["n_chars"]
    )
    out = grouped_sum_count(
        joined,
        ["district_id"],
        sum_cols=["n_chars"],
        count_col="n_images",
        final="driver",
    )
    return pa.table(
        {
            "district_id": out["district_id"],
            "n_images": out["n_images"],
            "caption_chars": out["n_chars"],
        }
    )


def q_raster_components(sf_dir: str):
    """Raster blob extraction over the image-occupancy grid
    (ops/raster.raster_components): cells with above-average image
    count form a mask; 4-adjacent mask cells merge into components
    labeled by their min linear cell id. Edges materialize via
    cell-id-keyed neighbor probes (no join operator), the labeling is
    the BSP min-propagation, isolated cells rejoin through a second
    keyed exchange — the oracle is a recursive-CTE min-label
    fixpoint."""
    from .ops.agg import grouped_sum_count
    from .ops.raster import raster_components

    def tile(batch: pa.Table) -> pa.Table:
        from .geom.cells import CellGrid

        g = CellGrid(0, 0, EXTENT)
        cells = g.cell_of_points(
            batch["x"].to_numpy(), batch["y"].to_numpy(), 4
        )
        cx, cy, _ = CellGrid.unpack(cells)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy)})

    ds = _image_points(sf_dir).map_batches(tile, batch_format="pyarrow")
    cnt = grouped_sum_count(
        ds, ["cx", "cy"], count_col="n_images", final="driver"
    )
    total = int(pc.sum(cnt["n_images"]).as_py())
    thr = total // 256 + 1
    mask = cnt.filter(pc.greater_equal(cnt["n_images"], thr))
    import ray.data

    mask_ds = ray.data.from_arrow(mask).repartition(4)
    return raster_components(
        mask_ds, width=16, weight_col="n_images"
    )


Q18_QTY = 150  # per-order quantity threshold (big_orders)
Q18_TOPN = 100
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1998-01-01"
Q5_REGION = 0  # n_regionkey filter (local_volume)


def q_big_orders(sf_dir: str):
    """TPC-H Q18 shape — large-volume orders: per-order exact quantity
    sums over lineitem (integer partials + bytes-aware keyed merge),
    HAVING-filter to the hot set (collected: it is small by the
    threshold's construction), attach order + customer dimensions by
    broadcast join, then global top-N by (totalprice DESC, orderkey)
    via per-block combiners + driver merge — no full sort, no
    all-to-all beyond the per-order reduce."""
    import pyarrow.parquet as pq
    import ray.data

    from .ops.agg import grouped_sum_count
    from .ops.join import broadcast_hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"],
    )

    def qty(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "qty": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
            }
        )

    per_order = grouped_sum_count(
        li.map_batches(qty, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        sum_cols=["qty"],
        final="hash",
    )
    hot = _collect(
        per_order.map_batches(
            lambda b: b.filter(
                pc.greater(b["qty"], pa.scalar(Q18_QTY, pa.int64()))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )
    joined = broadcast_hash_join(
        orders, hot, "o_orderkey", "l_orderkey", ["qty"]
    )
    joined = broadcast_hash_join(
        joined, cust, "o_custkey", "c_custkey", ["c_name"]
    )

    def shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "c_custkey": b["o_custkey"],
                "c_name": b["c_name"],
                "o_orderdate": b["o_orderdate"],
                "totalprice_c": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
                "sum_qty": b["qty"],
            }
        )

    def top_block(b: pa.Table) -> pa.Table:
        if b.num_rows <= Q18_TOPN:
            return b
        order = pc.sort_indices(
            b,
            sort_keys=[
                ("totalprice_c", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )
        return b.take(order.slice(0, Q18_TOPN))

    shaped = joined.map_batches(
        shape, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(top_block, batch_format="pyarrow", zero_copy_batch=True)
    all_tops = _collect(shaped)
    order = pc.sort_indices(
        all_tops,
        sort_keys=[
            ("totalprice_c", "descending"),
            ("o_orderkey", "ascending"),
        ],
    )
    return all_tops.take(order.slice(0, Q18_TOPN))


def q_local_volume(sf_dir: str, broadcast_limit: int = 2_000_000):
    """TPC-H Q5 shape — local supplier volume: revenue of lineitems
    whose SUPPLIER and CUSTOMER share a nation inside one region, per
    nation, over a two-year order window. Join plan: nation-filtered
    supplier and customer dimensions broadcast once; the date filter
    pushes to the orders parquet read; orders attach the customer
    nation by broadcast, lineitem attaches the supplier nation by
    broadcast, and the one genuinely corpus-sized join
    (lineitem ⋈ orders) goes through equi_join's measured-size plan
    (broadcast under ``broadcast_limit`` table rows, Dataset
    co-shuffle above). Revenue is exact integer 10⁻⁴ dollars."""
    from datetime import datetime

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data

    from .ops.agg import grouped_sum_count
    from .ops.join import broadcast_hash_join, equi_join

    lo = datetime.fromisoformat(Q5_DATE_LO)
    hi = datetime.fromisoformat(Q5_DATE_HI)

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    nkeys = nation.filter(
        pc.equal(nation["n_regionkey"], Q5_REGION)
    )
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sup = sup.filter(
        pc.is_in(
            sup["s_nationkey"],
            value_set=nkeys["n_nationkey"].combine_chunks(),
        )
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust = cust.filter(
        pc.is_in(
            cust["c_nationkey"],
            value_set=nkeys["n_nationkey"].combine_chunks(),
        )
    )

    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    odate = (pads.field("o_orderdate") >= pa.scalar(lo)) & (
        pads.field("o_orderdate") < pa.scalar(hi)
    )
    if n_orders <= broadcast_limit:
        ot = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
        ot = ot.filter(
            pc.and_(
                pc.greater_equal(ot["o_orderdate"], pa.scalar(lo)),
                pc.less(ot["o_orderdate"], pa.scalar(hi)),
            )
        )
        idx = pc.index_in(ot["o_custkey"], cust["c_custkey"].combine_chunks())
        mask = pc.is_valid(idx)
        odim = pa.table(
            {
                "o_orderkey": pc.filter(ot["o_orderkey"], mask),
                "cust_nation": pc.take(
                    cust["c_nationkey"], pc.filter(idx, mask)
                ),
            }
        )
    else:
        odim = broadcast_hash_join(
            ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_custkey"],
                filter=odate,
            ),
            cust,
            "o_custkey",
            "c_custkey",
            ["c_nationkey"],
        ).map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "cust_nation": b["c_nationkey"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev(b: pa.Table) -> pa.Table:
        price = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64()
        )
        disc = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "revenue_u": pc.multiply(
                    price, pc.subtract(pa.scalar(100, pa.int64()), disc)
                ),
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    li = broadcast_hash_join(
        li, sup, "l_suppkey", "s_suppkey", ["s_nationkey"]
    )
    li = equi_join(
        li,
        odim,
        "l_orderkey",
        "o_orderkey",
        ["cust_nation"],
        broadcast_limit=broadcast_limit,
    )
    li = li.map_batches(
        lambda b: b.filter(
            pc.equal(b["s_nationkey"], b["cust_nation"])
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = grouped_sum_count(
        li,
        ["s_nationkey"],
        sum_cols=["revenue_u"],
        count_col="n_lineitems",
        final="driver",
    )
    # attach nation names driver-side (tiny dimension)
    idx = pc.index_in(
        out["s_nationkey"], nation["n_nationkey"].combine_chunks()
    )
    out = out.append_column("n_name", pc.take(nation["n_name"], idx))
    out = out.select(
        ["s_nationkey", "n_name", "revenue_u", "n_lineitems"]
    )
    return out.sort_by(
        [("revenue_u", "descending"), ("s_nationkey", "ascending")]
    )


def _collect(ds) -> pa.Table:
    """Small-result Dataset → driver pa.Table. Materialize FIRST —
    bare to_arrow_refs() re-executes the whole plan a second time for
    its schema fetch (ROUND_NOTES measurement discipline)."""
    import ray

    raw = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in raw if t.num_rows] or raw[:1]
    return pa.concat_tables(tabs, promote_options="default")


def q_hot_cells(sf_dir: str):
    """Hot-cell detection over the image-occupancy grid
    (ops/raster.hot_cells): res-4 cell counts of the phash-derived
    image points, then 8-neighborhood strict local maxima — the
    skew-detection step that feeds hot-cell splitting. One cell-keyed
    probe exchange (no join operator), vectorized reduceat
    neighborhood max per partition; oracle = LEFT self-join on
    Chebyshev distance ≤ 1."""
    import ray.data

    from .ops.agg import grouped_sum_count
    from .ops.raster import hot_cells

    def tile(batch: pa.Table) -> pa.Table:
        from .geom.cells import CellGrid

        g = CellGrid(0, 0, EXTENT)
        cells = g.cell_of_points(
            batch["x"].to_numpy(), batch["y"].to_numpy(), 4
        )
        cx, cy, _ = CellGrid.unpack(cells)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy)})

    ds = _image_points(sf_dir).map_batches(tile, batch_format="pyarrow")
    cnt = grouped_sum_count(
        ds, ["cx", "cy"], count_col="n_images", final="driver"
    )
    cells = ray.data.from_arrow(cnt).repartition(4)
    out = hot_cells(cells, weight_col="n_images", width=16)
    tbl = _collect(out)
    hot = tbl.filter(tbl["is_hot"])
    return hot.select(
        ["cx", "cy", "n_images", "n_neighbors", "max_neighbor_w"]
    ).sort_by([("cx", "ascending"), ("cy", "ascending")])


def q_word_stats(sf_dir: str):
    """Per-document word-repetition quality signals (the RedPajama
    duplicate-fraction family): n_words, n_distinct words, max word
    frequency, and dup_frac = (n_words − n_distinct)/n_words — exact
    int stats per batch-local group pass (a doc is one row; no
    shuffle), ONE float division mirrored in the SQL."""

    def stats(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        lens = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        doc_idx = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        t = pa.table(
            {"d": pa.array(doc_idx), "term": flat}
        ).group_by(["d", "term"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        c = t["count_all"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d, kind="stable")
        ds_, cs = d[order], c[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        n_words = np.add.reduceat(cs, starts)
        n_distinct = np.diff(np.append(starts, len(ds_)))
        max_freq = np.maximum.reduceat(cs, starts)
        dup = (
            n_words.astype(np.float64) - n_distinct.astype(np.float64)
        ) / n_words.astype(np.float64)
        return pa.table(
            {
                "doc_id": b["doc_id"].take(pa.array(ds_[starts])),
                "n_words": pa.array(n_words),
                "n_distinct": pa.array(n_distinct.astype(np.int64)),
                "max_freq": pa.array(max_freq),
                "dup_frac": pa.array(dup),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


HIST_WIDTH = 500_000  # cents per histogram bucket ($5000)


def q_price_hist(sf_dir: str):
    """Fixed-width histogram of order totals: integer-cents value //
    width → per-bucket count + exact sum (per-batch partials, tiny
    driver merge) — the width_bucket reporting shape."""
    from .ops.agg import grouped_sum_count

    def bucket(b: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy()
        return pa.table(
            {
                "bucket": pa.array(v // HIST_WIDTH),
                "v": pa.array(v),
            }
        )

    ds = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    out = grouped_sum_count(
        ds, ["bucket"], sum_cols=["v"], count_col="n", final="driver"
    )
    return out.rename_columns(
        ["bucket", "total_c", "n"]
    ).sort_by([("bucket", "ascending")])


BFS_HOPS = 4
BFS_SRC_MOD = 251  # sources = doc_ids ≡ 0 (mod 251)


def q_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distances over the deterministic document
    graph (ops/graph.bfs_hops — the pagerank iteration-invariant
    layout: edges shuffle once, each round is two raw-task passes).
    Sources = doc_ids divisible by 251; output = every node within
    4 hops with its exact distance. Oracle = recursive-CTE min-dist
    fixpoint bounded at the same depth."""
    import pyarrow.parquet as pq

    from .ops.graph import bfs_hops

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = _read(sf_dir, "documents", ["doc_id"])

    def mk_edges(batch: pa.Table) -> pa.Table:
        k = batch["doc_id"].to_numpy()
        deg = 1 + (k % 3)
        src = np.repeat(k, deg)
        start = np.repeat(np.cumsum(deg) - deg, deg)
        slot = np.arange(len(src), dtype=np.int64) - start
        dst = (src * AX + slot * PR_EDGE_C + BX) % n
        return pa.table(
            {"src": pa.array(src), "dst": pa.array(dst)}
        )

    edges = docs.map_batches(
        mk_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b["doc_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    sources = pa.array(
        list(range(0, n, BFS_SRC_MOD)), type=pa.int64()
    )
    out = bfs_hops(edges, nodes, sources, max_hops=BFS_HOPS)
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "hops"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_dedup_rewrite(sf_dir: str):
    """Dedup REWRITE — the survivor corpus after near-duplicate
    clustering: cluster members that are not their cluster's canonical
    (min-id) keeper drop out via a streaming anti-join (the drop-key
    set is the duplicate count, broadcast once under the guarded
    limit; corpus payloads never move). Completes the near_dup story:
    detection (near_dup) → rewrite (this)."""
    from .ops.join import semi_join
    from .text.cluster import near_dup_components

    comp = near_dup_components(
        _read(sf_dir, "documents", ["doc_id", "text"])
    )
    drops = comp.map_batches(
        lambda b: b.filter(
            pc.not_equal(b["doc_id"], b["component_id"])
        ).select(["doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return semi_join(
        _read(sf_dir, "documents", ["doc_id"]),
        drops,
        "doc_id",
        anti=True,
    )


def q_search_map(sf_dir: str):
    """Cross-modal retrieval composite — search WHERE the matching
    images are: BM25 top-k over the caption-source documents (exact
    integer stats, fixed IEEE score), then the hit docs' images
    (semi-filter on the tiny hit-key set, broadcast in-closure),
    phash-derived points → district assign → per-district counts. One
    streaming image pass; the text pass reduces to k rows before
    anything joins."""
    from .ops.agg import grouped_sum_count
    from .ops.assign import assign
    from .text.rank import bm25_topk

    hits = bm25_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        terms=BM25_TERMS,
        k=BM25_K,
    )
    keys = hits["doc_id"].combine_chunks()

    def with_doc(b: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(b["image_id"], 3, 15), pa.int64()
        )
        doc = pc.divide(idx, IMG_MULT)
        mask = pc.is_in(doc, value_set=keys)
        return pa.table(
            {
                "image_id": b["image_id"],
                "x": b["x"],
                "y": b["y"],
            }
        ).filter(mask)

    pts = _image_points(sf_dir).map_batches(
        with_doc, batch_format="pyarrow", zero_copy_batch=True
    )
    assigned = assign(
        pts,
        _districts(),
        source_id_col="image_id",
        target_id_col="district_id",
        targets_id_col="district_id",
    )
    out = grouped_sum_count(
        assigned, ["district_id"], count_col="n_images", final="driver"
    )
    return out.sort_by([("district_id", "ascending")])


def q_percentiles_cont(sf_dir: str):
    """Interpolated per-priority price quantiles
    (ops/curate.grouped_quantiles_cont): same distinct-value count
    histogram as the disc variant — only (key, value, count) rows move
    — with DuckDB quantile_cont's probed IEEE interpolation
    (pos = double(q)·(n−1); lo·(1−frac) + hi·frac)."""
    from .ops.curate import grouped_quantiles_cont

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    ds = _read(
        sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_quantiles_cont(
        ds, "o_orderpriority", "v", final="driver"
    )


def q_revenue_cube(sf_dir: str):
    """OLAP cross-tab: integer-cents order totals + counts over
    GROUP BY CUBE(o_orderpriority, o_orderstatus) — one corpus
    reduction to the finest aggregate, the other three groupings
    re-sum it driver-locally and exactly (ops/agg.grouped_cube)."""
    from .ops.agg import grouped_cube

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "o_orderstatus": b["o_orderstatus"],
                "total_c": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    ds = _read(
        sf_dir, "orders",
        ["o_orderpriority", "o_orderstatus", "o_totalprice"],
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_cube(
        ds,
        ["o_orderpriority", "o_orderstatus"],
        sum_cols=["total_c"],
        count_col="n",
    )


def q_supplier_prank(sf_dir: str):
    """Per-nation percent_rank of supplier account balances
    (ops/window.grouped_percent_rank): one keyed shuffle, vectorized
    run-start forward-fill rank, ONE float64 (rank−1)/(n−1) division
    per row — gaps semantics with the SQL-standard single-row 0.0."""
    from .ops.window import grouped_percent_rank

    return grouped_percent_rank(
        _read(sf_dir, "supplier",
              ["s_suppkey", "s_nationkey", "s_acctbal"]),
        ["s_nationkey"],
        "s_acctbal",
        keep_cols=["s_suppkey"],
    )


def q_tfidf(sf_dir: str):
    """Per-document top-3 tf-idf keywords (text/rank.tfidf_topk):
    exact-integer document frequencies (disjoint per-batch partials —
    a doc lives in one batch), integer-quantized score
    (tf·10⁶·N) // df broadcast-joined back, per-doc top-k emitted
    batch-locally. Totalized by (score_u DESC, term)."""
    from .text.rank import tfidf_topk

    return tfidf_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=3
    )


def q_patch_stats(sf_dir: str):
    """Pixel-level patchify statistics over the image table
    (media/image.patch_stats): decode every payload — every 5th row
    travels through the from-scratch PNG codec, the rest are raw; PNG
    is LOSSLESS so the pixel oracle stays exact — split each raster
    into 4×4 tiles and reduce the per-(image, tile) exact integer
    pixel sums to a corpus-level per-tile brightness map
    (sum/min/max/count). The oracle recomputes every pixel from the
    synthetic generator's closed form ((idx·M + seed + 97·j) mod 256)
    — byte-identical to what the codec path decodes."""
    import pyarrow.parquet as pq

    from .media.image import patch_stats
    from .synth.images import image_dataset

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    images = image_dataset(n=n, png_every=5)
    tiles = patch_stats(images, patch=4)

    def _rename(g: pa.Table, m: dict) -> pa.Table:
        # name-matching: Arrow group_by's output order is not
        # keys-first (the grouped_sum_count lesson)
        return g.rename_columns([m.get(c, c) for c in g.column_names])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["px", "py"], use_threads=False).aggregate(
            [("psum", "sum"), ("psum", "min"), ("psum", "max"),
             ([], "count_all")]
        )
        return _rename(
            g,
            {
                "psum_sum": "pixel_sum",
                "psum_min": "min_patch_sum",
                "psum_max": "max_patch_sum",
                "count_all": "n_images",
            },
        )

    merged = _collect(
        tiles.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    out = merged.group_by(["px", "py"], use_threads=False).aggregate(
        [("pixel_sum", "sum"), ("min_patch_sum", "min"),
         ("max_patch_sum", "max"), ("n_images", "sum")]
    )
    out = _rename(
        out,
        {
            "pixel_sum_sum": "pixel_sum",
            "min_patch_sum_min": "min_patch_sum",
            "max_patch_sum_max": "max_patch_sum",
            "n_images_sum": "n_images",
        },
    )
    return out.select(
        ["px", "py", "n_images", "pixel_sum", "min_patch_sum",
         "max_patch_sum"]
    ).sort_by([("px", "ascending"), ("py", "ascending")])


def q_aspect_buckets(sf_dir: str):
    """SDXL-style aspect-ratio bucketing over the image table
    (media/buckets.aspect_assign): every image goes to the nearest of
    17 canonical (w, h) training resolutions by an exact-integer
    nearest-aspect criterion (|SCALE·w − a·h| argmin — no float ratio,
    no log), then per-bucket image counts + pixel sums. The synthetic
    table ships constant 16×16 dims, so the query plants realistic
    dims from the image index (512..2048 step 64 on each axis — the
    redact/pagerank planted-derivation pattern); the op itself reads
    whatever ``w``/``h`` columns the table carries.

    Scale shape: stateless vectorized map_batches (n×17 int64 metric
    per batch against a module-constant bucket table), 17-group driver
    merge. No shuffle."""
    import pyarrow.parquet as pq

    from .media.buckets import aspect_assign
    from .ops.agg import grouped_sum_count
    from .synth.images import image_dataset

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows

    def plant_dims(b: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(b["image_id"], 3, 15), pa.int64()
        ).to_numpy()
        w = (512 + ((idx * 7) % 25) * 64).astype(np.int64)
        h = (512 + ((idx * 11) % 25) * 64).astype(np.int64)
        return pa.table(
            {
                "image_id": b["image_id"],
                "w": pa.array(w),
                "h": pa.array(h),
                "pixels": pa.array(w * h),
            }
        )

    ds = image_dataset(n=n).map_batches(
        plant_dims, batch_format="pyarrow", zero_copy_batch=True
    )
    tagged = aspect_assign(ds)
    out = grouped_sum_count(
        tagged,
        ["bucket_id", "bucket_w", "bucket_h"],
        sum_cols=["pixels"],
        count_col="n_images",
        final="driver",
    )
    return out.select(
        ["bucket_id", "bucket_w", "bucket_h", "n_images", "pixels"]
    ).sort_by([("bucket_id", "ascending")])


def q_image_hist(sf_dir: str):
    """Region-of-interest pixel histogram over the image table
    (media/image.pixel_histogram): decode every payload — every 5th
    row travels through the from-scratch PNG codec, lossless, so the
    closed-form pixel oracle stays exact — crop the top-left 8×8
    exposure-metering window and count per-channel byte values. Each
    batch reduces to ≤768 ``(ch, v, n)`` partial rows (one bincount
    per channel); the driver merge is a 768-key grouped sum, so
    payload bytes never leave the stage at any corpus size. The
    oracle recomputes every cropped byte from the generator's closed
    form pixel(idx, j) = (idx·M + 42 + 97·j) mod 256, j = 3·(16r+c)+ch
    (the full-raster histogram is provably flat — 97 is a unit mod
    256 — so the crop is what makes the check layout-sensitive)."""
    import pyarrow.parquet as pq

    from .media.image import pixel_histogram
    from .synth.images import image_dataset

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    parts = pixel_histogram(image_dataset(n=n, png_every=5), crop=8)
    merged = _collect(parts)
    out = merged.group_by(["ch", "v"], use_threads=False).aggregate(
        [("n", "sum")]
    )
    out = out.rename_columns(
        [{"n_sum": "n"}.get(c, c) for c in out.column_names]
    )
    return out.select(["ch", "v", "n"]).sort_by(
        [("ch", "ascending"), ("v", "ascending")]
    )


def q_image_moments(sf_dir: str):
    """Per-image grayscale spatial moments + intensity centroid
    (media/image.image_moments): decode every payload (every 5th row
    through the from-scratch PNG codec — lossless, so the closed-form
    pixel oracle stays exact; JPEG rows are excluded because quality
    98 is PSNR-bounded, not bit-exact), one int64 matmul per batch
    for all five weighted sums.
    The oracle evaluates the 256 possible rasters once (pure function
    of base = (idx·M + 42) mod 256) and joins images to their base —
    O(docs + 65k) on the SQL side while the engine decodes every real
    payload. cx/cy are the two mirrored divisions."""
    import pyarrow.parquet as pq

    from .media.image import image_moments
    from .synth.images import image_dataset

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    return image_moments(image_dataset(n=n, png_every=5))


def q_dominant_color(sf_dir: str):
    """Per-image dominant 9-bit RGB bucket
    (media/image.dominant_color): decode every payload (every 5th row
    through the from-scratch PNG codec), one offset-bincount per
    batch; ties break to the smallest bucket. The oracle evaluates
    the 256 possible rasters once and joins images to their base."""
    import pyarrow.parquet as pq

    from .media.image import dominant_color
    from .synth.images import image_dataset

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    return dominant_color(image_dataset(n=n, png_every=5))


def q_image_sharpness(sf_dir: str):
    """Per-image total-variation sharpness screen
    (media/image.gradient_energy): decode every payload (every 3rd
    row through the from-scratch PNG codec) and emit the exact
    integer sum of |Δ| of the summed-channel gray raster along both
    axes — the blur/flat-image filter of a vision-curation pipeline.
    The oracle exploits that the synthetic raster is a pure function
    of base = (idx·M + 42) mod 256: it evaluates the 256 possible
    gray rasters once (256 bases × 256 positions), reduces each to
    its sharpness, and joins images to their base — so the SQL side
    is O(docs + 65k) regardless of corpus size while the engine
    decodes every real payload."""
    import pyarrow.parquet as pq

    from .media.image import gradient_energy
    from .synth.images import image_dataset

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    out = _collect(gradient_energy(image_dataset(n=n, png_every=3)))
    return out.sort_by("image_id")


SHARD_CAP = 64_000  # bytes per output shard in q_image_shards


def q_image_shards(sf_dir: str):
    """Curated shard manifest — the write-side composite of an image
    curation pipeline (ops/manifest.shard_manifest): quality-filter
    the image stream (drop rows whose phash ∈ a 10/97 residue band —
    the deterministic stand-in for a model-score threshold), then pack
    survivors into fixed-byte-capacity output shards in image_id order
    via one exact global cumulative-byte scan. Per shard: row count,
    byte total, first/last image id (the resumable-writer manifest).

    Rows never move: per-block byte sums (one int per block) → driver
    prefix → per-block stamp + per-shard partial reduce; the
    ``bytes`` lengths come from the REAL payload column
    (binary_length), which for the raw-format synthetic table equals
    w·h·3 — the SQL oracle's expression."""
    import pyarrow.parquet as pq

    from .ops.manifest import shard_manifest
    from .synth.images import image_dataset

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows

    def curate(b: pa.Table) -> pa.Table:
        ph = b["phash"].to_numpy()  # ≥0 by construction (63-bit mask)
        b = b.filter(pa.array(ph % 97 >= 10))
        return pa.table(
            {
                "image_id": b["image_id"],
                "blen": pc.cast(
                    pc.binary_length(b["bytes"]), pa.int64()
                ),
            }
        )

    ds = image_dataset(n=n).map_batches(
        curate, batch_format="pyarrow", zero_copy_batch=True
    )
    return shard_manifest(
        ds, id_col="image_id", length_col="blen", cap=SHARD_CAP
    )


def q_props_extract(sf_dir: str):
    """Semi-structured extraction: parse the events JSON ``props``
    column ({"k": N}), pull the integer field and reduce per
    event_type — one vectorized RE2 ``extract_regex`` per batch (no
    per-row JSON parser in the hot path), integer partials, tiny
    driver merge. Value-exact vs DuckDB's json_extract: both sides
    yield NULL on a missing key (regex no-match → null, skipped by
    sum on both engines)."""
    from .ops.agg import grouped_sum_count

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<v>-?\d+)')
        k = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table(
            {
                "event_type": b["event_type"],
                "k": k,
                "has_k": pc.cast(pc.is_valid(k), pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["event_type", "props"]).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True
    )
    out = grouped_sum_count(
        ds,
        ["event_type"],
        sum_cols=["k", "has_k"],
        count_col="n",
        final="driver",
    )
    return out.rename_columns(["event_type", "sum_k", "n_with_k", "n"])


def q_district_bbox(sf_dir: str):
    """Geometry-keyed groupby-aggregate on the flagship table (the
    north star's "aggregate" op): per-district bounding box + count of
    the assigned image points — per-batch Arrow min/max partials, 64-
    group driver merge (ops/agg.grouped_minmax). min/max partials
    re-merge exactly, so the result is partition-invariant."""
    from .ops.agg import grouped_minmax
    from .ops.assign import assign

    assigned = assign(
        _image_points(sf_dir),
        _districts(),
        source_id_col="image_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        keep_cols=("x", "y"),
    )
    return grouped_minmax(
        assigned,
        ["district_id"],
        ["x", "y"],
        count_col="n_images",
    )


PR_SCALE = 10**12
PR_ITERS = 3
PR_EDGE_C = 12345  # per-slot stride in the derived edge destinations


def q_pagerank(sf_dir: str):
    """Fixed-point PageRank (ops/graph.pagerank) over a deterministic
    document graph: node = doc_id, out-degree 1 + doc_id%3, edge k →
    (doc_id·AX + k·PR_EDGE_C + BX) mod n. Three BSP iterations, each
    two keyed exchanges (source-keyed rank propagate, dest-keyed
    combine) — exact int64 mass arithmetic end to end, mirrored by a
    3×-unrolled join/group CTE oracle. doc_id·AX must stay inside
    int64 (holds to ~10^14 nodes)."""
    import pyarrow.parquet as pq

    from .ops.graph import pagerank

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = _read(sf_dir, "documents", ["doc_id"])

    def mk_edges(batch: pa.Table) -> pa.Table:
        k = batch["doc_id"].to_numpy()
        deg = 1 + (k % 3)
        src = np.repeat(k, deg)
        start = np.repeat(np.cumsum(deg) - deg, deg)
        slot = np.arange(len(src), dtype=np.int64) - start
        dst = (src * AX + slot * PR_EDGE_C + BX) % n
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "outdeg": pa.array(np.repeat(deg, deg)),
            }
        )

    edges = docs.map_batches(
        mk_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b["doc_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = pagerank(edges, nodes, n, iterations=PR_ITERS, scale=PR_SCALE)
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "r"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------------------ oracle SQL


_ASPECT_SCALE = 4096  # == media.buckets.ASPECT_SCALE (asserted below)


def _bucket_values() -> str:
    from .media.buckets import ASPECT_SCALE, bucket_sql_values

    assert ASPECT_SCALE == _ASPECT_SCALE
    return bucket_sql_values()


def _image_pts_cte() -> str:
    """CTEs imgs(p) + ipts(x, y): the synthetic image table's phash
    and Morton-derived point, bit-exact vs synth/images (validated:
    HUGEINT (id·M) mod 2^63 == the engine's uint64 wrap + mask; the
    20-term bit extraction == _compact1by1 on the low 40 bits)."""
    mult = 0x9E3779B97F4A7C15
    cx = " + ".join(f"((p >> {2 * k}) & 1) * {1 << k}" for k in range(20))
    cy = " + ".join(
        f"((p >> {2 * k + 1}) & 1) * {1 << k}" for k in range(20)
    )
    # DuckDB's range() table function can't take a subquery bound, so
    # the id domain 0..16n-1 is derived as doc_id*16 + k — doc_id is
    # the contiguous 0-based row index of the driver's documents table
    # (verified 0..n-1 at every sf)
    return f"""
        imgs AS (
          SELECT CAST((CAST(doc_id * {IMG_MULT} + k AS HUGEINT) * {mult})
                      % 9223372036854775808 AS BIGINT) AS p
          FROM documents,
               (SELECT unnest(range(0, {IMG_MULT})) AS k)),
        ipts AS (
          SELECT CAST(({cx}) AS DOUBLE) + 0.5 AS x,
                 CAST(({cy}) AS DOUBLE) + 0.5 AS y
          FROM imgs)"""


def _pagerank_sql() -> str:
    """3×-unrolled fixed-point PageRank oracle — every arithmetic step
    (floor div on positive ints) mirrors ops/graph.pagerank exactly;
    DuckDB's HUGEINT sums collapse back to BIGINT per iteration."""
    n = "(SELECT count(*) FROM documents)"
    base = f"(15 * {PR_SCALE}) // (100 * {n})"

    def step(prev: str, name: str) -> str:
        return f"""
        {name} AS (
          SELECT d.doc_id AS v,
                 CAST({base} + COALESCE(t.s, 0) AS BIGINT) AS r
          FROM documents d
          LEFT JOIN (
            SELECT e.dst AS v, sum((85 * p.r) // (100 * e.outdeg)) AS s
            FROM edges e JOIN {prev} p ON e.src = p.v
            GROUP BY e.dst) t ON d.doc_id = t.v)"""

    return f"""
        WITH ks AS (SELECT unnest(range(0, 3)) AS k),
        edges AS (
          SELECT doc_id AS src,
                 (doc_id * {AX} + k * {PR_EDGE_C} + {BX}) % {n} AS dst,
                 1 + doc_id % 3 AS outdeg
          FROM documents, ks WHERE k < 1 + doc_id % 3),
        r0 AS (
          SELECT doc_id AS v,
                 CAST({PR_SCALE} // {n} AS BIGINT) AS r
          FROM documents),{step("r0", "r1")},{step("r1", "r2")},{step("r2", "r3")}
        SELECT v AS doc_id, r FROM r3
    """


def _redact_sql() -> str:
    """DuckDB oracle for q_redact: identical planted-PII derivation,
    identical RE2 patterns nested in the same replace order."""
    from .text.analysis import PII_PATTERNS

    (email, e_tok), (ip, i_tok), (phone, p_tok) = PII_PATTERNS
    return f"""
        WITH planted AS (
          SELECT doc_id,
            text || ' contact user' || CAST(doc_id AS VARCHAR) || '@ex'
              || CAST(doc_id % 7 AS VARCHAR) || '.com from 10.'
              || CAST(doc_id % 256 AS VARCHAR) || '.0.'
              || CAST(doc_id % 100 AS VARCHAR)
              || ' call +1555000' || CAST(doc_id AS VARCHAR) AS t
          FROM documents
        )
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(t,
            '{email}', '{e_tok}', 'g'),
            '{ip}', '{i_tok}', 'g'),
            '{phone}', '{p_tok}', 'g') AS clean_text,
          CAST(len(regexp_extract_all(t, '{email}'))
             + len(regexp_extract_all(t, '{ip}'))
             + len(regexp_extract_all(t, '{phone}')) AS BIGINT)
            AS n_redacted
        FROM planted
    """


def _chunks_sql() -> str:
    c, o = CHUNK_SIZE, CHUNK_OVERLAP
    s = c - o
    return f"""
        WITH d AS (
          SELECT doc_id, text,
            CASE WHEN len(text) <= {c} THEN 1
                 ELSE (len(text) - {c} + {s - 1}) // {s} + 1 END AS n
          FROM documents
        ), ks AS (
          SELECT unnest(range(0, (SELECT max(n) FROM d))) AS k
        )
        SELECT doc_id, k AS chunk_idx,
               substr(text, CAST(1 + k*{s} AS INT), {c}) AS chunk
        FROM d JOIN ks ON ks.k < d.n
    """


def _bm25_ctes() -> tuple[str, str]:
    """(ctes, top-k select) pair shared by the bm25 oracle and the
    search_map composite — one generation site, zero drift."""
    tf_cols = ",\n            ".join(
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ",\n            ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    term_exprs = "\n          + ".join(
        f"(CAST(tf{i} AS DOUBLE) * 2.25)"
        f" / (CAST(tf{i} AS DOUBLE) + 1.25 * ((1.0 - 0.75)"
        f" + 0.75 * (CAST(dl AS DOUBLE)"
        f" / (CAST(total_len AS DOUBLE) / CAST(n AS DOUBLE)))))"
        f" * ((CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5))"
        for i in range(len(BM25_TERMS))
    )
    ctes = f"""s AS (
          SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
            {tf_cols}
          FROM documents
        ), g AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(dl) AS BIGINT) AS total_len,
            {df_cols}
          FROM s
        )"""
    select = f"""SELECT doc_id,
          {term_exprs} AS score
        FROM s, g
        ORDER BY score DESC, doc_id
        LIMIT {BM25_K}"""
    return ctes, select


def _bm25_sql() -> str:
    """BM25 top-k, expression-for-expression the engine's fixed IEEE
    form (text/rank.py): algebraic idf, dyadic constants k1=1.25,
    b=0.75, k1+1=2.25, left-to-right per-term sum."""
    ctes, select = _bm25_ctes()
    return f"WITH {ctes}\n        {select}"


def _near_dup_ctes() -> str:
    """The shingle→Jaccard→transitive-closure CTE chain shared by the
    near_dup oracle and the dedup_rewrite composite."""
    return """
            t AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
            idx AS (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i
                    FROM t WHERE len(toks) >= 3),
            shing AS (SELECT DISTINCT doc_id,
                        toks[i] || chr(1) || toks[i+1] || chr(1)
                          || toks[i+2] AS sh
                      FROM idx),
            ns AS (SELECT doc_id, count(*) AS n FROM shing
                   GROUP BY doc_id),
            pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
                             count(*) AS c
                      FROM shing a JOIN shing b
                        ON a.sh = b.sh AND a.doc_id < b.doc_id
                      GROUP BY a.doc_id, b.doc_id),
            edges AS (SELECT p.a, p.b FROM pairs p
                      JOIN ns na ON na.doc_id = p.a
                      JOIN ns nb ON nb.doc_id = p.b
                      WHERE CAST(p.c AS DOUBLE)
                            / (CAST(na.n AS DOUBLE)
                               + CAST(nb.n AS DOUBLE)
                               - CAST(p.c AS DOUBLE)) >= 0.5),
            und AS (SELECT a AS s, b AS d FROM edges
                    UNION ALL SELECT b, a FROM edges),
            reach AS (SELECT s, d FROM und
                      UNION
                      SELECT r.s, u.d FROM reach r
                      JOIN und u ON r.d = u.s)"""


def _search_map_sql() -> str:
    """search_map composite oracle: the bm25 top-k CTE feeds the
    doc_id-carrying image-point CTE (caption_stats pattern) and the
    district rect join."""
    ctes, select = _bm25_ctes()
    cx = " + ".join(f"((p >> {2 * k}) & 1) * {1 << k}" for k in range(20))
    cy = " + ".join(
        f"((p >> {2 * k + 1}) & 1) * {1 << k}" for k in range(20)
    )
    dist = districts_sql(N_DISTRICTS)
    return f"""
        WITH {ctes},
        hits AS ({select}),
        imgs3 AS (
          SELECT CAST((CAST(h.doc_id * {IMG_MULT} + k AS HUGEINT)
                       * {0x9E3779B97F4A7C15})
                      % 9223372036854775808 AS BIGINT) AS p
          FROM hits h, (SELECT unnest(range(0, {IMG_MULT})) AS k)),
        ipts3 AS (
          SELECT CAST(({cx}) AS DOUBLE) + 0.5 AS x,
                 CAST(({cy}) AS DOUBLE) + 0.5 AS y
          FROM imgs3)
        SELECT district_id, CAST(count(*) AS BIGINT) AS n_images
        FROM ipts3, {dist}
        WHERE x >= minx AND x < maxx AND y >= miny AND y < maxy
        GROUP BY district_id
    """


def _bm25_multi_sql() -> str:
    """Per-query branches over ONE shared tf/df CTE pair (the union
    vocabulary), each branch's per-term sum in the query's own term
    order — token-for-token the engine's fixed IEEE expression."""
    vocab = sorted({t for q in BM25_MULTI for t in BM25_MULTI[q]})
    vpos = {t: i for i, t in enumerate(vocab)}
    tf_cols = ",\n            ".join(
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(vocab)
    )
    df_cols = ",\n            ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(vocab))
    )

    def term_expr(i: int) -> str:
        return (
            f"(CAST(tf{i} AS DOUBLE) * 2.25)"
            f" / (CAST(tf{i} AS DOUBLE) + 1.25 * ((1.0 - 0.75)"
            f" + 0.75 * (CAST(dl AS DOUBLE)"
            f" / (CAST(total_len AS DOUBLE) / CAST(n AS DOUBLE)))))"
            f" * ((CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df{i} AS DOUBLE) + 0.5))"
        )

    joiner = "\n          + "
    branch_list = []
    for q in sorted(BM25_MULTI):
        qsum = joiner.join(term_expr(vpos[t]) for t in BM25_MULTI[q])
        branch_list.append(
            f"""        (SELECT '{q}' AS query, doc_id,
          {qsum} AS score
        FROM s, g
        ORDER BY score DESC, doc_id
        LIMIT {BM25_K})"""
        )
    branches = "\n        UNION ALL\n".join(branch_list)
    return f"""
        WITH s AS (
          SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
            {tf_cols}
          FROM documents
        ), g AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(dl) AS BIGINT) AS total_len,
            {df_cols}
          FROM s
        )
        SELECT * FROM (
{branches}
        )
        ORDER BY query, score DESC, doc_id
    """


def _pack_sql() -> str:
    """Per-partition greedy packing as a recursive scan: every id-range
    partition advances one doc per recursion step in parallel chains
    (same whitespace token measure as the token_count oracle)."""
    b, r = PACK_BUDGET, PACK_RANGE
    return rf"""
        WITH RECURSIVE d AS (
          SELECT doc_id, doc_id // {r} AS part,
            len(regexp_split_to_array(trim(text), '\s+')) AS t,
            row_number() OVER (
              PARTITION BY doc_id // {r} ORDER BY doc_id
            ) AS rn
          FROM documents
        ), s AS (
          SELECT part, rn, doc_id, t,
                 CAST(0 AS BIGINT) AS bin, t AS fill
          FROM d WHERE rn = 1
          UNION ALL
          SELECT d.part, d.rn, d.doc_id, d.t,
            CASE WHEN s.fill + d.t <= {b} THEN s.bin ELSE s.bin + 1 END,
            CASE WHEN s.fill + d.t <= {b} THEN s.fill + d.t ELSE d.t END
          FROM s JOIN d ON d.part = s.part AND d.rn = s.rn + 1
        )
        SELECT doc_id, part * 4294967296 + bin AS bin_id FROM s
    """


def _points_expr():
    return (
        f"((doc_id*{AX}+{BX})%{EXTENT})+0.5",
        f"((doc_id*{AY}+{BY})%{EXTENT})+0.5",
    )


def _rects_cte():
    return f"""
srcs AS (
  SELECT doc_id,
    CAST((doc_id*{AX}+{BX})%{EXTENT} - (1000+(doc_id%97)*50) AS DOUBLE) AS sminx,
    CAST((doc_id*{AY}+{BY})%{EXTENT} - (1000+(doc_id%89)*50) AS DOUBLE) AS sminy,
    CAST((doc_id*{AX}+{BX})%{EXTENT} + (1000+(doc_id%97)*50) AS DOUBLE) AS smaxx,
    CAST((doc_id*{AY}+{BY})%{EXTENT} + (1000+(doc_id%89)*50) AS DOUBLE) AS smaxy
  FROM documents),
dist AS (SELECT * FROM {districts_sql(N_DISTRICTS)} ),
pieces AS (
  SELECT s.doc_id, d.district_id,
    greatest(0.0, least(s.smaxx,d.maxx)-greatest(s.sminx,d.minx))
    * greatest(0.0, least(s.smaxy,d.maxy)-greatest(s.sminy,d.miny)) AS area
  FROM srcs s JOIN dist d
    ON s.sminx < d.maxx AND s.smaxx > d.minx
   AND s.sminy < d.maxy AND s.smaxy > d.miny)
"""


def _token_bpe_sql() -> str:
    from .text.analysis import BPE_SPLIT_PATTERN

    lit = "'" + BPE_SPLIT_PATTERN.replace("'", "''") + "'"
    return f"""
            SELECT doc_id,
              CAST(len(regexp_extract_all(text, {lit})) AS BIGINT)
                AS n_bpe_tokens
            FROM documents
        """


def _langid_sql() -> str:
    """Stopword-vote heuristic as SQL, built from the SAME inventory the
    engine uses (text/analysis._STOPWORDS) so both sides share it.
    Tie-break = first max in dict order, matching numpy argmax.

    The FNV fingerprint oracle (below) walks UTF-8 bytes via ascii()
    per char — valid because documents.text is pure ASCII (verified);
    wrap-around 64-bit arithmetic is emulated with HUGEINT mod 2^64."""
    from .text.analysis import _STOPWORDS

    langs = list(_STOPWORDS)

    def lst(lang):
        return "[" + ",".join(f"'{w}'" for w in sorted(_STOPWORDS[lang])) + "]"

    counts = ",\n              ".join(
        f"len(list_filter(toks, t -> list_contains({lst(l)}, t))) AS c_{l}"
        for l in langs
    )
    branches = []
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"c_{l} >= c_{m}" for m in langs[i + 1 :]
        )
        branches.append(f"WHEN {conds} THEN '{l}'")
    allc = ", ".join(f"c_{l}" for l in langs)
    return f"""
            WITH tk AS (
              SELECT doc_id,
                regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
              FROM documents),
            sc AS (SELECT doc_id, {counts} FROM tk)
            SELECT doc_id, CASE
              WHEN greatest({allc}) = 0 THEN 'und'
              {' '.join(branches)}
              ELSE '{langs[-1]}' END AS lang_pred
            FROM sc
        """


HULL_G = 8  # hull groups; doc_ids < 2^20 ⇒ no coordinate collisions

IVJ_BUCKET_US = 1 << 28  # ≈ 4.5 min; must stay ≥ the max duration
IVJ_DUR_UNIT = 1_000_000  # 1 s in µs
IVJ_DUR_MOD = 240  # durations 1..240 s → avg pair fan-out stays O(1)


def q_hull_diameter(sf_dir: str):
    """Exact per-group convex-hull diameter (ops/hull): squared
    diameter + lexicographic-min achieving id pair over integer-
    lattice points derived from doc_id. The hull is an algebraic
    partial reduction (hull(A∪B) = hull(hull A ∪ hull B)), so each
    block ships only its per-group hull vertices (O(log m) for random
    points) and the corpus never shuffles. All-integer cross products
    and distances → bit-exact vs the O(n²) SQL self-join oracle."""
    from .ops.hull import grouped_hull_diameter

    def pts(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy()
        return pa.table(
            {
                "grp": pa.array((k % HULL_G).astype(np.int64)),
                "id": b["doc_id"],
                "x": pa.array(((k * AX + BX) % EXTENT).astype(np.int64)),
                "y": pa.array(((k * AY + BY) % EXTENT).astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        pts, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_hull_diameter(ds)


def q_pareto(sf_dir: str):
    """2-D Pareto frontier (ops/pareto.pareto_front) over orders:
    maximize (price cents, affine-derived score). Dominance is an
    algebraic partial reduction — each block emits its local frontier
    (O(log n) expected rows), driver finishes; the corpus never
    shuffles. The vectorized survivor rule is mirrored token-for-token
    by the oracle's per-d1 max + strict-prefix running max windows."""
    from .ops.pareto import pareto_front

    def dims(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy()
        d1 = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
        )
        d2 = (k * AX + BX) % EXTENT
        return pa.table(
            {
                "id": b["o_orderkey"],
                "d1": d1,
                "d2": pa.array(d2.astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        dims, batch_format="pyarrow", zero_copy_batch=True
    )
    return pareto_front(ds)


def q_interval_pairs(sf_dir: str):
    """Interval-overlap self-join (ops/temporal.interval_overlap_join)
    over event availability windows (1..240 s from event_id): all
    strictly-overlapping pairs with exact overlap length. The temporal
    analogue of the dwithin grid join — ≤2× bucket replication of a
    32 B projection, ONE keyed shuffle, vectorized window expansion
    per partition, structural canonical-bucket dedup (no pair-level
    distinct). All-integer µs arithmetic → bit-exact vs the SQL
    inequality self-join oracle."""
    from .ops.temporal import interval_overlap_join

    def iv(b: pa.Table) -> pa.Table:
        s = pc.cast(b["ts"], pa.int64())
        k = b["event_id"].to_numpy()
        dur = (1 + (k % IVJ_DUR_MOD)) * IVJ_DUR_UNIT
        return pa.table(
            {
                "id": b["event_id"],
                "s": s,
                "e": pc.add(s, pa.array(dur.astype(np.int64))),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts"]).map_batches(
        iv, batch_format="pyarrow", zero_copy_batch=True
    )
    return interval_overlap_join(ds, IVJ_BUCKET_US)


AUDIO_FRAME = 256  # samples per feature frame (divides every length)
AUDIO_DECIM = 4  # resample stride (divides every length)

# Synth-audio id→sample arithmetic, mirrored into the DuckDB oracles
# (synth/audio.py is the single source of truth for the values).
from .synth.audio import AUD_BASE as _AUD_BASE  # noqa: E402
from .synth.audio import AUD_MOD as _AUD_MOD  # noqa: E402
from .synth.audio import AUD_STEP as _AUD_STEP  # noqa: E402
from .synth.audio import AXA as _AXA  # noqa: E402
from .synth.audio import BA as _BA  # noqa: E402
from .synth.audio import CA as _CA  # noqa: E402


def q_audio_energy(sf_dir: str):
    """Audio modality plumbing + features: synth WAV table sized from
    documents → stage-local RIFF/PCM16 decode → per-frame exact int64
    energy + zero-crossing rows (media/audio.audio_frame_features).
    The payload round-trips through the from-scratch codec inside the
    stage; only 32 B feature rows leave it. The oracle re-derives the
    samples from the id arithmetic (synth/audio.py docstring) and
    mirrors the i//frame crossing attribution."""
    import pyarrow.parquet as pq

    from .media.audio import audio_frame_features
    from .synth.audio import audio_dataset

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return audio_frame_features(audio_dataset(n), frame=AUDIO_FRAME)


def q_audio_resample(sf_dir: str):
    """Audio transform round-trip: synth WAV → stride-decimate ×4 and
    RE-ENCODE as WAV (media/audio.resample_audio) → second decode →
    per-recording position-weighted exact checksum
    (media/audio.decimated_checksum). Exercises decode→transform→
    encode→decode composition entirely inside stages; the oracle
    computes the same Σ(j+1)·v[4j] from the id arithmetic."""
    import pyarrow.parquet as pq

    from .media.audio import decimated_checksum, resample_audio
    from .synth.audio import audio_dataset

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return decimated_checksum(
        resample_audio(audio_dataset(n), AUDIO_DECIM)
    )


def q_audio_dedup(sf_dir: str):
    """Near-duplicate audio CLUSTERS (rows-only: the energy-contour
    fingerprint is not SQL-expressible): synth audio with planted
    4-member near-dup classes (members differ by ±1-amplitude sample
    perturbations — NOT byte-identical, so exact dedup misses them) →
    stage-local decode + fingerprint → the generic distributed
    signature clustering shared with image/video
    (media/image.signature_near_dup)."""
    import pyarrow.parquet as pq

    from .media.audio import audio_near_dup
    from .synth.audio import audio_dataset

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return audio_near_dup(audio_dataset(2 * n, dup_group=4)).sort(
        "audio_id"
    )


def q_ohlc(sf_dir: str):
    """Time-bucket OHLC candlesticks per (event_type, hour): open /
    close by (ts, event_id) window order, high/low/count — one
    per-batch pre-combine to ≤1 row per key × block, one keyed
    exchange, identical merge per partition (ops/window.grouped_ohlc).
    open/close are selections and high/low semigroup merges, so the
    double values are bit-exact vs the row_number() window oracle."""
    from .ops.window import grouped_ohlc

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "hour", pc.floor_temporal(batch["ts"], unit="hour")
        )

    out = grouped_ohlc(
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True),
        key_cols=["event_type", "hour"],
        order_cols=["ts", "event_id"],
        value_col="value",
    )
    return out


def q_twap(sf_dir: str):
    """Per-user time-weighted average value (TWAP): each event's value
    holds until the user's next event; num = Σ cents·duration_us and
    span are exact int64 (durations telescope, so the per-key bound is
    max|v|·span — guard-checked), twap = ONE IEEE division mirrored by
    CAST(... AS DOUBLE)/CAST(... AS DOUBLE). One key-hash shuffle of a
    28 B/row projection (ops/temporal.time_weighted_avg)."""
    from .ops.temporal import time_weighted_avg

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "value_cents": pc.cast(
                    pc.round(pc.multiply(batch["value"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    return time_weighted_avg(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    )


def q_embed_dims(sf_dir: str):
    """Per-dimension profile of the embedding list column: (dim 1-based,
    vmin, vmax) over all vectors — per-batch (d,)-shaped min/max
    partials off the flattened Arrow list buffer (zero-copy reshape,
    no unnest materialization), driver merge of n_blocks × d floats.
    min/max are SELECTIONS so float32 stays bit-exact vs the DuckDB
    unnest/generate_subscripts oracle."""
    from .ops.agg import grouped_sum_count  # noqa: F401 (pattern ref)

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks()
        d = len(col[0])
        flat = col.flatten().to_numpy(zero_copy_only=False)
        m = flat.reshape(-1, d)
        return pa.table(
            {
                "dim": pa.array(
                    np.arange(1, d + 1, dtype=np.int64), type=pa.int64()
                ),
                "vmin": pa.array(m.min(axis=0), type=pa.float32()),
                "vmax": pa.array(m.max(axis=0), type=pa.float32()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # n_blocks × d tiny partial rows
    g = parts.groupby("dim", sort=True)
    return pa.table(
        {
            "dim": pa.array(g.vmin.min().index.to_numpy(), type=pa.int64()),
            "vmin": pa.array(
                g.vmin.min().to_numpy(), type=pa.float32()
            ),
            "vmax": pa.array(
                g.vmax.max().to_numpy(), type=pa.float32()
            ),
        }
    )


def q_skewkurt(sf_dir: str):
    """Exact grouped skewness + kurtosis (l_quantity per returnflag):
    integer moment partials Σx..Σx⁴ per block (Arrow group_by),
    arbitrary-precision Python-int driver merge (n³·Σx⁴ overflows
    int64 at web scale), then ONE fixed IEEE expression per output
    mirrored token-for-token by the oracle. The mirrored forms are the
    exact-integer identities skew = N3/D2^{3/2} with
    N3 = n²Σx³ − 3nΣxΣx² + 2(Σx)³, D2 = nΣx² − (Σx)², and
    kurt = N4/D2² with N4 = n³Σx⁴ − 4n²ΣxΣx³ + 6n(Σx)²Σx² − 3(Σx)⁴
    (the n-powers cancel algebraically — same discipline as covar)."""
    import math

    from .ops.agg import grouped_sums_exact

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def moments(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(b["l_quantity"]), pa.int64())
        x2 = pc.multiply(x, x)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "s1": x,
                "s2": x2,
                "s3": pc.multiply(x2, x),
                "s4": pc.multiply(x2, x2),
            }
        )

    rows = grouped_sums_exact(
        ds.map_batches(
            moments, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["l_returnflag"],
        sum_cols=["s1", "s2", "s3", "s4"],
        count_col="n",
    )
    out = {"l_returnflag": [], "n": [], "skew_pop": [], "kurt_pop": []}
    for r in sorted(rows, key=lambda r: r["l_returnflag"]):
        n, s1, s2 = int(r["n"]), int(r["s1"]), int(r["s2"])
        s3, s4 = int(r["s3"]), int(r["s4"])
        d2 = n * s2 - s1 * s1
        n3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
        n4 = (
            n**3 * s4
            - 4 * n * n * s1 * s3
            + 6 * n * s1 * s1 * s2
            - 3 * s1**4
        )
        out["l_returnflag"].append(r["l_returnflag"])
        out["n"].append(n)
        out["skew_pop"].append(
            float(n3) / (float(d2) * math.sqrt(float(d2)))
        )
        out["kurt_pop"].append(float(n4) / float(d2 * d2))
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], type=pa.string()),
            "n": pa.array(out["n"], type=pa.int64()),
            "skew_pop": pa.array(out["skew_pop"], type=pa.float64()),
            "kurt_pop": pa.array(out["kurt_pop"], type=pa.float64()),
        }
    )


SIMP_S = 120  # bumped-square side (even; bump area = S*h/2 exactly)

# symbolic bumped-square vertices over (h1..h4) — single source of
# truth for the engine build stage AND the generated oracle SQL
_BUMP_VERTS = (
    ("0", "0"),
    (f"{SIMP_S // 2}", "0 - h1"),
    (f"{SIMP_S}", "0"),
    (f"{SIMP_S} + h2", f"{SIMP_S // 2}"),
    (f"{SIMP_S}", f"{SIMP_S}"),
    (f"{SIMP_S // 2}", f"{SIMP_S} + h3"),
    ("0", f"{SIMP_S}"),
    ("0 - h4", f"{SIMP_S // 2}"),
)


def _bumped_build(b: pa.Table) -> pa.Table:
    """doc_id → WKB bumped-square parcel (side SIMP_S, four mid-edge
    bumps h_i = (doc_id*m_i + c_i) mod 6) — numeric twin of
    ``_BUMP_VERTS``; one bulk WKB encode, no per-row Python."""
    from .geom.wkb import encode_rings_bulk

    S = SIMP_S
    k = b["doc_id"].to_numpy()
    n = len(k)
    P = np.empty((n, 8, 2), dtype=np.float64)
    P[:, 0, 0] = 0
    P[:, 0, 1] = 0
    P[:, 1, 0] = S // 2
    P[:, 1, 1] = -((k * 7 + 1) % 6)
    P[:, 2, 0] = S
    P[:, 2, 1] = 0
    P[:, 3, 0] = S + (k * 11 + 2) % 6
    P[:, 3, 1] = S // 2
    P[:, 4, 0] = S
    P[:, 4, 1] = S
    P[:, 5, 0] = S // 2
    P[:, 5, 1] = S + (k * 13 + 3) % 6
    P[:, 6, 0] = 0
    P[:, 6, 1] = S
    P[:, 7, 0] = -((k * 17 + 5) % 6)
    P[:, 7, 1] = S // 2
    return pa.table(
        {
            "doc_id": b["doc_id"],
            "geometry": encode_rings_bulk(P, np.full(n, 8, dtype=np.int64)),
        }
    )


_BUMP_H_CTE = """
              SELECT doc_id,
                     (doc_id * 7 + 1) % 6 AS h1,
                     (doc_id * 11 + 2) % 6 AS h2,
                     (doc_id * 13 + 3) % 6 AS h3,
                     (doc_id * 17 + 5) % 6 AS h4
              FROM documents"""


def _compactness_sql() -> str:
    """Generate the `compactness` oracle from ``_BUMP_VERTS``: literal
    shoelace moment terms (exact BIGINT) and the perimeter as a
    LEFT-ASSOCIATIVE sqrt-term sum in edge order — the bit-level twin
    of ops/measures.geom_measures' np.cumsum accumulation."""
    cross, sxs, sys_, per = [], [], [], []
    for i in range(8):
        xi, yi = _BUMP_VERTS[i]
        xj, yj = _BUMP_VERTS[(i + 1) % 8]
        c = f"(({xi})*({yj}) - ({xj})*({yi}))"
        cross.append(c)
        sxs.append(f"(({xi})+({xj}))*{c}")
        sys_.append(f"(({yi})+({yj}))*{c}")
        per.append(
            f"sqrt((({xj})-({xi}))*(({xj})-({xi}))"
            f" + (({yj})-({yi}))*(({yj})-({yi})))"
        )
    return f"""
            WITH h AS ({_BUMP_H_CTE}),
            m AS (
              SELECT doc_id,
                     {' + '.join(cross)} AS a2,
                     {' + '.join(sxs)} AS sx,
                     {' + '.join(sys_)} AS sy,
                     {' + '.join(per)} AS perim
              FROM h)
            SELECT doc_id,
                   CAST(a2 AS DOUBLE) / 2 AS area,
                   CAST(sx AS DOUBLE) / CAST(3 * a2 AS DOUBLE) AS cx,
                   CAST(sy AS DOUBLE) / CAST(3 * a2 AS DOUBLE) AS cy,
                   perim,
                   4 * pi() * (CAST(a2 AS DOUBLE) / 2)
                       / (perim * perim) AS polsby
            FROM m
        """


def q_simplify(sf_dir: str):
    """Douglas–Peucker simplification (ops/simplify.simplify_geometries)
    over synthetic bumped-square parcels derived from doc_id: each
    parcel is a 120-square with four mid-edge bumps of integer heights
    h_i = (doc_id·m_i + c_i) mod 6. At tol=2 a bump survives iff
    h_i ≥ 3 (strict >, so the distance-exactly-2 bump drops) —
    validated exhaustively over all 6⁴ height combinations against the
    exact-rational DP reference (tests/test_simplify.py). The stage
    runs the REAL kernel on WKB payloads (bulk synth encode →
    simplify_geometries → decode/measure); only (doc_id, n_verts,
    area) rows leave it. Shoelace areas on the integer lattice are
    exact, so the oracle's closed form is bit-identical.

    Scale shape: stateless row-independent map chain — nothing
    shuffles, geometry payload never leaves the stage."""
    from .geom.core import ring_signed_area
    from .geom.wkb import decode_polygons
    from .ops.simplify import simplify_geometries

    def measure(b: pa.Table) -> pa.Table:
        nv, ar = [], []
        for v in b["geometry"]:
            ring = decode_polygons(v.as_py())[0][0]
            nv.append(len(ring))
            ar.append(
                int(ring_signed_area(np.asarray(ring, dtype=np.float64)))
            )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_verts": pa.array(nv, type=pa.int64()),
                "area": pa.array(ar, type=pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        _bumped_build, batch_format="pyarrow", zero_copy_batch=True
    )
    return simplify_geometries(ds, 2.0).map_batches(
        measure, batch_format="pyarrow", zero_copy_batch=True
    )


def q_compactness(sf_dir: str):
    """Polygon shape measures (ops/measures.polygon_measures) over the
    bumped-square parcels: exact shoelace area + centroid (one
    int/int division per axis), strictly-ordered sqrt-sum perimeter,
    and Polsby-Popper 4*pi*A/P^2 — the standard redistricting
    compactness metric. The oracle SQL is GENERATED from the same
    symbolic vertex list as the build stage (_BUMP_VERTS), so the
    shoelace terms and the left-associative perimeter sum mirror the
    kernel token-for-token (see ops/measures module docstring).

    Scale shape: stateless row-independent map chain — nothing
    shuffles, the WKB payload never leaves the fused stage."""
    from .ops.measures import polygon_measures

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        _bumped_build, batch_format="pyarrow", zero_copy_batch=True
    )
    return polygon_measures(ds)


DISSOLVE_G = 64  # dissolve key cardinality
DISSOLVE_D = 8  # rect-chain stride (> max ext 3 ⇒ no triple overlap)


def _rect_chain_build(b: pa.Table) -> pa.Table:
    """doc_id → WKB rectangle in a staggered per-district chain: rect
    rnk = doc_id // G in district doc_id % G spans x ∈ [rnk·D,
    rnk·D + D + ext], y ∈ [0, h] with h = (doc_id·7+3) mod 5 + 4 and
    ext ∈ {-2, 1, 2, 3} (index (doc_id·11+1) mod 4). ext > 0 overlaps
    the NEXT rect only (ext ≤ 3 < D); ext = -2 leaves a gap (part
    break). So each district's union obeys pairwise
    inclusion–exclusion: area = Σ(D+ext)·h − Σ_{pairs} ext·min(h, h'),
    parts = n − #connecting pairs — the SQL oracle's closed form. The
    ENGINE sees only (district, WKB) and runs the general union
    kernel."""
    from .geom.wkb import encode_rings_bulk

    k = b["doc_id"].to_numpy()
    n = len(k)
    g = k % DISSOLVE_G
    rnk = k // DISSOLVE_G
    h = (k * 7 + 3) % 5 + 4
    ext = np.array([-2, 1, 2, 3])[(k * 11 + 1) % 4]
    x0 = (rnk * DISSOLVE_D).astype(np.float64)
    x1 = (rnk * DISSOLVE_D + DISSOLVE_D + ext).astype(np.float64)
    P = np.empty((n, 4, 2), dtype=np.float64)
    P[:, 0, 0] = x0
    P[:, 0, 1] = 0
    P[:, 1, 0] = x1
    P[:, 1, 1] = 0
    P[:, 2, 0] = x1
    P[:, 2, 1] = h
    P[:, 3, 0] = x0
    P[:, 3, 1] = h
    return pa.table(
        {
            "doc_id": b["doc_id"],
            "district": pa.array(g, type=pa.int64()),
            "geometry": encode_rings_bulk(
                P, np.full(n, 4, dtype=np.int64)
            ),
            "n_chars": b["n_chars"],
        }
    )


ERASE_BAND = (3, 5)  # horizontal exclusion band y ∈ [3, 5]


def q_erase(sf_dir: str):
    """Overlay-difference (ops/overlay.erase — geopandas
    overlay(how="difference")): every rect-chain parcel minus a
    broadcast exclusion band, through the REAL snapped boolean
    difference kernel (bbox prefilter skips disjoint rows). Oracle =
    the generator's closed form: the band y∈[3,5] leaves the bottom
    slab (height 3) always and a top slab (h−5) iff h > 5, so
    area = w·(3 + greatest(h−5, 0)) and n_polys = 1 + (h > 5)."""
    from .geom.wkb import encode_polygon
    from .ops.overlay import erase

    y0, y1 = ERASE_BAND
    band = np.array(
        [[-8.0, y0], [float(EXTENT), y0], [float(EXTENT), y1],
         [-8.0, y1]]
    )
    mask = pa.table(
        {"geometry": pa.array([encode_polygon([band])],
                              type=pa.binary())}
    )
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _rect_chain_build, batch_format="pyarrow", zero_copy_batch=True
    )
    out = erase(ds, mask, id_col="doc_id")
    return out.map_batches(
        lambda b: b.select(["doc_id", "area", "n_polys"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_dissolve(sf_dir: str):
    """Distributed grouped polygon union (ops/dissolve — the geopandas
    ``.dissolve`` analog): staggered rectangle chains per district
    through the REAL snapped boolean-union kernel; exact shoelace area
    of each union, part/hole counts, and a summed value column. ONE
    hash exchange keyed on district (the only movement — inherent);
    all union compute runs inside the reduce partitions. Oracle =
    pairwise inclusion–exclusion on the generator's overlap structure
    (see _rect_chain_build)."""
    from .ops.dissolve import dissolve_stats

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _rect_chain_build, batch_format="pyarrow", zero_copy_batch=True
    )
    return dissolve_stats(ds, "district", sum_cols=("n_chars",))


IMG_SEARCH_NQ = 8  # query images
IMG_SEARCH_STEP = 997  # query id derivation: qid = j*STEP + 3
IMG_SEARCH_K = 10


def q_image_search(sf_dir: str):
    """Perceptual-hash image retrieval (vector/ann.hamming_topk): 8
    query phashes (derived from fixed corpus ids) against the full
    synthetic image corpus, exact hamming top-10 per query with
    (dist ASC, image_id ASC) total order. Per-block top-k combiner
    caps the reduction at Q·k rows per block — the corpus (and its
    pixel payload) never leaves the stage. Oracle = DuckDB
    bit_count(xor(...)) over the same HUGEINT (id·M) mod 2^63 phash
    derivation as image_assign, with a row_number() window."""
    import pyarrow.parquet as pq

    from .synth.images import _PHASH_MULT, image_dataset
    from .vector.ann import hamming_topk

    n = IMG_MULT * pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    qids = (
        np.arange(IMG_SEARCH_NQ, dtype=np.int64) * IMG_SEARCH_STEP + 3
    )
    qsigs = (qids.astype(np.uint64) * _PHASH_MULT) & np.uint64(
        0x7FFFFFFFFFFFFFFF
    )
    images = image_dataset(n=n)
    return hamming_topk(
        images, qsigs.astype(np.int64), k=IMG_SEARCH_K
    )


def q_brand_mode(sf_dir: str):
    """Per-p_type modal brand (ops/stats.grouped_mode): exact grouped
    mode on the distinct-value count-histogram shape — only
    (p_type, p_brand, count) partials move, ties break to the
    lexicographically smallest brand (mirrored by the oracle's
    ``ORDER BY cnt DESC, p_brand`` row_number). ``final="driver"``:
    6 types × 25 brands is the bounded-domain few-key case."""
    from .ops.stats import grouped_mode

    ds = _read(sf_dir, "part", ["p_type", "p_brand"])
    out = grouped_mode(ds, "p_type", "p_brand", final="driver")
    return out.sort_by([("p_type", "ascending")])


TREND_US_PER_HOUR = 3_600_000_000  # µs per hour (x = epoch-hour index)


def q_trend(sf_dir: str):
    """Exact grouped simple linear regression (events value-cents vs
    epoch-hour, per event_type): integer moment partials
    (Σx, Σy, Σxy, Σx², n — Arrow group_by per block), arbitrary-
    precision Python-int driver merge (n·Σxy overflows int64 at web
    scale), then ONE fixed IEEE division per output, mirrored
    token-for-token: slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²) and
    intercept = (ΣyΣxx − ΣxΣxy)/(nΣxx − Σx²) — the exact-integer
    normal-equation identities (covar discipline)."""
    from .ops.agg import grouped_sums_exact

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def moments(b: pa.Table) -> pa.Table:
        x = pc.cast(b["ts"], pa.int64()).to_numpy() // TREND_US_PER_HOUR
        y = pc.cast(
            pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
        ).to_numpy()
        return pa.table(
            {
                "event_type": b["event_type"],
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
            }
        )

    rows = grouped_sums_exact(
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        sum_cols=["sx", "sy", "sxy", "sxx"],
        count_col="n",
    )
    out = {"event_type": [], "n": [], "slope": [], "icept": []}
    for r in sorted(rows, key=lambda r: r["event_type"]):
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sxx = int(r["sxy"]), int(r["sxx"])
        d = n * sxx - sx * sx
        out["event_type"].append(r["event_type"])
        out["n"].append(n)
        out["slope"].append(float(n * sxy - sx * sy) / float(d))
        out["icept"].append(float(sy * sxx - sx * sxy) / float(d))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "n": pa.array(out["n"], type=pa.int64()),
            "slope": pa.array(out["slope"], type=pa.float64()),
            "icept": pa.array(out["icept"], type=pa.float64()),
        }
    )


def q_rolling_z(sf_dir: str):
    """Exact rolling z-score anomaly flags (ops/window.rolling_z_flags):
    per-user events whose value-cents deviate from the trailing
    16-event mean by more than 3 population standard deviations —
    evaluated as the INTEGER inequality (v·n − S)² > 9·(nQ − S²), so
    both engine and oracle compare exact int64s (no float sigma,
    no sqrt). One keyed exchange of the 32 B projection, one padded-
    cumsum pass per partition. Oracle = SQL window count/sum/sum-of-
    squares over ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING with the
    identical inequality."""
    from .ops.window import rolling_z_flags

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "v": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    return rolling_z_flags(
        ds, "user_id", ("ts", "event_id"), "v", window=16, z2=9
    )


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape — promotion revenue share: broadcast the part
    dimension onto lineitem (broadcast_hash_join; uniqueness-checked),
    conditional exact integer-cents revenue partials (promo vs total),
    arbitrary-precision driver merge, one mirrored IEEE ratio.
    Revenue unit is 10⁻⁴ dollars (price-cents × (100 − disc%))."""
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sums_exact
    from .ops.join import broadcast_hash_join

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]
    )
    li = broadcast_hash_join(li, part, "l_partkey", "p_partkey", ["p_type"])

    def rev(b: pa.Table) -> pa.Table:
        price = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64()
        )
        disc = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64()
        )
        r = pc.multiply(
            price, pc.subtract(pa.scalar(100, pa.int64()), disc)
        )
        promo = pc.equal(b["p_type"], "PROMO")
        return pa.table(
            {
                "k": pa.array(
                    np.zeros(b.num_rows, dtype=np.int64)
                ),
                "promo_u": pc.if_else(promo, r, pa.scalar(0, pa.int64())),
                "total_u": r,
            }
        )

    rows = grouped_sums_exact(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        ["k"],
        sum_cols=["promo_u", "total_u"],
        count_col="n",
    )
    (r,) = rows
    num, den = int(r["promo_u"]), int(r["total_u"])
    return pa.table(
        {
            "n": pa.array([int(r["n"])], type=pa.int64()),
            "promo_u": pa.array([float(num)], type=pa.float64()),
            "total_u": pa.array([float(den)], type=pa.float64()),
            "promo_pct": pa.array(
                [100.0 * (float(num) / float(den))], type=pa.float64()
            ),
        }
    )


def q_trade_volume(sf_dir: str):
    """TPC-H Q7 shape — cross-nation trade volume per year: lineitem
    → exact integer revenue units (cents×(100−disc)) + calendar year
    → orders (equi_join: measured-size broadcast/co-shuffle plan) →
    customer nation + supplier nation (two more measured-size joins)
    → (supp_nation, cust_nation, year) grouped integer partials with
    an arbitrary-precision driver merge (Σ revenue units exceeds
    int64 at web scale). The one float per group is float(exact int)
    = the oracle's CAST(HUGEINT SUM AS DOUBLE)."""
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sums_exact
    from .ops.join import equi_join

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
    )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"],
    )

    def rev(b: pa.Table) -> pa.Table:
        price = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64()
        )
        disc = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "rev_u": pc.multiply(
                    price,
                    pc.subtract(pa.scalar(100, pa.int64()), disc),
                ),
                "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    li = equi_join(li, orders, "l_orderkey", "o_orderkey", ["o_custkey"])
    li = equi_join(li, cust, "o_custkey", "c_custkey", ["c_nationkey"])
    li = equi_join(li, supp, "l_suppkey", "s_suppkey", ["s_nationkey"])

    rows = grouped_sums_exact(
        li, ["s_nationkey", "c_nationkey", "l_year"],
        sum_cols=["rev_u"], count_col="n",
    )
    rows.sort(
        key=lambda r: (r["s_nationkey"], r["c_nationkey"], r["l_year"])
    )
    return pa.table(
        {
            "s_nationkey": pa.array(
                [r["s_nationkey"] for r in rows], type=pa.int32()
            ),
            "c_nationkey": pa.array(
                [r["c_nationkey"] for r in rows], type=pa.int32()
            ),
            "l_year": pa.array(
                [r["l_year"] for r in rows], type=pa.int64()
            ),
            "revenue_u": pa.array(
                [float(int(r["rev_u"])) for r in rows],
                type=pa.float64(),
            ),
            "n": pa.array([int(r["n"]) for r in rows], type=pa.int64()),
        }
    )


Q17_BRAND = "Brand#13"


def q_small_qty(sf_dir: str):
    """TPC-H Q17 shape — revenue lost to small-quantity orders of one
    brand's parts: two streaming lineitem passes, both pruned at the
    source by the broadcast brand-part key set (semi_join — the left
    payload never moves). Pass 1 reduces the brand slice to per-part
    (Σqty, count) via integer partials + one bytes-aware keyed merge;
    the per-brand stats table (dimension-sized: |part|/|brands| keys)
    broadcasts back onto pass 2, where the classic correlated
    subquery ``l_quantity < 0.2·avg(qty)`` becomes the EXACT integer
    cross-multiply ``5·qty·cnt < Σqty`` (0.2 = 1/5 — no decimal
    rounding on either side). Output = Σ price-cents / 700.0, one
    correctly-rounded division mirrored in the oracle."""
    import pyarrow.parquet as pq
    import ray

    from .ops.agg import grouped_sum_count, grouped_sums_exact
    from .ops.join import broadcast_hash_join, semi_join

    bp = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        filters=[("p_brand", "==", Q17_BRAND)],
    ).select(["p_partkey"])

    def qty_int(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "qty": pc.cast(b["l_quantity"], pa.int64()),
            }
        )

    li1 = semi_join(
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"]), bp,
        "l_partkey", "p_partkey",
    ).map_batches(qty_int, batch_format="pyarrow", zero_copy_batch=True)
    stats_ds = grouped_sum_count(
        li1, ["l_partkey"], sum_cols=["qty"], count_col="cnt",
        final="hash",
    )
    stats = pa.concat_tables(
        [t for t in ray.get(stats_ds.materialize().to_arrow_refs())
         if t.num_rows]
        or [pa.table({"l_partkey": pa.array([], pa.int64()),
                      "qty": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})]
    )

    li2 = semi_join(
        _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice"],
        ),
        bp, "l_partkey", "p_partkey",
    )
    li2 = broadcast_hash_join(
        li2, stats, "l_partkey", "l_partkey", ["qty", "cnt"]
    )

    def small(b: pa.Table) -> pa.Table:
        q = pc.cast(b["l_quantity"], pa.int64())
        keep = pc.less(
            pc.multiply(pc.multiply(q, pa.scalar(5, pa.int64())),
                        b["cnt"]),
            b["qty"],
        )
        b = b.filter(keep)
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "k": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "cents": cents,
            }
        )

    rows = grouped_sums_exact(
        li2.map_batches(small, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["k"], sum_cols=["cents"], count_col="n",
    )
    total = sum(int(r["cents"]) for r in rows)
    n = sum(int(r["n"]) for r in rows)
    return pa.table(
        {
            "avg_yearly": pa.array(
                [float(total) / 700.0], type=pa.float64()
            ),
            "n_small": pa.array([n], type=pa.int64()),
        }
    )


Q22_JUMBO = 400000.0


def q_idle_customers(sf_dir: str):
    """TPC-H Q22 shape — per-nation count/balance of customers with an
    above-average positive balance and NO high-value order: one
    streaming pass reduces customer to the exact global (Σcents, n)
    over positive balances; the richer-than-average filter is the
    integer cross-multiply ``cents·n > Σcents`` (no float average);
    the no-jumbo-orders test is the broadcast distinct-key anti_join
    (the filtered orders side contributes only its distinct custkeys —
    the islands discipline); the tail is a 25-key driver merge of
    integer partials. (The synthetic corpus gives every customer at
    least one order, so the anti-join side is the jumbo slice, not
    all orders — same operator shape as the textbook Q22.)"""
    from .ops.agg import grouped_sum_count, grouped_sums_exact
    from .ops.join import anti_join

    def cents_b(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["c_acctbal"], 100.0)), pa.int64()
        )
        t = pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_nationkey": b["c_nationkey"],
                "cents": cents,
                "k": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            }
        )
        return t.filter(pc.greater(cents, pa.scalar(0, pa.int64())))

    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(cents_b, batch_format="pyarrow", zero_copy_batch=True)

    rows = grouped_sums_exact(cust, ["k"], sum_cols=["cents"],
                              count_col="n")
    s = sum(int(r["cents"]) for r in rows)
    n = sum(int(r["n"]) for r in rows)

    def rich(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.greater(
                pc.multiply(b["cents"], pa.scalar(n, pa.int64())),
                pa.scalar(s, pa.int64()),
            )
        ).select(["c_custkey", "c_nationkey", "cents"])

    cust2 = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(cents_b, batch_format="pyarrow", zero_copy_batch=True
                  ).map_batches(rich, batch_format="pyarrow",
                                zero_copy_batch=True)
    jumbo = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: b.filter(
            pc.greater(b["o_totalprice"], Q22_JUMBO)
        ).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    idle = anti_join(cust2, jumbo, "c_custkey", "o_custkey")
    out = grouped_sum_count(
        idle, ["c_nationkey"], sum_cols=["cents"], count_col="numcust",
        final="driver",
    )
    out = out.rename_columns(["c_nationkey", "totacctbal_cents",
                              "numcust"])
    return out.sort_by("c_nationkey")


HH_K = 29


def q_heavy_hitters(sf_dir: str):
    """Exact Misra-Gries heavy hitters over the corpus token stream
    (ops/curate.heavy_hitters): every word with frequency > n/(k+1),
    found with O(k)-per-block payloads — candidates = per-block exact
    top-k, then a broadcast verify pass with the integer
    cross-multiply threshold. The near-uniform synthetic vocabulary
    puts many words within a fraction of a percent of the cut, so the
    oracle exercises the exact threshold arithmetic."""
    from .ops.curate import heavy_hitters

    ds = _read(sf_dir, "documents", ["text"])
    return heavy_hitters(ds, "text", HH_K, tokenize=True)


def q_unpivot(sf_dir: str):
    """Wide→long reshape (ops/reshape.unpivot — the melt/UNPIVOT
    staple): lineitem's three rate columns stacked into (key, metric,
    value) long format. Stateless streaming pass, values carried
    bit-identical; the oracle is the literal UNION ALL expansion."""
    from .ops.reshape import unpivot

    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
         "l_tax"],
    )
    return unpivot(
        ds, ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
    )


def q_impurity(sf_dir: str):
    """Per-nation Gini impurity of the market-segment mix
    (ops/stats.grouped_impurity): distinct (nation, segment, count)
    partials are the only movement; one exact-int division per
    nation."""
    from .ops.stats import grouped_impurity

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    return grouped_impurity(ds, "c_nationkey", "c_mktsegment")


SETOP_LO = "1996-01-01"
SETOP_MID = "1997-01-01"
SETOP_HI = "1998-01-01"


def _setop_slices(sf_dir: str):
    """The two lineitem key projections the set-op queries compare:
    parts shipped in 1996 vs parts shipped in 1997 (multiplicity =
    shipment count, so ALL semantics differ from DISTINCT)."""
    from datetime import datetime

    import pyarrow.dataset as pads
    import ray.data

    def sl(lo: str, hi: str):
        return ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate"],
            filter=(
                (pads.field("l_shipdate")
                 >= pa.scalar(datetime.fromisoformat(lo)))
                & (pads.field("l_shipdate")
                   < pa.scalar(datetime.fromisoformat(hi)))
            ),
        ).map_batches(
            lambda b: b.select(["l_partkey"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    return sl(SETOP_LO, SETOP_MID), sl(SETOP_MID, SETOP_HI)


def q_except_parts(sf_dir: str):
    """SQL EXCEPT ALL as a distributed operator (ops/setops.bag_setop):
    per-part 1996-shipment multiplicities minus 1997's, max(0, ·)
    copies each — per-batch (key, cnt) pre-combine, ONE key-hash
    exchange of the deduped 16 B/row projection, np.repeat emit."""
    from .ops.setops import bag_setop

    a, b = _setop_slices(sf_dir)
    return bag_setop(a, b, ["l_partkey"], mode="except_all")


def q_intersect_parts(sf_dir: str):
    """SQL INTERSECT ALL (min multiplicity) — same exchange shape as
    q_except_parts."""
    from .ops.setops import bag_setop

    a, b = _setop_slices(sf_dir)
    return bag_setop(a, b, ["l_partkey"], mode="intersect_all")


def _yoy_side(sf_dir: str, lo: str, hi: str, cnt_name: str):
    """Per-customer order count over one year — read-pruned to the
    key column, per-batch partials, bytes-aware keyed hash exchange."""
    from datetime import datetime

    import pyarrow.dataset as pads
    import ray.data

    from .ops.agg import grouped_sum_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=(
            (pads.field("o_orderdate")
             >= pa.scalar(datetime.fromisoformat(lo)))
            & (pads.field("o_orderdate")
               < pa.scalar(datetime.fromisoformat(hi)))
        ),
    ).map_batches(
        lambda b: b.select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return grouped_sum_count(ds, ["o_custkey"], count_col=cnt_name,
                             final="hash")


def q_yoy_orders(sf_dir: str):
    """Year-over-year customer activity via the corpus×corpus FULL
    OUTER equi-join (ops/join.outer_join): per-customer 1996 order
    counts ⟗ 1997 counts — customers active in only one year keep a
    typed-null count for the other (COALESCE key semantics). Both
    sides stay distributed end to end: two grouped-count exchanges
    feed one key-hash outer-join exchange of 24 B/row partials."""
    from .ops.join import outer_join

    a = _yoy_side(sf_dir, SETOP_LO, SETOP_MID, "cnt_a")
    b = _yoy_side(sf_dir, SETOP_MID, SETOP_HI, "cnt_b")
    return outer_join(a, b, "o_custkey", how="full_outer")


Q6_DISC_LO, Q6_DISC_HI = 5, 7  # discount-percent window (exact ints)
Q6_QTY = 24

UPS_OFF = 1_000_000_000  # insert-id offset (far above any custkey)

SPAN_N, SPAN_MAX_OCC = 8, 2  # frequent-span removal parameters

LM_Q = 1 << 30  # unigram-LM fixed-point scale (text/lm.py)

HQ_BINS = 65536  # histogram-quantile sketch resolution

HOP_US = 3_600_000_000  # hopping-window hop (1 h in µs)
HOP_K = 3  # window length = 3 hops (3 h sliding windows)


SSSP_LEVELS = 8
SSSP_DEG = 3
SSSP_C = 331
SSSP_SRC_MOD = 104  # lcm(8, 13): level-0 nodes with doc_id % 13 == 0
SSSP_WMOD = 50


def q_sssp(sf_dir: str):
    """Weighted multi-source shortest paths (ops/graph.sssp) over a
    level-structured document DAG (level = doc_id % 8, edges only to
    the next level, positive integer weights) — Bellman-Ford BSP on
    the pagerank iteration-invariant layout; LEVELS−1 rounds are
    exact on this DAG. Oracle = recursive-CTE walk enumeration with
    min(dist) per node (terminates: the graph is a bounded-depth
    DAG)."""
    import pyarrow.parquet as pq

    from .ops.graph import sssp

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nb = n // SSSP_LEVELS
    docs = _read(sf_dir, "documents", ["doc_id"])

    def mk_edges(batch: pa.Table) -> pa.Table:
        k = batch["doc_id"].to_numpy()
        k = k[k % SSSP_LEVELS < SSSP_LEVELS - 1]
        src = np.repeat(k, SSSP_DEG)
        j = np.tile(np.arange(SSSP_DEG, dtype=np.int64), len(k))
        dst = (src % SSSP_LEVELS) + 1 + SSSP_LEVELS * (
            (src * AX + j * SSSP_C + BX) % nb
        )
        w = 1 + (src * 7 + j * 13) % SSSP_WMOD
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "w": pa.array(w),
            }
        )

    edges = docs.map_batches(
        mk_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b["doc_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    sources = np.arange(0, n, SSSP_SRC_MOD, dtype=np.int64)
    return sssp(edges, nodes, sources, rounds=SSSP_LEVELS - 1)


def q_coverage(sf_dir: str):
    """Per-user de-overlapped active time: total length of the UNION
    of each user's event intervals (ops/temporal.interval_coverage) —
    the sweep-line gaps-and-islands measure duplicate-counting sums
    get wrong. Intervals are the interval_pairs derivation
    ([ts, ts + (1 + id % 240) s)); touching intervals merge. All
    arithmetic is exact integer µs."""
    from .ops.temporal import interval_coverage

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def iv(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy()
        s = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        dur = (1 + (k % IVJ_DUR_MOD)) * IVJ_DUR_UNIT
        return pa.table(
            {
                "user_id": b["user_id"],
                "s": pa.array(s),
                "e": pa.array(s + dur),
            }
        )

    return interval_coverage(
        ds.map_batches(iv, batch_format="pyarrow", zero_copy_batch=True)
    )


def q_asof_nearest(sf_dir: str):
    """Nearest as-of join (pandas merge_asof direction="nearest"
    parity): odd-id "trades" matched to the CLOSEST even-id "quote"
    of the same user by absolute time distance — distance ties (and
    the equal-ts distance-0 case) go backward. One exchange, both
    candidates filled in the same partition pass (prefix-max +
    suffix-min over the backward sort layout)."""
    from .ops.temporal import asof_join

    def odd(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b["event_id"], 1), 1)
        ).select(["event_id", "user_id", "ts"])

    def even(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b["event_id"], 1), 0)
        ).select(["event_id", "user_id", "ts", "value"])

    trades = _read(
        sf_dir, "events", ["event_id", "user_id", "ts"]
    ).map_batches(odd, batch_format="pyarrow", zero_copy_batch=True)
    quotes = _read(
        sf_dir, "events", ["event_id", "user_id", "ts", "value"]
    ).map_batches(even, batch_format="pyarrow", zero_copy_batch=True)
    return asof_join(
        trades,
        quotes,
        value_cols=(("value", "quote_value"),),
        out_left_id="trade_id",
        out_right_id="quote_id",
        direction="nearest",
    )


def q_hopping(sf_dir: str):
    """Hopping (sliding) window aggregate over the events stream —
    3-hour windows advancing every hour, each event contributing to
    exactly K=3 overlapping windows. The streaming-window shape
    tumbling ``events_hourly`` can't express: per batch each row is
    replicated K times with vectorized repeat/tile window indices
    (window START index = floor(ts/hop) − j), integer-cents values
    keep partial sums exact in any order, and the small
    (window-count-sized) partials driver-merge exactly like the
    tumbling query."""
    from .ops.agg import grouped_sum_count

    ds = _read(sf_dir, "events", ["ts", "value"])

    def expand(batch: pa.Table) -> pa.Table:
        ep = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        wi = ep // HOP_US
        cents = pc.cast(
            pc.round(pc.multiply(batch["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        win = np.repeat(wi, HOP_K) - np.tile(
            np.arange(HOP_K, dtype=np.int64), len(wi)
        )
        return pa.table(
            {
                "win": pa.array(win),
                "value_cents": pa.array(np.repeat(cents, HOP_K)),
            }
        )

    out = grouped_sum_count(
        ds.map_batches(expand, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["win"],
        sum_cols=["value_cents"],
        count_col="n_events",
        final="driver",
    )
    return pa.table(
        {
            "win_start_us": pc.multiply(
                out["win"], pa.scalar(HOP_US, pa.int64())
            ),
            "value_cents": out["value_cents"],
            "n_events": out["n_events"],
        }
    )


def q_approx_percentiles(sf_dir: str):
    """Histogram-sketch approximate quantiles of a CONTINUOUS column
    (ops/sketch.histogram_quantiles): per-returnflag p25/p50/p90/p99
    of l_extendedprice. Approximate (value error ≤ (hi−lo)/2^16) yet
    fully deterministic — exact min/max/count pass + exact integer
    bin counts + integer-rational rank thresholds — so it is
    SQL-oracled value-exact like the exact ops."""
    from .ops.sketch import histogram_quantiles

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    return histogram_quantiles(
        ds, "l_returnflag", "l_extendedprice", bins=HQ_BINS
    )


def q_lm_score(sf_dir: str):
    """Corpus-unigram-LM document scoring (text/lm.unigram_logscore)
    — the CCNet-style model-based quality signal, SQL-oracled via the
    exact-integer quantized-log recipe (per-word round(ln(c)·2^30)
    scores sum exactly; ONE mirrored IEEE division per doc)."""
    from .text.lm import unigram_logscore

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return unigram_logscore(ds)


def q_dedup_spans(sf_dir: str):
    """Exact-substring (frequent word-8-gram) span removal over the
    documents corpus (text/spans.remove_frequent_spans) — Lee et al.
    2022 curation: tokens covered by any 8-gram occurring ≥3 times
    corpus-wide are scrubbed from every document. Two passes: the
    frequent_ngrams gram-hash reduction (only above-threshold grams
    reach the driver), then a broadcast-banned-set scrub with a
    difference-array coverage cumsum — the token stream never
    shuffles. Fully-covered documents come back as empty strings."""
    from .text.spans import remove_frequent_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return remove_frequent_spans(ds, n=SPAN_N, max_occ=SPAN_MAX_OCC)


def q_upsert(sf_dir: str):
    """Lakehouse CDC MERGE (ops/diff.merge_upsert): apply a derived
    changeset to the customer snapshot — updates (custkey%7==0:
    acctbal+1000), deletes (custkey%11==0), inserts (custkey%13==0
    under a disjoint id offset). One id-hash exchange with a side
    tag; each partition takes the last row per id group (change wins)
    minus deletes. All value arithmetic is mirrored IEEE (x+1000.0,
    k·0.25), so the merged snapshot is value-exact vs the FULL OUTER
    JOIN oracle."""
    from .ops.diff import merge_upsert

    cols = ["c_custkey", "c_acctbal", "c_nationkey"]
    base = _read(sf_dir, "customer", cols)

    def chg(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy()
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        nat = b["c_nationkey"].to_numpy(zero_copy_only=False)
        m = (k % 7 == 0) | (k % 11 == 0)
        mi = k % 13 == 0
        upd = pa.table(
            {
                "c_custkey": pa.array(k[m]),
                "c_acctbal": pa.array(bal[m] + 1000.0),
                "c_nationkey": pa.array(nat[m], type=pa.int32()),
                "_del": pa.array(k[m] % 11 == 0),
            }
        )
        ins = pa.table(
            {
                "c_custkey": pa.array(k[mi] + UPS_OFF),
                "c_acctbal": pa.array(k[mi].astype(np.float64) * 0.25),
                "c_nationkey": pa.array(
                    (k[mi] % 25).astype(np.int32), type=pa.int32()
                ),
                "_del": pa.array(np.zeros(int(mi.sum()), dtype=bool)),
            }
        )
        return pa.concat_tables([upd, ins])

    changes = _read(sf_dir, "customer", cols).map_batches(
        chg, batch_format="pyarrow", zero_copy_batch=True
    )
    return merge_upsert(
        base, changes, "c_custkey",
        ["c_acctbal", "c_nationkey"], delete_col="_del",
    )


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 — forecasting revenue change: Σ price·discount over
    one shipping year for discounts in [0.05, 0.07] and quantity <
    24. Pure scan shape: read-pruned columns + parquet row-group date
    pushdown, one vectorized predicate + exact integer partial
    (price-cents × disc%, unit 10⁻⁴ dollars) per block, arbitrary-
    precision driver merge of the one-row partials; the single float
    output mirrors the oracle's CAST(HUGEINT AS DOUBLE)."""
    from datetime import datetime

    import pyarrow.dataset as pads
    import ray.data

    from .ops.agg import grouped_sums_exact

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=(
            (pads.field("l_shipdate")
             >= pa.scalar(datetime.fromisoformat(SETOP_LO)))
            & (pads.field("l_shipdate")
               < pa.scalar(datetime.fromisoformat(SETOP_MID)))
        ),
    )

    def rev(b: pa.Table) -> pa.Table:
        disc = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64()
        )
        m = pc.and_(
            pc.and_(
                pc.greater_equal(disc, pa.scalar(Q6_DISC_LO, pa.int64())),
                pc.less_equal(disc, pa.scalar(Q6_DISC_HI, pa.int64())),
            ),
            pc.less(b["l_quantity"], float(Q6_QTY)),
        )
        price = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)),
            pa.int64(),
        )
        r = pc.if_else(m, pc.multiply(price, disc),
                       pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "k": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "rev_u": r,
                "hit": pc.cast(m, pa.int64()),
            }
        )

    rows = grouped_sums_exact(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        ["k"],
        sum_cols=["rev_u", "hit"],
    )
    (r,) = rows
    return pa.table(
        {
            "n": pa.array([int(r["hit"])], type=pa.int64()),
            "revenue_u": pa.array([float(int(r["rev_u"]))],
                                  type=pa.float64()),
        }
    )


def q_type_entropy(sf_dir: str):
    """Per-user Shannon entropy (nats) of the event-type mix
    (ops/infotheory.grouped_entropy, final="shuffle" — the wide-key
    path): per-batch Arrow partials reduce the stream to distinct
    (user, type, count) rows, one keyed exchange co-locates each
    user's histogram, and the entropy is exact-int floor-quantized
    logs with ONE mirrored division (module docstring for why floor,
    not round)."""
    from .ops.infotheory import grouped_entropy

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return grouped_entropy(ds, "user_id", "event_type")


def q_flag_mi(sf_dir: str):
    """Mutual information between returnflag and linestatus per
    ship-year (ops/infotheory.grouped_mutual_info, final="driver" —
    the few-key contract: ≤ 7 year groups, cell histogram is
    dimension-sized)."""
    from .ops.infotheory import grouped_mutual_info

    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_returnflag", "l_linestatus"])

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
            }
        )

    return grouped_mutual_info(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "l_year",
        "l_returnflag",
        "l_linestatus",
        final="driver",
    )


CHI2_LEN_BUCKET = 256


def q_lang_chi2(sf_dir: str):
    """Chi-square independence of language × document-length bucket
    per source (ops/infotheory.grouped_chi2, final="driver" — few
    sources): is a source's language mix independent of document
    length? Exact-floor HUGEINT cell terms, chi2 + Cramér's V each a
    short mirrored IEEE chain."""
    from .ops.infotheory import grouped_chi2

    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])

    def derive(b: pa.Table) -> pa.Table:
        nb = b["n_chars"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b["source"],
                "lang": b["lang"],
                "len_bucket": pa.array(nb // CHI2_LEN_BUCKET),
            }
        )

    return grouped_chi2(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "source",
        "lang",
        "len_bucket",
        final="driver",
    )


def query_registry():
    """name → callable(sf_dir) for every shipped pipeline — the single
    source of truth shared by the driver contract (__ray_entry__.py)
    and the job CLI (python -m maup_ray)."""
    return {
        # maup spatial family (SQL-oracled, value-exact by construction)
        "assign_points": q_assign_points,
        "assign_blocks": q_assign_blocks,
        "pieces": q_pieces,
        "assign_by_area": q_assign_by_area,
        "assign_to_max": q_assign_to_max,
        "normalize": q_normalize,
        "prorate": q_prorate,
        "adjacencies": q_adjacencies,
        "adjacencies_xl": q_adjacencies_xl,
        "doctor_xl": q_doctor_xl,
        "crop_xl": q_crop_xl,
        "expand_xl": q_expand_xl,
        "smart_repair_xl": q_smart_repair_xl,
        "tile_skew": q_tile_skew,
        "pieces_xl": q_pieces_xl,
        "prorate_xl": q_prorate_xl,
        "assign_xl": q_assign_xl,
        "normalize_xl": q_normalize_xl,
        "islands": q_islands,
        "count_overlaps": q_count_overlaps,
        "cell_tiles": q_cell_tiles,
        "events_hourly": q_events_hourly,
        "gapfill": q_gapfill,
        "top_event_types": q_top_event_types,
        "spearman": q_spearman,
        "kendall": q_kendall,
        "streaks": q_streaks,
        "scd2": q_scd2,
        "inverted": q_inverted,
        "url_hosts": q_url_hosts,
        "knn": q_knn,
        "knn_xl": q_knn_xl,
        "rasterize": q_rasterize,
        "sessions": q_sessions,
        "funnel": q_funnel,
        "rolling_window": q_rolling_window,
        "asof_join": q_asof_join,
        "asof_forward": q_asof_forward,
        "transitions": q_transitions,
        "trajectory": q_trajectory,
        "snapshot_diff": q_snapshot_diff,
        "range_join": q_range_join,
        # training-data family
        "order_totals": q_order_totals,
        "pricing_summary": q_pricing_summary,
        "cell_compact": q_cell_compact,
        "customer_orders": q_customer_orders,
        "event_gaps": q_event_gaps,
        "top_event_type": q_top_event_type,
        "event_pivot": q_event_pivot,
        "covar": q_covar,
        "zonal": q_zonal,
        "retention": q_retention,
        "running_total": q_running_total,
        "cust_no_urgent": q_cust_no_urgent,
        "supplier_rank": q_supplier_rank,
        "order_concat": q_order_concat,
        "custdist": q_custdist,
        "nearest_district": q_nearest_district,
        "pagerank": q_pagerank,
        "image_assign": q_image_assign,
        "image_cells": q_image_cells,
        "event_tiles": q_event_tiles,
        "latest_event": q_latest_event,
        "first_order": q_first_order,
        "top_unshipped": q_top_unshipped,
        "label_centroids": q_label_centroids,
        "points_within": q_points_within,
        "district_bbox": q_district_bbox,
        "props_extract": q_props_extract,
        "region_revenue": q_region_revenue,
        "rollup_revenue": q_rollup_revenue,
        "outliers": q_outliers,
        "triangles": q_triangles,
        "intervals": q_intervals,
        "cooccur": q_cooccur,
        "order_rank": q_order_rank,
        "weighted_sample": q_weighted_sample,
        "winsorize": q_winsorize,
        "gini": q_gini,
        "typo_pairs": q_typo_pairs,
        "raster_components": q_raster_components,
        "caption_stats": q_caption_stats,
        "aspect_buckets": q_aspect_buckets,
        "image_shards": q_image_shards,
        "hot_cells": q_hot_cells,
        "big_orders": q_big_orders,
        "local_volume": q_local_volume,
        "patch_stats": q_patch_stats,
        "image_hist": q_image_hist,
        "image_moments": q_image_moments,
        # per-image dominant 9-bit RGB bucket (media/image.py)
        "dominant_color": q_dominant_color,
        "image_sharpness": q_image_sharpness,
        "tfidf": q_tfidf,
        "supplier_prank": q_supplier_prank,
        "revenue_cube": q_revenue_cube,
        "percentiles_cont": q_percentiles_cont,
        "search_map": q_search_map,
        "dedup_rewrite": q_dedup_rewrite,
        "bfs_hops": q_bfs_hops,
        "word_stats": q_word_stats,
        "price_hist": q_price_hist,
        "wmedian": q_wmedian,
        "mad": q_mad,
        "quality_model": q_quality_model,
        "sample": q_sample,
        "stratified_sample": q_stratified_sample,
        "topk_user": q_topk_user,
        "percentiles": q_percentiles,
        "distinct_users": q_distinct_users,
        "token_count": q_token_count,
        "normalize_text": q_normalize_text,
        "token_bpe": q_token_bpe,
        "quality": q_quality,
        "dedup_exact": q_dedup_exact,
        "decontaminate": q_decontaminate,
        "curation": q_curation,
        "ngrams": q_ngrams,
        "collocations": q_collocations,
        "profile": q_profile,
        "near_dup": q_near_dup,
        "ann_topk": q_ann_topk,
        "embed_dedup": q_embed_dedup,
        "redact": q_redact,
        "chunks": q_chunks,
        "pack": q_pack,
        "bm25": q_bm25,
        "bm25_multi": q_bm25_multi,
        "hull_diameter": q_hull_diameter,
        "pareto": q_pareto,
        "interval_pairs": q_interval_pairs,
        "audio_energy": q_audio_energy,
        "audio_resample": q_audio_resample,
        "ohlc": q_ohlc,
        "skewkurt": q_skewkurt,
        "simplify": q_simplify,
        "compactness": q_compactness,
        "dissolve": q_dissolve,
        "erase": q_erase,
        "small_qty": q_small_qty,
        "trade_volume": q_trade_volume,
        "idle_customers": q_idle_customers,
        "impurity": q_impurity,
        "tile_pyramid": q_tile_pyramid,
        "unpivot": q_unpivot,
        "heavy_hitters": q_heavy_hitters,
        "brand_mode": q_brand_mode,
        "image_search": q_image_search,
        "rolling_z": q_rolling_z,
        "trend": q_trend,
        "promo_revenue": q_promo_revenue,
        "twap": q_twap,
        "embed_dims": q_embed_dims,
        # rows-only (non-SQL-expressible: hash/LSH/model-ish ops)
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "approx_distinct": q_approx_distinct,
        "embed_cluster": q_embed_cluster,
        "embed_prune": q_embed_prune,
        "embed_pca": q_embed_pca,
        "bpe_train": q_bpe_train,
        "image_phash": q_image_phash,
        "image_doctor": q_image_doctor,
        "image_dedup": q_image_dedup,
        "audio_dedup": q_audio_dedup,
        "video_frames": q_video_frames,
        "video_cuts": q_video_cuts,
        "video_dedup": q_video_dedup,
        # repair family (rows-only; pytest brute-force oracles)
        "quick_repair": q_quick_repair,
        "smart_repair": q_smart_repair,
        "doctor": q_doctor,
        # SQL set operations (bag semantics; ops/setops.py)
        "except_parts": q_except_parts,
        "intersect_parts": q_intersect_parts,
        # corpus×corpus FULL OUTER join (ops/join.outer_join)
        "yoy_orders": q_yoy_orders,
        # TPC-H Q6 (pure-scan filter + exact global aggregate)
        "forecast_revenue": q_forecast_revenue,
        # lakehouse CDC MERGE (ops/diff.merge_upsert)
        "upsert": q_upsert,
        # exact-substring span removal (text/spans.py)
        "dedup_spans": q_dedup_spans,
        # unigram-LM quality scoring (text/lm.py)
        "lm_score": q_lm_score,
        # histogram-sketch continuous quantiles (ops/sketch.py)
        "approx_percentiles": q_approx_percentiles,
        # hopping / sliding window aggregate
        "hopping": q_hopping,
        # merge_asof direction="nearest" parity
        "asof_nearest": q_asof_nearest,
        # interval-union coverage (sweep line)
        "coverage": q_coverage,
        # weighted shortest paths (Bellman-Ford BSP)
        "sssp": q_sssp,
        # per-node clustering coefficient (ops/graph.py)
        "clustering": q_clustering,
        # k-core BSP peeling (ops/graph.py)
        "kcore": q_kcore,
        # centroid pairwise cosine (vector analytics)
        "centroid_sim": q_centroid_sim,
        # line-in-region overlay (ops/lines.py)
        "road_lengths": q_road_lengths,
        # trailing dyadic EWMA (ops/temporal.py)
        "ewma": q_ewma,
        # per-language vocabulary stats (text/analysis.py)
        "vocab_stats": q_vocab_stats,
        # count-min sketch estimates (ops/sketch.py)
        "cms_counts": q_cms_counts,
        # group-median imputation (feature cleaning)
        "impute": q_impute,
        # item-item cosine/jaccard from the co-click matrix
        "item_sim": q_item_sim,
        # RFM user segmentation (global ntile ranks)
        "rfm": q_rfm,
        # quantized-reciprocal harmonic mean
        "hmean": q_hmean,
        # information-theory family (ops/infotheory.py)
        "type_entropy": q_type_entropy,
        "flag_mi": q_flag_mi,
        "lang_chi2": q_lang_chi2,
        # per-type OLS drift trend (ops/stats.grouped_ols)
        "regression": q_regression,
        # per-user lag-1 autocorrelation (ops/temporal.py)
        "autocorr": q_autocorr,
        # quantized-log geometric mean
        "geomean": q_geomean,
        # frequent session event paths (ops/sessions.py)
        "session_paths": q_session_paths,
        # declarative data-quality audit report
        "dq_audit": q_dq_audit,
        # friend-of-friend link prediction (ops/graph.py)
        "link_pred": q_link_pred,
        # per-user rolling 5-row median (ops/window.py)
        "rolling_median": q_rolling_median,
        # grouped two-sample pooled t² A/B readout (ops/stats.py)
        "ab_test": q_ab_test,
        # day-over-day revenue growth per event_type
        "growth": q_growth,
        # int8 scalar-quantization audit of the embedding table
        "embed_quant": q_embed_quant,
        # multinomial Naive Bayes training (text/nb.py)
        "nb_train": q_nb_train,
        # NB train→score composition (text/nb.py)
        "nb_classify": q_nb_classify,
        # morphological opening of the district mask (ops/raster.py)
        "raster_open": q_raster_open,
        # Tukey-fence outlier census (ops/curate.py)
        "iqr_outliers": q_iqr_outliers,
        # Theil–Sen robust slope (ops/stats.py)
        "theil_sen": q_theil_sen,
        # 3×3 focal sum over the district mask (ops/raster.py)
        "focal_stats": q_focal_stats,
        # balanced Z-order range-partition manifest (ops/tiling.py)
        "zorder_parts": q_zorder_parts,
        # exact two-sample KS drift statistic (ops/stats.py)
        "ks_test": q_ks_test,
        # exact Mann–Whitney U rank-sum test (ops/stats.py)
        "mannwhitney": q_mannwhitney,
        # donut-district PIP assignment (interior rings, ops/assign.py)
        "assign_donut": q_assign_donut,
        # assign → exact per-district point dispersion composition
        "district_dispersion": q_district_dispersion,
        # decision-tree Gini split scan (ops/stats.py)
        "gini_splits": q_gini_splits,
        # distinct-user transition support (sequence mining)
        "transition_support": q_transition_support,
        # image decode → spatial join → quality aggregate composite
        "district_image_quality": q_district_image_quality,
        # peak simultaneous sessions per event_type (ops/temporal.py)
        "peak_concurrency": q_peak_concurrency,
        # power-of-two value histogram (exact frexp buckets)
        "pow2_hist": q_pow2_hist,
        # minimum spanning forest, distributed Boruvka (rows-only)
        "mst": q_mst,
        # per-user rolling min/max envelope (ops/window.py)
        "rolling_channel": q_rolling_channel,
        # session-duration percentiles (sessionize → exact quantiles)
        "session_len_pct": q_session_len_pct,
        # top-2 user revenue concentration per event_type
        "top2_share": q_top2_share,
        # cumulative distinct-user growth curve
        "user_growth": q_user_growth,
        # row-level DQ quarantine routing
        "quarantine": q_quarantine,
        # power-law fit of the basket-size histogram (qlog OLS)
        "powerlaw": q_powerlaw,
        # Lorenz decile revenue shares (grouped_ntile composition)
        "revenue_deciles": q_revenue_deciles,
        # dormancy win-back detection per user
        "winback": q_winback,
        # connected components over the block-chain graph
        "components": q_components,
        # per-customer median reorder interval (ops/temporal.py)
        "reorder_gaps": q_reorder_gaps,
        # basket-size distribution over lineitem
        "basket_hist": q_basket_hist,
        # per-user maximum drawdown (ops/window.py)
        "max_drawdown": q_max_drawdown,
        # day-of-week seasonality profile + peak deviation day
        "dow_profile": q_dow_profile,
        # Benford first-digit census of order totals
        "benford": q_benford,
        # exact CUSUM changepoint per event_type (ops/temporal.py)
        "cusum": q_cusum,
        # graph degree distribution (ops/graph.py)
        "degree_hist": q_degree_hist,
        # TPC-H shape completion (all SQL-oracled; pipelines_tpch.py)
        **_tpch_queries(),
    }


def _tpch_queries():
    from .pipelines_tpch import TPCH_QUERIES

    return TPCH_QUERIES


def oracle_queries() -> dict[str, str]:
    px, py = _points_expr()
    dist = districts_sql(N_DISTRICTS)
    return {
        "assign_points": f"""
            SELECT doc_id, district_id
            FROM documents, {dist}
            WHERE {px} >= minx AND {px} < maxx
              AND {py} >= miny AND {py} < maxy
        """,
        "pieces": f"""
            WITH {_rects_cte()}
            SELECT doc_id, district_id, area FROM pieces WHERE area > 0
        """,
        "assign_by_area": f"""
            WITH {_rects_cte()},
            ranked AS (
              SELECT doc_id, district_id,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY area DESC, district_id) AS rn
              FROM pieces WHERE area > 0)
            SELECT doc_id, district_id FROM ranked WHERE rn = 1
        """,
        "assign_to_max": f"""
            WITH {_rects_cte()},
            ranked AS (
              SELECT doc_id, district_id,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY area DESC, district_id) AS rn
              FROM pieces WHERE area > 0)
            SELECT doc_id, district_id FROM ranked WHERE rn = 1
        """,
        "assign_blocks": f"""
            WITH {_rects_cte()},
            covering AS (
              SELECT s.doc_id, d.district_id FROM srcs s JOIN dist d
                ON s.sminx >= d.minx AND s.smaxx <= d.maxx
               AND s.sminy >= d.miny AND s.smaxy <= d.maxy),
            cov AS (SELECT doc_id, min(district_id) AS district_id,
                           count(*) AS c
                    FROM covering GROUP BY doc_id),
            area_pick AS (
              SELECT doc_id, district_id FROM (
                SELECT doc_id, district_id,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY area DESC, district_id) AS rn
                FROM pieces WHERE area > 0) WHERE rn = 1)
            SELECT s.doc_id,
                   CASE WHEN cov.c = 1 THEN cov.district_id
                        ELSE area_pick.district_id END AS district_id
            FROM srcs s
            LEFT JOIN cov USING (doc_id)
            LEFT JOIN area_pick USING (doc_id)
        """,
        "normalize": f"""
            WITH {_rects_cte()},
            pos AS (SELECT * FROM pieces WHERE area > 0),
            tot AS (SELECT doc_id, sum(area) AS s FROM pos GROUP BY doc_id)
            SELECT p.doc_id, p.district_id, p.area / t.s AS weight
            FROM pos p JOIN tot t USING (doc_id)
        """,
        "prorate": f"""
            WITH {_rects_cte()},
            pos AS (SELECT * FROM pieces WHERE area > 0)
            SELECT p.district_id,
                   sum(d.n_chars * p.area) AS weighted_chars
            FROM pos p JOIN documents d USING (doc_id)
            GROUP BY p.district_id
        """,
        "adjacencies": f"""
            WITH dist AS (SELECT * FROM {dist} )
            SELECT a.district_id AS id_i, b.district_id AS id_j,
              CASE
                WHEN a.maxx = b.minx OR b.maxx = a.minx THEN
                  greatest(0.0, least(a.maxy,b.maxy)-greatest(a.miny,b.miny))
                WHEN a.maxy = b.miny OR b.maxy = a.miny THEN
                  greatest(0.0, least(a.maxx,b.maxx)-greatest(a.minx,b.minx))
                ELSE 0.0 END AS length
            FROM dist a JOIN dist b ON a.district_id < b.district_id
            WHERE CASE
                WHEN a.maxx = b.minx OR b.maxx = a.minx THEN
                  greatest(0.0, least(a.maxy,b.maxy)-greatest(a.miny,b.miny))
                WHEN a.maxy = b.miny OR b.maxy = a.miny THEN
                  greatest(0.0, least(a.maxx,b.maxx)-greatest(a.minx,b.minx))
                ELSE 0.0 END > 0
        """,
        "adjacencies_xl": f"""
            WITH {BRICKS_SQL},
            h AS (
              SELECT a.k AS id_i, b.k AS id_j,
                     CAST({BRICK_H} AS DOUBLE) AS length
              FROM bricks a JOIN bricks b
                ON b.k = a.k + 1 AND a.cl < {BRICK_C - 1}),
            v AS (
              SELECT a.k AS id_i, b.k AS id_j,
                     CAST(least(a.x1, b.x1) - greatest(a.x0, b.x0)
                          AS DOUBLE) AS length
              FROM bricks a JOIN bricks b ON b.rw = a.rw + 1
              WHERE least(a.x1, b.x1) > greatest(a.x0, b.x0))
            SELECT id_i, id_j, length FROM h
            UNION ALL
            SELECT id_i, id_j, length FROM v
        """,
        "crop_xl": f"""
            WITH nn AS (SELECT (count(*) + {BRICK_C - 1}) // {BRICK_C}
                          AS rr FROM events),
            {BRICKS_SQL}
            SELECT k AS id,
              CAST(greatest(0, least(x1, 1000) - greatest(x0, 53))
                 * greatest(0, least((rw + 1) * {BRICK_H},
                                     (rr * {BRICK_H} * 3) // 4)
                            - greatest(rw * {BRICK_H}, 13))
                   AS DOUBLE) AS area
            FROM bricks, nn
            WHERE greatest(0, least(x1, 1000) - greatest(x0, 53))
                * greatest(0, least((rw + 1) * {BRICK_H},
                                    (rr * {BRICK_H} * 3) // 4)
                           - greatest(rw * {BRICK_H}, 13)) > 0
        """,
        "expand_xl": f"""
            WITH nn AS (SELECT (count(*) + {BRICK_C - 1}) // {BRICK_C}
                          AS rr FROM events),
            {BRICKS_SQL},
            src AS (SELECT b.* FROM bricks b, nn
                    WHERE b.rw <= rr - 2 AND NOT b.k % 97 = 13),
            del AS (SELECT b.* FROM bricks b, nn
                    WHERE b.rw <= rr - 2 AND b.k % 97 = 13),
            cand AS (
              SELECT d.k AS piece, s.k AS sid,
                     CAST({BRICK_H} AS DOUBLE) AS ln
              FROM del d JOIN src s
                ON s.rw = d.rw AND (s.k = d.k - 1 OR s.k = d.k + 1)
              UNION ALL
              SELECT d.k, s.k,
                     CAST(least(d.x1, s.x1) - greatest(d.x0, s.x0)
                          AS DOUBLE)
              FROM del d JOIN src s ON abs(s.rw - d.rw) = 1
              WHERE least(d.x1, s.x1) - greatest(d.x0, s.x0) > 0),
            win AS (
              SELECT piece, sid FROM (
                SELECT piece, sid,
                  row_number() OVER (PARTITION BY piece
                                     ORDER BY ln DESC, sid) AS rn
                FROM cand) WHERE rn = 1),
            absorbed AS (
              SELECT w.sid AS k,
                     sum((d.x1 - d.x0) * {BRICK_H}) AS extra
              FROM win w JOIN del d ON d.k = w.piece GROUP BY w.sid)
            SELECT s.k AS id,
                   CAST((s.x1 - s.x0) * {BRICK_H}
                        + coalesce(a.extra, 0) AS DOUBLE) AS area
            FROM src s LEFT JOIN absorbed a USING (k)
        """,
        "pieces_xl": f"""
            WITH nn AS (SELECT (count(*) + {BRICK_C - 1}) // {BRICK_C}
                          AS rr FROM events),
            kk AS (SELECT {EXTENT} // greatest({BRICK_C * BRICK_W},
                                               rr * {BRICK_H}) AS k
                   FROM nn),
            {BRICKS_SQL},
            scaled AS (
              SELECT b.k AS event_id,
                     b.x0 * kk.k AS bx0, b.rw * {BRICK_H} * kk.k AS by0,
                     b.x1 * kk.k AS bx1,
                     (b.rw + 1) * {BRICK_H} * kk.k AS by1
              FROM bricks b, kk)
            SELECT s.event_id, d.district_id,
                   CAST((least(s.bx1, d.maxx) - greatest(s.bx0, d.minx))
                      * (least(s.by1, d.maxy) - greatest(s.by0, d.miny))
                        AS DOUBLE) AS area
            FROM scaled s JOIN {dist} d ON
                 least(s.bx1, d.maxx) > greatest(s.bx0, d.minx)
             AND least(s.by1, d.maxy) > greatest(s.by0, d.miny)
        """,
        "assign_xl": f"""
            SELECT event_id, district_id
            FROM events, {dist} d
            WHERE ((event_id * {AX} + {BX}) % {EXTENT}) + 0.5 >= d.minx
              AND ((event_id * {AX} + {BX}) % {EXTENT}) + 0.5 < d.maxx
              AND ((event_id * {AY} + {BY}) % {EXTENT}) + 0.5 >= d.miny
              AND ((event_id * {AY} + {BY}) % {EXTENT}) + 0.5 < d.maxy
        """,
        "prorate_xl": f"""
            WITH nn AS (SELECT (count(*) + {BRICK_C - 1}) // {BRICK_C} AS rr FROM events),
            kk AS (SELECT {EXTENT} // greatest({BRICK_C * BRICK_W}, rr * {BRICK_H}) AS k
                   FROM nn),
            {BRICKS_SQL},
            scaled AS (
              SELECT b.k AS event_id,
                     b.x0 * kk.k AS bx0, b.rw * {BRICK_H} * kk.k AS by0,
                     b.x1 * kk.k AS bx1,
                     (b.rw + 1) * {BRICK_H} * kk.k AS by1
              FROM bricks b, kk),
            px AS (
              SELECT s.event_id, d.district_id,
                     (least(s.bx1, d.maxx) - greatest(s.bx0, d.minx))
                   * (least(s.by1, d.maxy) - greatest(s.by0, d.miny))
                       AS area
              FROM scaled s JOIN {dist} d ON
                   least(s.bx1, d.maxx) > greatest(s.bx0, d.minx)
               AND least(s.by1, d.maxy) > greatest(s.by0, d.miny))
            SELECT p.district_id,
                   sum(CAST(round(e.value * 100.0) AS BIGINT) * p.area)
                     AS weighted_cents
            FROM px p JOIN events e USING (event_id)
            GROUP BY p.district_id
        """,
        "normalize_xl": f"""
            WITH nn AS (SELECT (count(*) + {BRICK_C - 1}) // {BRICK_C} AS rr FROM events),
            kk AS (SELECT {EXTENT} // greatest({BRICK_C * BRICK_W}, rr * {BRICK_H}) AS k
                   FROM nn),
            {BRICKS_SQL},
            scaled AS (
              SELECT b.k AS event_id,
                     b.x0 * kk.k AS bx0, b.rw * {BRICK_H} * kk.k AS by0,
                     b.x1 * kk.k AS bx1,
                     (b.rw + 1) * {BRICK_H} * kk.k AS by1
              FROM bricks b, kk),
            px AS (
              SELECT s.event_id, d.district_id,
                     (least(s.bx1, d.maxx) - greatest(s.bx0, d.minx))
                   * (least(s.by1, d.maxy) - greatest(s.by0, d.miny))
                       AS area
              FROM scaled s JOIN {dist} d ON
                   least(s.bx1, d.maxx) > greatest(s.bx0, d.minx)
               AND least(s.by1, d.maxy) > greatest(s.by0, d.miny)),
            tot AS (SELECT event_id, sum(area) AS s FROM px
                    GROUP BY event_id)
            SELECT p.event_id, p.district_id,
                   CAST(p.area AS DOUBLE) / t.s AS weight
            FROM px p JOIN tot t USING (event_id)
        """,
        "tile_skew": f"""
            SELECT
              CAST((CASE WHEN event_id % 10 < 3
                         THEN (event_id * 13) % {EXTENT // 16}
                         ELSE (event_id * {AX} + {BX}) % {EXTENT}
                    END) // {EXTENT // 16} AS BIGINT) AS cx,
              CAST((CASE WHEN event_id % 10 < 3
                         THEN (event_id * 29) % {EXTENT // 16}
                         ELSE (event_id * {AY} + {BY}) % {EXTENT}
                    END) // {EXTENT // 16} AS BIGINT) AS cy,
              count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "smart_repair_xl": f"""
            WITH nn AS (SELECT (count(*) + {BRICK_C - 1}) // {BRICK_C}
                          AS rr FROM events)
            SELECT CAST((rr - 1) * {BRICK_H} * {BRICK_C * BRICK_W}
                        AS BIGINT) AS total_area,
                   CAST((rr - 1) * {BRICK_C} AS BIGINT) AS n_units
            FROM nn
        """,
        "doctor_xl": f"""
            WITH nn AS (SELECT count(*) AS n,
                               (count(*) + {BRICK_C - 1}) // {BRICK_C}
                                 AS rr
                        FROM events),
            marks AS (
              SELECT event_id AS k,
                     event_id % {BRICK_C} AS cl,
                     (event_id % 101 = 5) AS grown,
                     (event_id % 103 = 7
                      AND (event_id // {BRICK_C}) % 2 = 1
                      AND event_id // {BRICK_C} <= rr - 3
                      AND NOT event_id % 101 = 5) AS shrunk
              FROM events, nn)
            SELECT
              (SELECT count(*) FROM marks, nn
                WHERE grown AND cl < {BRICK_C - 1} AND k + 1 < n)
                AS n_overlaps,
              (SELECT count(*) FROM marks
                WHERE shrunk AND cl < {BRICK_C - 1}) AS n_gaps
        """,
        "cell_tiles": f"""
            SELECT CAST(floor(({px}) / {EXTENT // 16}) AS BIGINT) AS cx,
                   CAST(floor(({py}) / {EXTENT // 16}) AS BIGINT) AS cy,
                   count(*) AS n_docs
            FROM documents GROUP BY 1, 2
        """,
        "spearman": """
            WITH b AS (SELECT CAST(l_linenumber AS BIGINT) AS k,
                              CAST(l_quantity AS BIGINT) AS x,
                              CAST(round(l_discount*100, 0) AS BIGINT)
                                AS y
                       FROM lineitem),
            r AS (SELECT k,
                    2*rank() OVER (PARTITION BY k ORDER BY x)
                      + count(*) OVER (PARTITION BY k, x) - 1 AS rx,
                    2*rank() OVER (PARTITION BY k ORDER BY y)
                      + count(*) OVER (PARTITION BY k, y) - 1 AS ry
                  FROM b),
            m AS (SELECT k, count(*) AS n,
                         SUM(CAST(rx AS HUGEINT)) AS sx,
                         SUM(CAST(ry AS HUGEINT)) AS sy,
                         SUM(CAST(rx AS HUGEINT)*ry) AS sxy,
                         SUM(CAST(rx AS HUGEINT)*rx) AS sxx,
                         SUM(CAST(ry AS HUGEINT)*ry) AS syy
                  FROM r GROUP BY k)
            SELECT k, CAST(n AS BIGINT) AS n,
                   CAST(n*sxy - sx*sy AS DOUBLE)
                   / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                          * CAST(n*syy - sy*sy AS DOUBLE)) AS rho
            FROM m ORDER BY k
        """,
        # kendall: tau-b from the unordered-pair self-join — the CASE
        # sign product, tie counts and n0 are exact integers; the one
        # float expression mirrors the engine token-for-token
        "kendall": """
            WITH p AS (
              SELECT a.user_id,
                     CASE WHEN (b.ts > a.ts AND b.value > a.value)
                            OR (b.ts < a.ts AND b.value < a.value)
                          THEN 1
                          WHEN (b.ts > a.ts AND b.value < a.value)
                            OR (b.ts < a.ts AND b.value > a.value)
                          THEN -1
                          ELSE 0 END AS s,
                     CASE WHEN b.ts = a.ts THEN 1 ELSE 0 END AS tx,
                     CASE WHEN b.value = a.value THEN 1 ELSE 0
                          END AS ty
              FROM events a JOIN events b
                ON a.user_id = b.user_id
                   AND a.event_id < b.event_id),
            g AS (SELECT user_id, sum(s) AS cd, sum(tx) AS n1,
                         sum(ty) AS n2, count(*) AS n0
                  FROM p GROUP BY user_id),
            c AS (SELECT user_id, count(*) AS n
                  FROM events GROUP BY user_id)
            SELECT c.user_id, CAST(c.n AS BIGINT) AS n,
                   CASE WHEN g.n0 - g.n1 > 0 AND g.n0 - g.n2 > 0
                        THEN CAST(g.cd AS DOUBLE)
                             / sqrt(CAST(g.n0 - g.n1 AS DOUBLE)
                                    * CAST(g.n0 - g.n2 AS DOUBLE))
                        ELSE NULL END AS tau
            FROM c JOIN g ON g.user_id = c.user_id
            ORDER BY c.user_id
        """,
        # streaks: gaps-and-islands — consecutive days share the
        # day − row_number() island key; CAST(ts AS DATE) equals the
        # engine's floor(ts_us / 86400e6) for epoch-positive stamps
        "streaks": """
            WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE)
                           AS day
                       FROM events),
            r AS (SELECT user_id, day,
                         row_number() OVER (PARTITION BY user_id
                             ORDER BY day) AS rn
                  FROM d),
            s AS (SELECT user_id, count(*) AS len
                  FROM r
                  GROUP BY user_id, day - CAST(rn AS INTEGER))
            SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days,
                   CAST(max(len) AS BIGINT) AS max_streak
            FROM s GROUP BY user_id ORDER BY user_id
        """,
        # scd2: the classic LEAD validity-interval construction; ties
        # on ts are totalized by event_id on both sides
        "scd2": """
            SELECT event_id, user_id, ts AS valid_from,
                   coalesce(lead(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                            TIMESTAMP '2200-01-01 00:00:00')
                       AS valid_to,
                   value
            FROM events
            ORDER BY user_id, valid_from, event_id
        """,
        # inverted: single-space tokenization (word_stats discipline);
        # postings = ascending comma-joined doc ids
        "inverted": """
            WITH t AS (SELECT doc_id,
                              unnest(string_split(text, ' ')) AS token
                       FROM documents),
            g AS (SELECT token, doc_id, count(*) AS c
                  FROM t GROUP BY 1, 2)
            SELECT token,
                   CAST(count(*) AS BIGINT) AS df,
                   CAST(sum(c) AS BIGINT) AS cf,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM g GROUP BY token HAVING count(*) >= 5
            ORDER BY token
        """,
        # url_hosts: the same deterministic URL synthesis as the
        # engine (scheme/www/case/query noise from doc_id), then RE2
        # host/path extraction + canonicalization — regexp_extract
        # returns \'\' on no-match where Arrow returns null, so the
        # path defaults via nullif/coalesce (a matched path is never
        # empty: the pattern requires a leading /)
        "url_hosts": """
            WITH h0 AS (
              SELECT doc_id,
                     (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE ''
                      END)
                     || 'site'
                     || CAST((doc_id * 7919) % 97 AS VARCHAR)
                     || '.example.'
                     || (CASE doc_id % 3 WHEN 0 THEN 'com'
                         WHEN 1 THEN 'org' ELSE 'net' END) AS h
              FROM documents),
            u AS (
              SELECT (CASE WHEN doc_id % 4 = 0 THEN 'http://'
                      ELSE 'https://' END)
                     || (CASE WHEN doc_id % 5 = 0 THEN upper(h)
                         ELSE h END)
                     || (CASE WHEN doc_id % 7 = 0 THEN ''
                         ELSE '/p/' || CAST(doc_id % 41 AS VARCHAR)
                         END)
                     || (CASE WHEN doc_id % 3 = 0
                         THEN '?utm_source=feed&ref='
                              || CAST(doc_id % 11 AS VARCHAR)
                         ELSE '' END) AS url
              FROM h0),
            c AS (
              SELECT regexp_replace(
                       lower(regexp_extract(
                         url, '^[a-zA-Z]+://([^/?#]+)', 1)),
                       '^www\.', '') AS host,
                     coalesce(nullif(regexp_extract(
                       url, '^[a-zA-Z]+://[^/?#]+(/[^?#]*)', 1),
                       ''), '/') AS path
              FROM u),
            g AS (SELECT host, path, count(*) AS c
                  FROM c GROUP BY 1, 2)
            SELECT host, CAST(sum(c) AS BIGINT) AS n_urls,
                   CAST(count(*) AS BIGINT) AS n_paths
            FROM g GROUP BY host ORDER BY host
        """,
        "top_event_types": f"""
            WITH c AS (SELECT user_id, event_type, count(*) AS n_occ
                       FROM events GROUP BY 1, 2),
            r AS (SELECT user_id, event_type, n_occ,
                         row_number() OVER (PARTITION BY user_id
                             ORDER BY n_occ DESC, event_type)
                           AS rank
                  FROM c)
            SELECT user_id, event_type, n_occ, rank FROM r
            WHERE rank <= {TOPVAL_K} ORDER BY user_id, rank
        """,
        "gapfill": """
            WITH b AS (SELECT event_type,
                              date_trunc('hour', ts) AS hour,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
            sp AS (SELECT t.event_type, h.hour
                   FROM (SELECT DISTINCT event_type FROM events) t
                   CROSS JOIN (SELECT unnest(generate_series(
                       (SELECT min(hour) FROM b),
                       (SELECT max(hour) FROM b),
                       INTERVAL 1 HOUR)) AS hour) h)
            SELECT sp.event_type, sp.hour, COALESCE(b.n, 0) AS n
            FROM sp LEFT JOIN b
              ON sp.event_type = b.event_type AND sp.hour = b.hour
            ORDER BY 1, 2
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n,
                   CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "profile": " UNION ALL ".join(
            f"""
            SELECT '{c}' AS "column", count(*) AS n,
                   count(*) - count({c}) AS n_null,
                   CAST(min({c}) AS DOUBLE) AS min_v,
                   CAST(max({c}) AS DOUBLE) AS max_v
            FROM lineitem"""
            for c in PROFILE_COLS
        ) + ' ORDER BY "column"',
        "ngrams": f"""
            WITH t AS (SELECT string_split(text, ' ') AS toks
                       FROM documents),
            g AS (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         AS gram
                  FROM (SELECT toks, unnest(range(1, len(toks) - 1)) AS i
                        FROM t WHERE len(toks) >= 3))
            SELECT gram, count(*) AS n_occ FROM g
            GROUP BY gram HAVING count(*) >= {NGRAM_MIN_COUNT}
            ORDER BY gram
        """,
        "collocations": f"""
            WITH t AS (SELECT string_split(text, ' ') AS toks
                       FROM documents),
            u AS (SELECT unnest(toks) AS w FROM t),
            uc AS (SELECT w, count(*) AS c FROM u GROUP BY w),
            tot AS (SELECT count(*) AS nu FROM u),
            nd AS (SELECT count(*) AS n FROM documents),
            b AS (SELECT toks[i] AS w1, toks[i+1] AS w2
                  FROM (SELECT toks, unnest(range(1, len(toks))) AS i
                        FROM t WHERE len(toks) >= 2)),
            bc AS (SELECT w1, w2, count(*) AS c FROM b GROUP BY w1, w2
                   HAVING count(*) >= {COLLOC_MIN_COUNT})
            SELECT bc.w1 || ' ' || bc.w2 AS gram, bc.c AS n_occ,
                   CAST(CAST(bc.c AS HUGEINT) * tot.nu * tot.nu
                        AS DOUBLE)
                   / CAST(CAST(tot.nu - nd.n AS HUGEINT)
                          * c1.c * c2.c AS DOUBLE) AS lift
            FROM bc, tot, nd
            JOIN uc c1 ON bc.w1 = c1.w
            JOIN uc c2 ON bc.w2 = c2.w
            ORDER BY lift DESC, gram LIMIT {COLLOC_K}
        """,
        "curation": r"""
            WITH q AS (
              SELECT doc_id, text,
                CAST(len(regexp_split_to_array(trim(text), '\s+'))
                     AS BIGINT) AS n_tokens,
                CAST(length(regexp_replace(text, '\s+', '', 'g'))
                     AS DOUBLE)
                  / CAST(len(regexp_split_to_array(trim(text), '\s+'))
                         AS DOUBLE) AS mean_token_len
              FROM documents),
            kept AS (
              SELECT min(doc_id) AS doc_id FROM q
              WHERE n_tokens >= 5 AND mean_token_len < 12.0
              GROUP BY text)
            SELECT doc_id FROM kept
            WHERE (doc_id * 48271 + 11) % 100 < 50
        """,
        "order_totals": """
            SELECT c_nationkey,
                   CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT))
                        AS BIGINT) AS price_cents,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "pricing_summary": f"""
            WITH f AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(round(l_quantity, 0) AS BIGINT) AS qty,
                     CAST(round(l_extendedprice*100, 0) AS BIGINT)
                         AS cents,
                     CAST(round(l_discount*100, 0) AS BIGINT) AS disc,
                     CAST(round(l_tax*100, 0) AS BIGINT) AS tax
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}')
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(qty) AS BIGINT) AS sum_qty,
                   CAST(sum(cents) AS BIGINT) AS base_cents,
                   CAST(sum(cents*(100-disc)) AS BIGINT) AS disc_u,
                   CAST(sum(cents*(100-disc)*(100+tax)) AS BIGINT)
                       AS charge_u,
                   count(*) AS n,
                   CAST(sum(qty) AS DOUBLE) / count(*) AS avg_qty,
                   CAST(sum(cents) AS DOUBLE) / count(*)
                       AS avg_price_cents,
                   CAST(sum(disc) AS DOUBLE) / count(*)
                       AS avg_disc_pct
            FROM f GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "customer_orders": """
            SELECT c_custkey, c_mktsegment,
                   COALESCE(o.price_cents, 0) AS price_cents,
                   COALESCE(o.n_orders, 0) AS n_orders
            FROM customer LEFT JOIN (
              SELECT o_custkey,
                     CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT))
                          AS BIGINT) AS price_cents,
                     count(*) AS n_orders
              FROM orders GROUP BY 1) o ON c_custkey = o_custkey
        """,
        "cell_compact": f"""
            WITH r AS (
              SELECT (doc_id*{AX}+{BX}) % {EXTENT} AS px,
                     (doc_id*{AY}+{BY}) % {EXTENT} AS py,
                     1000 + (doc_id % 97) * 50 AS hx,
                     1000 + (doc_id % 89) * 50 AS hy
              FROM documents),
            b AS (
              SELECT least(greatest(px - hx, 0) // {EXTENT >> CELL_RES},
                           {(1 << CELL_RES) - 1}) AS lox,
                     least(greatest(px + hx, 0) // {EXTENT >> CELL_RES},
                           {(1 << CELL_RES) - 1}) AS hix,
                     least(greatest(py - hy, 0) // {EXTENT >> CELL_RES},
                           {(1 << CELL_RES) - 1}) AS loy,
                     least(greatest(py + hy, 0) // {EXTENT >> CELL_RES},
                           {(1 << CELL_RES) - 1}) AS hiy
              FROM r),
            xs AS (SELECT unnest(range(lox, hix + 1)) AS cx, loy, hiy
                   FROM b),
            cov AS (SELECT DISTINCT cx, cy FROM
                    (SELECT cx, unnest(range(loy, hiy + 1)) AS cy
                     FROM xs)),
            lv AS (SELECT unnest(range(0, {CELL_RES + 1})) AS l),
            anc AS (SELECT l, cx >> l AS ax, cy >> l AS ay,
                           count(*) AS cnt
                    FROM cov, lv GROUP BY 1, 2, 3),
            comp AS (SELECT l, ax, ay FROM anc
                     WHERE cnt = (CAST(1 AS BIGINT) << (2*l)))
            SELECT {CELL_RES} - c.l AS res, c.ax AS cx, c.ay AS cy
            FROM comp c LEFT JOIN comp p
              ON p.l = c.l + 1 AND p.ax = c.ax >> 1
                 AND p.ay = c.ay >> 1
            WHERE p.l IS NULL
            ORDER BY res, cx, cy
        """,
        "event_gaps": """
            SELECT event_id, user_id,
                   date_diff('microsecond',
                             LAG(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                             ts) AS gap_us
            FROM events
        """,
        "running_total": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value*100, 0) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS running_cents
            FROM events
        """,
        "retention": """
            WITH d AS (
              SELECT DISTINCT user_id,
                     CAST(date_trunc('day', ts) AS DATE) AS day
              FROM events),
            c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1)
            SELECT c.cohort,
                   CAST(date_diff('day', c.cohort, d.day) AS BIGINT)
                       AS offset_days,
                   count(*) AS n_users
            FROM d JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "event_pivot": "SELECT user_id, "
        + ", ".join(
            f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
            for t in EVENT_TYPES
        )
        + ", count(*) AS n_total FROM events GROUP BY user_id",
        "covar": """
            WITH f AS (
              SELECT l_returnflag,
                     CAST(round(l_quantity, 0) AS BIGINT) AS x,
                     CAST(round(l_discount*100, 0) AS BIGINT) AS y
              FROM lineitem),
            s AS (
              SELECT l_returnflag, count(*) AS n,
                     sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
                     sum(x*x) AS sxx, sum(y*y) AS syy
              FROM f GROUP BY 1)
            SELECT l_returnflag, n,
                   CAST(n*sxy - sx*sy AS DOUBLE)
                     / CAST(n*n AS DOUBLE) AS covar_pop,
                   CAST(n*sxy - sx*sy AS DOUBLE)
                     / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                            * CAST(n*syy - sy*sy AS DOUBLE)) AS corr
            FROM s ORDER BY l_returnflag
        """,
        "top_event_type": """
            SELECT user_id, top_type, n_occ FROM (
              SELECT user_id, event_type AS top_type,
                     count(*) AS n_occ,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type) AS rn
              FROM events GROUP BY 1, 2)
            WHERE rn = 1
        """,
        "sample": f"""
            SELECT doc_id, lang, n_chars FROM documents
            WHERE (doc_id * 48271 + 11) % 100 < {SAMPLE_KEEP}
        """,
        "topk_user": f"""
            SELECT user_id, value_cents, event_id, rank FROM (
              SELECT user_id,
                CAST(round(value*100, 0) AS BIGINT) AS value_cents,
                event_id,
                row_number() OVER (
                  PARTITION BY user_id
                  ORDER BY CAST(round(value*100, 0) AS BIGINT) DESC,
                           event_id) AS rank
              FROM events)
            WHERE rank <= {TOPK_K}
        """,
        "stratified_sample": f"""
            SELECT lang, neg_hash, doc_id, rank FROM (
              SELECT lang,
                -((doc_id * 48271 + 11) % {STRAT_MOD}) AS neg_hash,
                doc_id,
                row_number() OVER (
                  PARTITION BY lang
                  ORDER BY -((doc_id * 48271 + 11) % {STRAT_MOD}) DESC,
                           doc_id) AS rank
              FROM documents)
            WHERE rank <= {STRAT_K}
        """,
        "distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "percentiles": """
            SELECT event_type, count(*) AS n,
                   quantile_disc(value_cents, 0.5) AS p50,
                   quantile_disc(value_cents, 0.9) AS p90,
                   quantile_disc(value_cents, 0.99) AS p99
            FROM (SELECT event_type,
                    CAST(round(value*100, 0) AS BIGINT) AS value_cents
                  FROM events)
            GROUP BY event_type
        """,
        # normalize_text: identical mess derivation (upper, doubled
        # first space, pad+tab) then lower + RE2 '\s+' collapse + trim
        # — non-'g' regexp_replace is first-match-only on BOTH sides
        # (pc.replace_substring max_replacements=1)
        "normalize_text": r"""
            SELECT doc_id,
              trim(regexp_replace(
                lower(' ' || regexp_replace(upper(text), ' ', '  ')
                      || ' ' || chr(9)),
                '\s+', ' ', 'g')) AS norm_text
            FROM documents
        """,
        # funnel: chained min-ts subqueries — step k+1 strictly after
        # the matched step-k time, exactly the engine's greedy
        # earliest-first semantics
        "funnel": f"""
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(ts) AS t FROM events
                   WHERE event_type = '{FUNNEL_STEPS[0]}'
                   GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
                   WHERE e.event_type = '{FUNNEL_STEPS[1]}'
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
                   WHERE e.event_type = '{FUNNEL_STEPS[2]}'
                   GROUP BY e.user_id)
            SELECT u.user_id,
              CAST(CASE WHEN s3.t IS NOT NULL THEN 3
                        WHEN s2.t IS NOT NULL THEN 2
                        WHEN s1.t IS NOT NULL THEN 1
                        ELSE 0 END AS BIGINT) AS steps_completed
            FROM u
            LEFT JOIN s1 ON s1.user_id = u.user_id
            LEFT JOIN s2 ON s2.user_id = u.user_id
            LEFT JOIN s3 ON s3.user_id = u.user_id
        """,
        "sessions": """
            WITH ordered AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 30*60*1000000
                     THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            tagged AS (
              SELECT user_id, ts,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
              FROM ordered)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM tagged GROUP BY user_id, session_id
        """,
        "rolling_window": """
            SELECT event_id, user_id, ts,
              count(*) OVER w AS n_win,
              CAST(sum(event_id) OVER w AS BIGINT) AS eid_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        """,
        "asof_join": """
            WITH u AS (
              SELECT event_id, user_id, ts, value,
                     event_id % 2 AS is_trade
              FROM events),
            m AS (SELECT *,
              last_value(CASE WHEN is_trade=0 THEN event_id END
                         IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS quote_id,
              last_value(CASE WHEN is_trade=0 THEN value END
                         IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS quote_value
             FROM u)
            SELECT event_id AS trade_id, user_id, ts,
                   quote_id, quote_value
            FROM m WHERE is_trade = 1
        """,
        "snapshot_diff": """
            WITH l AS (SELECT event_id,
                              CAST(round(value*100, 0) AS BIGINT) AS vc
                       FROM events),
            r AS (SELECT event_id,
                         vc + CASE WHEN event_id % 31 = 0
                                   THEN 1 ELSE 0 END AS vc
                  FROM l WHERE event_id % 97 <> 0
                  UNION ALL
                  SELECT 1000000000 + doc_id, doc_id * 7 + 5
                  FROM documents WHERE doc_id % 11 = 0),
            j AS (SELECT l.event_id AS lid, r.event_id AS rid,
                         l.vc AS lv, r.vc AS rv
                  FROM l FULL OUTER JOIN r ON l.event_id = r.event_id)
            SELECT status, count(*) AS n,
                   CAST(sum(id) AS BIGINT) AS id_sum
            FROM (SELECT CASE WHEN lid IS NULL THEN 'added'
                              WHEN rid IS NULL THEN 'removed'
                              WHEN lv <> rv THEN 'changed'
                              ELSE 'same' END AS status,
                         COALESCE(lid, rid) AS id
                  FROM j)
            WHERE status <> 'same'
            GROUP BY status ORDER BY status
        """,
        "trajectory": """
            WITH p AS (SELECT user_id, ts, event_id,
                              (event_id * 48271 + 11) % 4096 AS x,
                              (event_id * 69621 + 23) % 4096 AS y
                       FROM events),
            s AS (SELECT user_id,
                         lead(x) OVER w - x AS dx,
                         lead(y) OVER w - y AS dy
                  FROM p
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts, event_id)),
            d AS (SELECT user_id, dx*dx + dy*dy AS d2 FROM s
                  WHERE dx IS NOT NULL)
            SELECT user_id,
                   count(*) AS n_steps,
                   CAST(sum(d2) AS BIGINT) AS total_d2,
                   CAST(max(d2) AS BIGINT) AS max_d2
            FROM d GROUP BY user_id ORDER BY user_id
        """,
        "transitions": """
            WITH s AS (SELECT event_type,
                              lead(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
                       FROM events)
            SELECT event_type AS src, nxt AS dst, count(*) AS n
            FROM s WHERE nxt IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "asof_forward": """
            WITH u AS (
              SELECT event_id, user_id, ts, value,
                     event_id % 2 AS is_trade
              FROM events),
            m AS (SELECT *,
              first_value(CASE WHEN is_trade=0 THEN event_id END
                          IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade DESC, event_id
                      ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING)
                AS quote_id,
              first_value(CASE WHEN is_trade=0 THEN value END
                          IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade DESC, event_id
                      ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING)
                AS quote_value
             FROM u)
            SELECT event_id AS trade_id, user_id, ts,
                   quote_id, quote_value
            FROM m WHERE is_trade = 1
        """,
        "sssp": f"""
            WITH RECURSIVE
            nn AS (SELECT CAST(count(*) AS BIGINT) // {SSSP_LEVELS}
                     AS nb FROM documents),
            e AS (SELECT d.doc_id AS src,
                         (d.doc_id % {SSSP_LEVELS}) + 1
                           + {SSSP_LEVELS} * ((d.doc_id*{AX}
                               + j.j*{SSSP_C} + {BX})
                               % (SELECT nb FROM nn)) AS dst,
                         1 + (d.doc_id*7 + j.j*13) % {SSSP_WMOD} AS w
                  FROM documents d,
                       (SELECT unnest(range({SSSP_DEG})) AS j) j
                  WHERE d.doc_id % {SSSP_LEVELS} < {SSSP_LEVELS - 1}),
            walk(node, dist) AS (
                SELECT doc_id, CAST(0 AS BIGINT) FROM documents
                WHERE doc_id % {SSSP_SRC_MOD} = 0
                UNION ALL
                SELECT e.dst, walk.dist + e.w
                FROM walk JOIN e ON e.src = walk.node
            )
            SELECT node, min(dist) AS dist FROM walk GROUP BY node
        """,
        "coverage": f"""
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s,
                     epoch_us(ts) + (1 + event_id % {IVJ_DUR_MOD})
                         * {IVJ_DUR_UNIT} AS e
              FROM events),
            ev AS (
              SELECT user_id, s AS t, 0 AS d, 1 AS delta FROM iv
              UNION ALL
              SELECT user_id, e, 1, -1 FROM iv),
            w AS (SELECT *,
              CAST(sum(delta) OVER (PARTITION BY user_id
                    ORDER BY t, d ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS active,
              lead(t) OVER (PARTITION BY user_id ORDER BY t, d)
                AS t_next
              FROM ev)
            SELECT user_id,
                   CAST(sum(CASE WHEN active > 0
                                  AND t_next IS NOT NULL
                            THEN t_next - t ELSE 0 END) AS BIGINT)
                     AS covered,
                   CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_intervals,
                   CAST(sum(CASE WHEN delta = 1 AND active = 1
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_components
            FROM w GROUP BY user_id
        """,
        # information-theory family: q(v) = floor(ln(v)·2^30) is
        # bit-exact between libm and DuckDB (the ×2^30 multiply is an
        # exponent shift — no rounding — so both floor the identical
        # double; `round` would diverge on half-way ties, 6 in 1..4.19M)
        "type_entropy": """
            WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
                       FROM events GROUP BY 1, 2),
            g AS (SELECT user_id, CAST(SUM(cnt) AS HUGEINT) AS n,
                         SUM(CAST(cnt AS HUGEINT) *
                             CAST(floor(ln(CAST(cnt AS DOUBLE))
                                        * 1073741824.0) AS HUGEINT))
                           AS sq
                  FROM c GROUP BY 1)
            SELECT user_id, CAST(n AS BIGINT) AS n,
                   CAST(n * CAST(floor(ln(CAST(n AS DOUBLE))
                                       * 1073741824.0) AS HUGEINT)
                        - sq AS DOUBLE)
                     / CAST(n * 1073741824 AS DOUBLE) AS entropy
            FROM g ORDER BY user_id
        """,
        "flag_mi": """
            WITH c AS (SELECT CAST(EXTRACT(year FROM l_shipdate)
                                   AS BIGINT) AS l_year,
                              l_returnflag, l_linestatus,
                              COUNT(*) AS cnt
                       FROM lineitem GROUP BY 1, 2, 3),
            m AS (SELECT l_year, cnt,
                         SUM(cnt) OVER (PARTITION BY l_year) AS n,
                         SUM(cnt) OVER (PARTITION BY l_year,
                                        l_returnflag) AS cx,
                         SUM(cnt) OVER (PARTITION BY l_year,
                                        l_linestatus) AS cy
                  FROM c)
            SELECT l_year, CAST(MAX(n) AS BIGINT) AS n,
                   CAST(SUM(CAST(cnt AS HUGEINT) * (
                        CAST(floor(ln(CAST(cnt AS DOUBLE))
                                   * 1073741824.0) AS HUGEINT)
                      + CAST(floor(ln(CAST(n AS DOUBLE))
                                   * 1073741824.0) AS HUGEINT)
                      - CAST(floor(ln(CAST(cx AS DOUBLE))
                                   * 1073741824.0) AS HUGEINT)
                      - CAST(floor(ln(CAST(cy AS DOUBLE))
                                   * 1073741824.0) AS HUGEINT)))
                        AS DOUBLE)
                     / CAST(MAX(n) * 1073741824 AS DOUBLE) AS mi
            FROM m GROUP BY l_year ORDER BY l_year
        """,
        "lang_chi2": f"""
            WITH b AS (SELECT source, lang,
                              n_chars // {CHI2_LEN_BUCKET} AS len_bucket
                       FROM documents),
            c AS (SELECT source, lang, len_bucket, COUNT(*) AS cnt
                  FROM b GROUP BY 1, 2, 3),
            m AS (SELECT source, cnt,
                         SUM(cnt) OVER (PARTITION BY source) AS n,
                         SUM(cnt) OVER (PARTITION BY source, lang)
                           AS cx,
                         SUM(cnt) OVER (PARTITION BY source,
                                        len_bucket) AS cy
                  FROM c),
            agg AS (SELECT source, CAST(MAX(n) AS BIGINT) AS n,
                           SUM((1073741824 * CAST(n AS HUGEINT)
                                * cnt * cnt) // (cx * cy)) AS tsum
                    FROM m GROUP BY source),
            rs AS (SELECT source,
                          CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
                          CAST(COUNT(DISTINCT len_bucket) AS BIGINT)
                            AS s
                   FROM b GROUP BY source)
            SELECT agg.source, n, r, s,
                   CAST(tsum - CAST(n AS HUGEINT) * 1073741824
                        AS DOUBLE) / 1073741824.0 AS chi2,
                   CASE WHEN least(r - 1, s - 1) >= 1
                        THEN sqrt((CAST(tsum - CAST(n AS HUGEINT)
                                        * 1073741824 AS DOUBLE)
                                   / 1073741824.0)
                                  / CAST(n * least(r - 1, s - 1)
                                         AS DOUBLE))
                        ELSE NULL END AS cramers_v
            FROM agg JOIN rs USING (source) ORDER BY agg.source
        """,
        "asof_nearest": """
            WITH u AS (
              SELECT event_id, user_id, ts, value,
                     event_id % 2 AS is_trade
              FROM events),
            m AS (SELECT *,
              last_value(CASE WHEN is_trade=0 THEN event_id END
                         IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS b_id,
              last_value(CASE WHEN is_trade=0 THEN ts END
                         IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS b_ts,
              last_value(CASE WHEN is_trade=0 THEN value END
                         IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS b_val,
              first_value(CASE WHEN is_trade=0 THEN event_id END
                          IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade DESC, event_id
                      ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) AS f_id,
              first_value(CASE WHEN is_trade=0 THEN ts END
                          IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade DESC, event_id
                      ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) AS f_ts,
              first_value(CASE WHEN is_trade=0 THEN value END
                          IGNORE NULLS)
                OVER (PARTITION BY user_id
                      ORDER BY ts, is_trade DESC, event_id
                      ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) AS f_val
             FROM u)
            SELECT event_id AS trade_id, user_id, ts,
                   CASE WHEN b_id IS NULL THEN f_id
                        WHEN f_id IS NULL THEN b_id
                        WHEN (epoch_us(f_ts) - epoch_us(ts))
                           < (epoch_us(ts) - epoch_us(b_ts))
                        THEN f_id ELSE b_id END AS quote_id,
                   CASE WHEN b_id IS NULL THEN f_val
                        WHEN f_id IS NULL THEN b_val
                        WHEN (epoch_us(f_ts) - epoch_us(ts))
                           < (epoch_us(ts) - epoch_us(b_ts))
                        THEN f_val ELSE b_val END AS quote_value
            FROM m WHERE is_trade = 1
        """,
        "range_join": """
            SELECT a.event_id AS anchor_id, count(*) AS n_win,
                   CAST(sum(e.event_id) AS BIGINT) AS eid_sum
            FROM (SELECT * FROM events WHERE event_id % 17 = 0) a
            JOIN events e
              ON e.ts >= a.ts AND e.ts < a.ts + INTERVAL 1 HOUR
            GROUP BY a.event_id
        """,
        "knn_xl": f"""
            WITH pts AS (
              SELECT event_id,
                CAST(((event_id*{AX}+{BX})%{EXTENT}) AS DOUBLE)+0.5 AS x,
                CAST(((event_id*{AY}+{BY})%{EXTENT}) AS DOUBLE)+0.5 AS y
              FROM events),
            pairs AS (
              SELECT s.event_id, t.event_id AS neighbor_id,
                (s.x-t.x)*(s.x-t.x)+(s.y-t.y)*(s.y-t.y) AS d2
              FROM pts s JOIN pts t ON s.event_id <> t.event_id
              WHERE s.event_id % 100 = 0),
            ranked AS (
              SELECT event_id, neighbor_id,
                row_number() OVER (PARTITION BY event_id
                                   ORDER BY d2, neighbor_id) AS rank
              FROM pairs)
            SELECT event_id, neighbor_id, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= {KNN_K}
        """,
        "knn": f"""
            WITH pts AS (
              SELECT doc_id,
                CAST(((doc_id*{AX}+{BX})%{EXTENT}) AS DOUBLE)+0.5 AS x,
                CAST(((doc_id*{AY}+{BY})%{EXTENT}) AS DOUBLE)+0.5 AS y
              FROM documents),
            pairs AS (
              SELECT s.doc_id, t.doc_id AS neighbor_id,
                (s.x-t.x)*(s.x-t.x)+(s.y-t.y)*(s.y-t.y) AS d2
              FROM pts s JOIN pts t ON s.doc_id <> t.doc_id),
            ranked AS (
              SELECT doc_id, neighbor_id,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY d2, neighbor_id) AS rank
              FROM pairs)
            SELECT doc_id, neighbor_id, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= {KNN_K}
        """,
        "rasterize": f"""
            WITH cells AS (
              SELECT CAST(i % 16 AS BIGINT) AS cx,
                     CAST(i // 16 AS BIGINT) AS cy,
                     CAST((i % 16) * {EXTENT // 16} AS DOUBLE) AS x0,
                     CAST((i // 16) * {EXTENT // 16} AS DOUBLE) AS y0
              FROM range(256) t(i)),
            dist AS (SELECT * FROM {districts_sql(N_DISTRICTS)} )
            SELECT d.district_id, c.cx, c.cy,
              greatest(0.0, least(c.x0 + {EXTENT // 16}, d.maxx) - greatest(c.x0, d.minx))
              * greatest(0.0, least(c.y0 + {EXTENT // 16}, d.maxy) - greatest(c.y0, d.miny))
                AS coverage_area
            FROM cells c JOIN dist d
              ON c.x0 < d.maxx AND c.x0 + {EXTENT // 16} > d.minx
             AND c.y0 < d.maxy AND c.y0 + {EXTENT // 16} > d.miny
            WHERE greatest(0.0, least(c.x0 + {EXTENT // 16}, d.maxx) - greatest(c.x0, d.minx))
              * greatest(0.0, least(c.y0 + {EXTENT // 16}, d.maxy) - greatest(c.y0, d.miny)) > 0
        """,
        "zonal": f"""
            WITH cells AS (
              SELECT CAST(i % 16 AS BIGINT) AS cx,
                     CAST(i // 16 AS BIGINT) AS cy,
                     CAST((i % 16) * {EXTENT // 16} AS DOUBLE) AS x0,
                     CAST((i // 16) * {EXTENT // 16} AS DOUBLE) AS y0
              FROM range(256) t(i)),
            dist AS (SELECT * FROM {districts_sql(N_DISTRICTS)} ),
            ras AS (
              SELECT d.district_id,
                CAST(
                  greatest(0.0, least(c.x0 + {EXTENT // 16}, d.maxx)
                                - greatest(c.x0, d.minx))
                  * greatest(0.0, least(c.y0 + {EXTENT // 16}, d.maxy)
                                  - greatest(c.y0, d.miny))
                  * CAST((c.cx*7 + c.cy*13) % 100 AS DOUBLE)
                  AS BIGINT) AS zv,
                greatest(0.0, least(c.x0 + {EXTENT // 16}, d.maxx)
                              - greatest(c.x0, d.minx))
                * greatest(0.0, least(c.y0 + {EXTENT // 16}, d.maxy)
                                - greatest(c.y0, d.miny)) AS cov
              FROM cells c JOIN dist d
                ON c.x0 < d.maxx AND c.x0 + {EXTENT // 16} > d.minx
               AND c.y0 < d.maxy AND c.y0 + {EXTENT // 16} > d.miny
              WHERE greatest(0.0, least(c.x0 + {EXTENT // 16}, d.maxx)
                                  - greatest(c.x0, d.minx))
                * greatest(0.0, least(c.y0 + {EXTENT // 16}, d.maxy)
                                - greatest(c.y0, d.miny)) > 0)
            SELECT district_id,
                   CAST(sum(zv) AS BIGINT) AS zonal_value,
                   count(*) AS n_cells
            FROM ras GROUP BY 1 ORDER BY 1
        """,
        "token_count": r"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
            FROM documents
        """,
        "quality": r"""
            WITH t AS (
              SELECT doc_id,
                CAST(length(text) AS BIGINT) AS n_chars,
                regexp_split_to_array(trim(text), '\s+') AS toks,
                CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
                  AS n_nospace
              FROM documents)
            SELECT doc_id, n_chars,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(n_nospace AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                     AS mean_token_len,
                   CAST(len(list_filter(toks, x -> lower(x) IN
                     ('the','and','of','to','in','is','that','it','for','was')))
                     AS DOUBLE)
                   / CAST(greatest(len(toks), 1) AS DOUBLE) AS stopword_ratio
            FROM t
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        # decontaminate: exact word-3-shingle semi-join of the corpus
        # (doc_id % 89 != 0) against the benchmark slice (% 89 == 0) —
        # same single-space split + chr(1) shingle join as near_dup.
        # The engine's hash probe is a prefilter only; the exact
        # string confirm makes this string-join-identical.
        "cust_no_urgent": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (
              SELECT o_custkey FROM orders
              WHERE o_orderpriority = '1-URGENT')
        """,
        "supplier_rank": """
            SELECT s_nationkey, s_acctbal, s_suppkey,
                   dense_rank() OVER (PARTITION BY s_nationkey
                                      ORDER BY s_acctbal DESC) AS bal_rank
            FROM supplier
        """,
        "order_concat": """
            SELECT o_custkey,
                   string_agg(o_orderpriority, ','
                              ORDER BY o_orderkey) AS priorities,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey
        """,
        "custdist": """
            WITH per_cust AS (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
            SELECT c_count, count(*) AS custdist
            FROM per_cust GROUP BY c_count
        """,
        "nearest_district": f"""
            WITH c AS (
              SELECT doc_id, district_id,
                (({_points_expr()[0]}) - (minx + maxx) / 2)
                  * (({_points_expr()[0]}) - (minx + maxx) / 2)
                + (({_points_expr()[1]}) - (miny + maxy) / 2)
                  * (({_points_expr()[1]}) - (miny + maxy) / 2) AS d2
              FROM documents, {dist})
            SELECT doc_id, district_id, d2 FROM (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY d2, district_id) AS rn FROM c)
            WHERE rn = 1
        """,
        "pagerank": _pagerank_sql(),
        "image_assign": f"""
            WITH {_image_pts_cte()}
            SELECT district_id, count(*) AS n_images
            FROM ipts, {dist}
            WHERE x >= minx AND x < maxx AND y >= miny AND y < maxy
            GROUP BY district_id
        """,
        "image_cells": f"""
            WITH {_image_pts_cte()}
            SELECT CAST(floor(x / {EXTENT // 16}) AS BIGINT) AS cx,
                   CAST(floor(y / {EXTENT // 16}) AS BIGINT) AS cy,
                   count(*) AS n_images
            FROM ipts GROUP BY 1, 2
        """,
        "props_extract": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   count(json_extract(props, '$.k')) AS n_with_k,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "district_bbox": f"""
            WITH {_image_pts_cte()}
            SELECT district_id,
                   min(x) AS min_x, min(y) AS min_y,
                   max(x) AS max_x, max(y) AS max_y,
                   count(*) AS n_images
            FROM ipts, {dist}
            WHERE x >= minx AND x < maxx AND y >= miny AND y < maxy
            GROUP BY district_id
        """,
        "event_tiles": """
            SELECT user_id, ts, event_id,
                   CAST(ntile(4) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS BIGINT)
                       AS tile
            FROM events
        """,
        "latest_event": """
            SELECT user_id, ts, event_id, event_type, value
            FROM (SELECT user_id, ts, event_id, event_type, value,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY ts DESC,
                                                     event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "first_order": """
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
            FROM (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                         row_number() OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate,
                                                     o_orderkey) AS rn
                  FROM orders)
            WHERE rn = 1
        """,
        "points_within": f"""
            WITH p AS (
              SELECT doc_id, CAST({_points_expr()[0]} AS DOUBLE) AS x,
                     CAST({_points_expr()[1]} AS DOUBLE) AS y
              FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
            FROM p a, p b
            WHERE a.doc_id < b.doc_id
              AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
                  <= {DWITHIN_R * DWITHIN_R}
        """,
        "hull_diameter": f"""
            WITH p AS (
              SELECT doc_id % {HULL_G} AS grp, doc_id AS id,
                     (doc_id * {AX} + {BX}) % {EXTENT} AS x,
                     (doc_id * {AY} + {BY}) % {EXTENT} AS y
              FROM documents),
            pr AS (
              SELECT a.grp AS grp, a.id AS ia, b.id AS ib,
                     (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
              FROM p a JOIN p b ON a.grp = b.grp AND a.id < b.id),
            mx AS (SELECT grp, max(d2) AS diam2 FROM pr GROUP BY grp)
            SELECT grp, diam2, id_a, id_b FROM (
              SELECT pr.grp, mx.diam2, pr.ia AS id_a, pr.ib AS id_b,
                     row_number() OVER (PARTITION BY pr.grp
                                        ORDER BY pr.ia, pr.ib) AS rn
              FROM pr JOIN mx ON pr.grp = mx.grp AND pr.d2 = mx.diam2)
            WHERE rn = 1
        """,
        "pareto": f"""
            WITH p AS (
              SELECT o_orderkey AS id,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT) AS d1,
                     (o_orderkey * {AX} + {BX}) % {EXTENT} AS d2
              FROM orders),
            w AS (
              SELECT id, d1, d2,
                     max(d2) OVER (PARTITION BY d1) AS gmax,
                     max(d2) OVER (ORDER BY d1 DESC
                                   RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS run
              FROM p)
            SELECT id, d1, d2 FROM w
            WHERE d2 = gmax AND (run IS NULL OR d2 > run)
            ORDER BY d1 DESC, d2 DESC, id
        """,
        "audio_energy": f"""
            WITH spec AS (
              SELECT doc_id AS id,
                     {_AUD_BASE} + (doc_id % {_AUD_MOD}) * {_AUD_STEP}
                         AS n
              FROM documents),
            s AS (
              SELECT id, i,
                     (id * {_AXA} + i * {_CA} + {_BA}) % 65536 - 32768
                         AS v
              FROM (SELECT id, unnest(range(0, n)) AS i FROM spec)),
            p AS (
              SELECT id, i, v,
                     lag(v) OVER (PARTITION BY id ORDER BY i) AS pv
              FROM s)
            SELECT id AS audio_id, i // {AUDIO_FRAME} AS frame,
                   CAST(sum(v * v) AS BIGINT) AS energy,
                   CAST(sum(CASE WHEN pv IS NOT NULL AND pv * v < 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS crossings
            FROM p GROUP BY id, i // {AUDIO_FRAME}
        """,
        "audio_resample": f"""
            WITH spec AS (
              SELECT doc_id AS id,
                     ({_AUD_BASE} + (doc_id % {_AUD_MOD}) * {_AUD_STEP})
                         // {AUDIO_DECIM} AS m
              FROM documents),
            d AS (
              SELECT id, j,
                     (id * {_AXA} + (j * {AUDIO_DECIM}) * {_CA} + {_BA})
                         % 65536 - 32768 AS v
              FROM (SELECT id, unnest(range(0, m)) AS j FROM spec))
            SELECT id AS audio_id, CAST(count(*) AS BIGINT) AS n_out,
                   CAST(sum((j + 1) * v) AS BIGINT) AS psum
            FROM d GROUP BY id
        """,
        "ohlc": """
            WITH b AS (
              SELECT event_type, date_trunc('hour', ts) AS hour,
                     ts, event_id, value
              FROM events),
            w AS (
              SELECT *,
                row_number() OVER (PARTITION BY event_type, hour
                                   ORDER BY ts, event_id) AS ra,
                row_number() OVER (PARTITION BY event_type, hour
                                   ORDER BY ts DESC, event_id DESC) AS rd
              FROM b)
            SELECT event_type, hour,
                   max(CASE WHEN ra = 1 THEN value END) AS open,
                   max(value) AS high,
                   min(value) AS low,
                   max(CASE WHEN rd = 1 THEN value END) AS close,
                   CAST(count(*) AS BIGINT) AS n
            FROM w GROUP BY event_type, hour
        """,
        "twap": """
            WITH b AS (
              SELECT user_id, epoch_us(ts) AS t, event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
            w AS (
              SELECT user_id, cents, t,
                     lead(t) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id) AS nt
              FROM b)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN nt IS NOT NULL
                                 THEN cents * (nt - t) ELSE 0 END)
                        AS BIGINT) AS num,
                   CAST(max(t) - min(t) AS BIGINT) AS span_us,
                   CASE WHEN max(t) > min(t) THEN
                     CAST(sum(CASE WHEN nt IS NOT NULL
                                   THEN cents * (nt - t) ELSE 0 END)
                          AS DOUBLE)
                     / CAST(max(t) - min(t) AS DOUBLE)
                   END AS twap
            FROM w GROUP BY user_id
        """,
        "embed_dims": """
            SELECT dim, min(v) AS vmin, max(v) AS vmax
            FROM (SELECT unnest(embedding) AS v,
                         CAST(generate_subscripts(embedding, 1)
                              AS BIGINT) AS dim
                  FROM embeddings)
            GROUP BY dim
        """,
        "skewkurt": """
            WITH m AS (
              SELECT l_returnflag,
                     CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS s1,
                     CAST(sum(x * x) AS HUGEINT) AS s2,
                     CAST(sum(x * x * x) AS HUGEINT) AS s3,
                     CAST(sum(x * x * x * x) AS HUGEINT) AS s4
              FROM (SELECT l_returnflag,
                           CAST(round(l_quantity) AS BIGINT) AS x
                    FROM lineitem)
              GROUP BY l_returnflag),
            i AS (
              SELECT l_returnflag, n,
                     n * s2 - s1 * s1 AS d2,
                     n * n * s3 - 3 * n * s1 * s2
                         + 2 * s1 * s1 * s1 AS n3,
                     n * n * n * s4 - 4 * n * n * s1 * s3
                         + 6 * n * s1 * s1 * s2
                         - 3 * s1 * s1 * s1 * s1 AS n4
              FROM m)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   CAST(n3 AS DOUBLE)
                       / (CAST(d2 AS DOUBLE)
                          * sqrt(CAST(d2 AS DOUBLE))) AS skew_pop,
                   CAST(n4 AS DOUBLE) / CAST(d2 * d2 AS DOUBLE)
                       AS kurt_pop
            FROM i
        """,
        "simplify": f"""
            WITH h AS ({_BUMP_H_CTE})
            SELECT doc_id,
                   4 + CAST(h1 >= 3 AS BIGINT) + CAST(h2 >= 3 AS BIGINT)
                     + CAST(h3 >= 3 AS BIGINT) + CAST(h4 >= 3 AS BIGINT)
                       AS n_verts,
                   {SIMP_S * SIMP_S}
                     + {SIMP_S // 2} * (
                         (CASE WHEN h1 >= 3 THEN h1 ELSE 0 END)
                       + (CASE WHEN h2 >= 3 THEN h2 ELSE 0 END)
                       + (CASE WHEN h3 >= 3 THEN h3 ELSE 0 END)
                       + (CASE WHEN h4 >= 3 THEN h4 ELSE 0 END)) AS area
            FROM h
        """,
        "compactness": _compactness_sql(),
        "dissolve": f"""
            WITH r AS (
              SELECT doc_id % {DISSOLVE_G} AS district,
                     doc_id // {DISSOLVE_G} AS rnk,
                     (doc_id*7+3) % 5 + 4 AS h,
                     CASE ((doc_id*11+1) % 4)
                       WHEN 0 THEN -2 WHEN 1 THEN 1
                       WHEN 2 THEN 2 ELSE 3 END AS ext,
                     n_chars
              FROM documents),
            base AS (
              SELECT district,
                     sum(({DISSOLVE_D} + ext) * h) AS tot,
                     count(*) AS n,
                     sum(n_chars) AS sc
              FROM r GROUP BY district),
            pairs AS (
              SELECT a.district,
                     sum(CASE WHEN a.ext > 0
                              THEN a.ext * least(a.h, b.h)
                              ELSE 0 END) AS ov,
                     sum(CASE WHEN a.ext > 0 THEN 1 ELSE 0 END)
                       AS merges
              FROM r a JOIN r b
                ON a.district = b.district AND b.rnk = a.rnk + 1
              GROUP BY a.district)
            SELECT base.district,
                   CAST(tot - COALESCE(ov, 0) AS DOUBLE) AS union_area,
                   CAST(n - COALESCE(merges, 0) AS BIGINT) AS n_polys,
                   CAST(0 AS BIGINT) AS n_holes,
                   CAST(sc AS DOUBLE) AS sum_n_chars
            FROM base LEFT JOIN pairs
              ON base.district = pairs.district
            ORDER BY base.district
        """,
        "trade_volume": """
            SELECT s_nationkey, c_nationkey,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(round(l_extendedprice*100, 0)
                                 AS BIGINT)
                            * (100 - CAST(round(l_discount*100, 0)
                                          AS BIGINT)))
                        AS DOUBLE) AS revenue_u,
                   COUNT(*) AS n
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "erase": """
            WITH r AS (SELECT doc_id,
                              (doc_id*7+3) % 5 + 4 AS h,
                              8 + CASE ((doc_id*11+1) % 4)
                                    WHEN 0 THEN -2 WHEN 1 THEN 1
                                    WHEN 2 THEN 2 ELSE 3 END AS w
                       FROM documents)
            SELECT doc_id,
                   CAST(w * (3 + greatest(h - 5, 0)) AS DOUBLE)
                     AS area,
                   CAST(1 + CASE WHEN h > 5 THEN 1 ELSE 0 END
                        AS BIGINT) AS n_polys
            FROM r ORDER BY doc_id
        """,
        "small_qty": f"""
            WITH bp AS (SELECT p_partkey FROM part
                        WHERE p_brand = '{Q17_BRAND}'),
            s AS (SELECT l_partkey,
                         SUM(CAST(l_quantity AS BIGINT)) AS sq,
                         COUNT(*) AS cnt
                  FROM lineitem JOIN bp ON l_partkey = p_partkey
                  GROUP BY l_partkey)
            SELECT CAST(COALESCE(SUM(CAST(round(l_extendedprice*100, 0)
                                          AS BIGINT)), 0) AS DOUBLE)
                     / 700.0 AS avg_yearly,
                   COUNT(*) AS n_small
            FROM lineitem JOIN s ON lineitem.l_partkey = s.l_partkey
            WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sq
        """,
        "idle_customers": f"""
            WITH c AS (SELECT c_custkey, c_nationkey,
                              CAST(round(c_acctbal*100, 0) AS BIGINT)
                                AS cents
                       FROM customer),
            pos AS (SELECT SUM(cents) AS s, COUNT(*) AS n FROM c
                    WHERE cents > 0),
            rich AS (SELECT c.* FROM c, pos
                     WHERE cents > 0 AND cents * n > s)
            SELECT c_nationkey,
                   CAST(SUM(cents) AS BIGINT) AS totacctbal_cents,
                   COUNT(*) AS numcust
            FROM rich
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = rich.c_custkey
                                AND o_totalprice > {Q22_JUMBO})
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "heavy_hitters": f"""
            WITH u AS (SELECT unnest(string_split(text, ' ')) AS w
                       FROM documents),
            n AS (SELECT count(*) AS n FROM u)
            SELECT w AS value, count(*) AS n_occ
            FROM u, n GROUP BY w, n.n
            HAVING count(*) * {HH_K + 1} > n.n
            ORDER BY w
        """,
        "unpivot": """
            SELECT l_orderkey, l_linenumber,
                   'l_quantity' AS metric, l_quantity AS value
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber,
                   'l_discount' AS metric, l_discount AS value
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber,
                   'l_tax' AS metric, l_tax AS value
            FROM lineitem
        """,
        "tile_pyramid": f"""
            WITH {_image_pts_cte()},
            ixy AS (SELECT CAST(x - 0.5 AS BIGINT) AS xi,
                           CAST(y - 0.5 AS BIGINT) AS yi FROM ipts)
            SELECT CAST(0 AS BIGINT) AS zoom,
                   (xi * 1) // 1048576 AS tx,
                   (yi * 1) // 1048576 AS ty,
                   count(*) AS n
            FROM ixy GROUP BY 2, 3
            UNION ALL
            SELECT 1 AS zoom,
                   (xi * 2) // 1048576 AS tx,
                   (yi * 2) // 1048576 AS ty,
                   count(*) AS n
            FROM ixy GROUP BY 2, 3
            UNION ALL
            SELECT 2 AS zoom,
                   (xi * 4) // 1048576 AS tx,
                   (yi * 4) // 1048576 AS ty,
                   count(*) AS n
            FROM ixy GROUP BY 2, 3
            UNION ALL
            SELECT 3 AS zoom,
                   (xi * 8) // 1048576 AS tx,
                   (yi * 8) // 1048576 AS ty,
                   count(*) AS n
            FROM ixy GROUP BY 2, 3
            UNION ALL
            SELECT 4 AS zoom,
                   (xi * 16) // 1048576 AS tx,
                   (yi * 16) // 1048576 AS ty,
                   count(*) AS n
            FROM ixy GROUP BY 2, 3
            ORDER BY zoom, tx, ty
        """,
        "impurity": """
            WITH c AS (SELECT c_nationkey, c_mktsegment,
                              COUNT(*) AS cnt
                       FROM customer GROUP BY 1, 2),
            g AS (SELECT c_nationkey,
                         CAST(SUM(cnt) AS HUGEINT) AS n,
                         SUM(CAST(cnt AS HUGEINT) * cnt) AS ss
                  FROM c GROUP BY c_nationkey)
            SELECT c_nationkey,
                   CAST(n*n - ss AS DOUBLE) / CAST(n*n AS DOUBLE)
                     AS impurity,
                   CAST(n AS BIGINT) AS n
            FROM g ORDER BY c_nationkey
        """,
        "image_search": f"""
            WITH imgs AS (
              SELECT doc_id * {IMG_MULT} + k AS i,
                     CAST((CAST(doc_id * {IMG_MULT} + k AS HUGEINT)
                           * {0x9E3779B97F4A7C15})
                          % 9223372036854775808 AS BIGINT) AS p
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            qs AS (
              SELECT j, CAST((CAST(j * {IMG_SEARCH_STEP} + 3 AS HUGEINT)
                              * {0x9E3779B97F4A7C15})
                             % 9223372036854775808 AS BIGINT) AS qp
              FROM (SELECT unnest(range(0, {IMG_SEARCH_NQ})) AS j)),
            d AS (
              SELECT qs.j AS q,
                     'img' || lpad(CAST(imgs.i AS VARCHAR), 12, '0')
                         AS image_id,
                     CAST(bit_count(xor(imgs.p, qs.qp)) AS BIGINT) AS dist
              FROM imgs, qs),
            r AS (
              SELECT q, image_id, dist,
                row_number() OVER (PARTITION BY q
                                   ORDER BY dist, image_id) AS rnk
              FROM d)
            SELECT q, image_id, dist, rnk
            FROM r WHERE rnk <= {IMG_SEARCH_K}
        """,
        "brand_mode": """
            WITH c AS (
              SELECT p_type, p_brand, count(*) AS cnt
              FROM part GROUP BY 1, 2),
            r AS (
              SELECT p_type, p_brand, cnt,
                row_number() OVER (PARTITION BY p_type
                                   ORDER BY cnt DESC, p_brand) AS rn
              FROM c)
            SELECT p_type, p_brand, cnt FROM r WHERE rn = 1
        """,
        "trend": f"""
            WITH m AS (
              SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(x * y) AS HUGEINT) AS sxy,
                     CAST(sum(x * x) AS HUGEINT) AS sxx
              FROM (SELECT event_type,
                           epoch_us(ts) // {TREND_US_PER_HOUR} AS x,
                           CAST(round(value * 100, 0) AS BIGINT) AS y
                    FROM events)
              GROUP BY event_type)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
                   CAST(sy * sxx - sx * sxy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) AS icept
            FROM m
        """,
        "rolling_z": """
            WITH e AS (
              SELECT event_id, user_id, ts,
                     CAST(round(value * 100, 0) AS BIGINT) AS v
              FROM events),
            w AS (
              SELECT user_id, ts, event_id, v,
                     count(v) OVER win AS n,
                     sum(v) OVER win AS s,
                     sum(v * v) OVER win AS q
              FROM e
              WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING))
            SELECT user_id, ts, event_id, v,
                   CAST((v * 16 - s) * (v * 16 - s) AS BIGINT) AS dev2,
                   CAST(9 * (16 * q - s * s) AS BIGINT) AS bound
            FROM w
            WHERE n = 16
              AND (v * 16 - s) * (v * 16 - s) > 9 * (16 * q - s * s)
        """,
        "promo_revenue": """
            WITH r AS (
              SELECT CAST(round(l_extendedprice*100, 0) AS BIGINT)
                       * (100 - CAST(round(l_discount*100, 0)
                                      AS BIGINT)) AS rev_u,
                     p_type = 'PROMO' AS promo
              FROM lineitem JOIN part ON l_partkey = p_partkey)
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(CAST(sum(CASE WHEN promo THEN rev_u ELSE 0 END)
                             AS HUGEINT) AS DOUBLE) AS promo_u,
                   CAST(CAST(sum(rev_u) AS HUGEINT) AS DOUBLE) AS total_u,
                   100.0 * (
                     CAST(CAST(sum(CASE WHEN promo THEN rev_u ELSE 0 END)
                               AS HUGEINT) AS DOUBLE)
                     / CAST(CAST(sum(rev_u) AS HUGEINT) AS DOUBLE)
                   ) AS promo_pct
            FROM r
        """,
        "interval_pairs": f"""
            WITH iv AS (
              SELECT event_id AS id, epoch_us(ts) AS s,
                     epoch_us(ts) + (1 + event_id % {IVJ_DUR_MOD})
                         * {IVJ_DUR_UNIT} AS e
              FROM events)
            SELECT a.id AS id_a, b.id AS id_b,
                   least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
            FROM iv a, iv b
            WHERE a.id < b.id AND a.s < b.e AND b.s < a.e
        """,
        "label_centroids": f"""
            WITH e AS (
              SELECT label, i.i AS dim,
                CAST(floor(CAST(embedding[i.i] AS DOUBLE)
                           * {EMB_QSCALE}) AS BIGINT) AS q
              FROM embeddings,
                   (SELECT unnest(range(1, {EMB_DIM + 1})) AS i) i)
            SELECT label, dim, CAST(sum(q) AS BIGINT) AS sum_q,
                   count(*) AS n,
                   CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*)
                       AS centroid
            FROM e GROUP BY label, dim
        """,
        # centroid_sim: cosine of mean vectors == cosine of SUM
        # vectors (scale invariance), so the oracle works on the same
        # exact integer sums; dots in HUGEINT, then the fixed chain
        # CAST→sqrt→multiply→divide mirrors the engine's
        # float(d)/(sqrt(float(na))*sqrt(float(nb)))
        "centroid_sim": f"""
            WITH e AS (
              SELECT label, i.i AS dim,
                CAST(floor(CAST(embedding[i.i] AS DOUBLE)
                           * {EMB_QSCALE}) AS BIGINT) AS q
              FROM embeddings,
                   (SELECT unnest(range(1, {EMB_DIM + 1})) AS i) i),
            s AS (SELECT label, dim, CAST(sum(q) AS BIGINT) AS s
                  FROM e GROUP BY 1, 2),
            d AS (SELECT a.label AS label_a, b.label AS label_b,
                         SUM(CAST(a.s AS HUGEINT) * b.s) AS dot
                  FROM s a JOIN s b
                    ON a.dim = b.dim AND a.label < b.label
                  GROUP BY 1, 2),
            nrm AS (SELECT label, SUM(CAST(s AS HUGEINT) * s) AS nn
                    FROM s GROUP BY 1)
            SELECT d.label_a, d.label_b,
                   CAST(d.dot AS DOUBLE) AS dot,
                   CAST(d.dot AS DOUBLE)
                     / (sqrt(CAST(na.nn AS DOUBLE))
                        * sqrt(CAST(nb.nn AS DOUBLE))) AS cos
            FROM d
            JOIN nrm na ON na.label = d.label_a
            JOIN nrm nb ON nb.label = d.label_b
            ORDER BY d.label_a, d.label_b
        """,
        "top_unshipped": f"""
            WITH f AS (
              SELECT l_orderkey,
                CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                  AS rev
              FROM lineitem
              WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'),
            o AS (
              SELECT o_orderkey, o_orderdate FROM orders
              WHERE o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
                AND o_custkey IN (SELECT c_custkey FROM customer
                                  WHERE c_mktsegment = '{Q3_SEGMENT}'))
            SELECT l_orderkey, CAST(sum(f.rev) AS BIGINT) AS revenue_u,
                   o_orderdate
            FROM f JOIN o ON l_orderkey = o_orderkey
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue_u DESC, l_orderkey
            LIMIT {Q3_TOPN}
        """,
        "region_revenue": """
            SELECT r_name,
                   CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            JOIN region ON r_regionkey = n_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        # typo_pairs: brute levenshtein cross-join over the distinct
        # derived codes — the length-band predicate is a sound
        # prefilter (lev=1 forces |Δlen| ≤ 1), not a semantic change
        "typo_pairs": """
            WITH codes AS (SELECT DISTINCT
                ltrim(chr(97 + CAST((doc_id//625)%5 AS INT))
                   || chr(97 + CAST((doc_id//125)%5 AS INT))
                   || chr(97 + CAST((doc_id//25)%5 AS INT))
                   || chr(97 + CAST((doc_id//5)%5 AS INT))
                   || chr(97 + CAST(doc_id%5 AS INT)), 'a') AS t
              FROM documents)
            SELECT a.t AS tok_a, b.t AS tok_b
            FROM codes a JOIN codes b
              ON a.t < b.t
             AND abs(length(a.t) - length(b.t)) <= 1
             AND levenshtein(a.t, b.t) = 1
        """,
        # caption_stats: doc_id-carrying variant of _image_pts_cte —
        # same HUGEINT phash + 20-term Morton de-interleave, joined
        # back to documents for the caption-side aggregate
        "caption_stats": f"""
            WITH imgs2 AS (
              SELECT doc_id,
                     CAST((CAST(doc_id * {IMG_MULT} + k AS HUGEINT)
                           * {0x9E3779B97F4A7C15})
                          % 9223372036854775808 AS BIGINT) AS p
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            ipts2 AS (
              SELECT doc_id,
                CAST(({" + ".join(f"((p >> {2 * k}) & 1) * {1 << k}" for k in range(20))}) AS DOUBLE) + 0.5 AS x,
                CAST(({" + ".join(f"((p >> {2 * k + 1}) & 1) * {1 << k}" for k in range(20))}) AS DOUBLE) + 0.5 AS y
              FROM imgs2)
            SELECT district_id, count(*) AS n_images,
                   CAST(sum(d.n_chars) AS BIGINT) AS caption_chars
            FROM ipts2, {dist}, documents d
            WHERE x >= minx AND x < maxx AND y >= miny AND y < maxy
              AND d.doc_id = ipts2.doc_id
            GROUP BY district_id
        """,
        # raster_components: recursive-CTE min-label fixpoint — `lab`
        # enumerates every (cell, reachable label) pair (bounded by
        # Σ component_size², fine at the 16×16 mask), min per cell at
        # the end; engine = probes + BSP CC + isolated-cell rejoin
        "raster_components": f"""
            WITH RECURSIVE {{ipts}},
            cnt AS (SELECT CAST(floor(x / {{D}}) AS BIGINT) AS cx,
                           CAST(floor(y / {{D}}) AS BIGINT) AS cy,
                           count(*) AS n
                    FROM ipts GROUP BY 1, 2),
            mask AS (SELECT cy*16 + cx AS id, cx, cy, n FROM cnt
                     WHERE n >= (SELECT count(*) FROM ipts) // 256 + 1),
            e AS (SELECT a.id AS s, b.id AS t FROM mask a JOIN mask b
                  ON (b.cx = a.cx + 1 AND b.cy = a.cy)
                  OR (b.cx = a.cx AND b.cy = a.cy + 1)),
            ee AS (SELECT s, t FROM e UNION ALL SELECT t, s FROM e),
            lab AS (SELECT id, id AS lbl FROM mask
                    UNION
                    SELECT ee.s, lab.lbl FROM ee
                    JOIN lab ON lab.id = ee.t),
            comp AS (SELECT id, min(lbl) AS component FROM lab
                     GROUP BY id)
            SELECT c.component, count(*) AS n_cells,
                   CAST(sum(m.n) AS BIGINT) AS n_images
            FROM comp c JOIN mask m ON m.id = c.id
            GROUP BY c.component
        """.replace("{ipts}", _image_pts_cte()).replace(
            "{D}", str(EXTENT // 16)
        ),
        # word_stats: exact int stats, ONE double division
        "word_stats": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS c
                   FROM toks GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_words,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(max(c) AS BIGINT) AS max_freq,
                   (CAST(sum(c) AS DOUBLE) - CAST(count(*) AS DOUBLE))
                     / CAST(sum(c) AS DOUBLE) AS dup_frac
            FROM tf GROUP BY doc_id
        """,
        # price_hist: integer floor-division width buckets
        "price_hist": f"""
            WITH c AS (SELECT CAST(round(o_totalprice*100, 0) AS BIGINT)
                              AS v
                       FROM orders)
            SELECT v // {HIST_WIDTH} AS bucket,
                   CAST(sum(v) AS BIGINT) AS total_c,
                   CAST(count(*) AS BIGINT) AS n
            FROM c GROUP BY bucket ORDER BY bucket
        """,
        # bfs_hops: recursive-CTE min-dist fixpoint over the same
        # derived edge set as pagerank, depth-bounded at BFS_HOPS;
        # UNION dedups (node, d) pairs so rows stay n x (hops+1)
        "bfs_hops": f"""
            WITH RECURSIVE
            ks AS (SELECT unnest(range(0, 3)) AS k),
            e AS (
              SELECT doc_id AS src,
                     (doc_id * {AX} + k * {PR_EDGE_C} + {BX})
                       % (SELECT count(*) FROM documents) AS dst
              FROM documents, ks WHERE k < 1 + doc_id % 3),
            reach AS (
              SELECT doc_id AS v, 0 AS d FROM documents
              WHERE doc_id % {BFS_SRC_MOD} = 0
              UNION
              SELECT e.dst, r.d + 1 FROM reach r
              JOIN e ON e.src = r.v WHERE r.d < {BFS_HOPS})
            SELECT v AS doc_id, CAST(min(d) AS BIGINT) AS hops
            FROM reach GROUP BY v
        """,
        # search_map: bm25 CTE -> hit docs' image points -> district
        # rect join (one generation site for the bm25 fragments)
        "search_map": _search_map_sql(),
        # percentiles_cont: DuckDB quantile_cont — probed bit-exact
        # replica (pos = double(q)*(n-1), lo*(1-frac) + hi*frac)
        "percentiles_cont": """
            WITH c AS (SELECT o_orderpriority,
                              CAST(round(o_totalprice*100, 0) AS BIGINT)
                                  AS v
                       FROM orders)
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n,
                   quantile_cont(v, 0.25) AS p25,
                   quantile_cont(v, 0.50) AS p50,
                   quantile_cont(v, 0.90) AS p90
            FROM c GROUP BY o_orderpriority
        """,
        # revenue_cube: CUBE over two categorical keys, integer cents
        "revenue_cube": """
            SELECT o_orderpriority, o_orderstatus,
                   CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT))
                        AS BIGINT) AS total_c,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders
            GROUP BY CUBE (o_orderpriority, o_orderstatus)
        """,
        # supplier_prank: DuckDB's percent_rank is the same
        # (rank-1)/(n-1) double division (probed: peers share min
        # rank, single-row partition = 0.0)
        "supplier_prank": """
            SELECT s_nationkey, s_acctbal, s_suppkey,
                   percent_rank() OVER (
                       PARTITION BY s_nationkey
                       ORDER BY s_acctbal) AS pr
            FROM supplier
        """,
        # tfidf: same single-space tokenization as near_dup/bm25; the
        # rank key is the INTEGER floor-division score (HUGEINT in
        # SQL), totalized by (score_u DESC, term) on both sides
        "tfidf": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term,
                          CAST(count(*) AS BIGINT) AS tf
                   FROM toks GROUP BY 1, 2),
            df AS (SELECT term,
                          CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                   FROM toks GROUP BY 1),
            nn AS (SELECT count(*) AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                         CAST((CAST(tf.tf AS HUGEINT) * 1000000 * nn.n)
                              // df.df AS BIGINT) AS score_u
                  FROM tf JOIN df USING (term), nn)
            SELECT doc_id, term, tf, df, score_u FROM s
            QUALIFY row_number() OVER (
                PARTITION BY doc_id
                ORDER BY score_u DESC, term) <= 3
        """,
        # patch_stats: every pixel recomputed from the synthetic
        # generator's closed form — pixel(idx, j) = (idx·M + seed +
        # 97·j) mod 256 with j = (row·16 + col)·3 + ch; the engine
        # decodes the same bytes through the raw / PNG codec paths
        # (PNG is lossless, so equality is exact). o enumerates the 48
        # in-tile offsets (r0 = o//12, c0 = (o%12)//3, ch = o%3).
        "patch_stats": f"""
            WITH imgs AS (
              SELECT doc_id * {IMG_MULT} + k AS idx
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            o AS (SELECT unnest(range(0, 48)) AS o),
            g AS (SELECT unnest(range(0, 4)) AS p),
            pp AS (
              SELECT i.idx, gx.p AS px, gy.p AS py,
                     sum((i.idx * 2654435761 + 42
                          + 97 * (((4*gy.p + o.o // 12) * 16
                                   + 4*gx.p + (o.o % 12) // 3) * 3
                                  + o.o % 3)) % 256) AS psum
              FROM imgs i, g gx, g gy, o
              GROUP BY 1, 2, 3)
            SELECT px, py,
                   CAST(count(*) AS BIGINT) AS n_images,
                   CAST(sum(psum) AS BIGINT) AS pixel_sum,
                   CAST(min(psum) AS BIGINT) AS min_patch_sum,
                   CAST(max(psum) AS BIGINT) AS max_patch_sum
            FROM pp GROUP BY px, py ORDER BY px, py
        """,
        # image_hist: top-left 8×8 ROI per-channel byte histogram —
        # every cropped byte recomputed from the generator closed
        # form pixel(idx, j) = (idx·M + 42 + 97·j) mod 256 with
        # j = 3·(16r + c) + ch; the engine decodes the same bytes
        # through the raw / PNG codec paths (lossless → exact)
        "image_hist": f"""
            WITH imgs AS (
              SELECT doc_id * {IMG_MULT} + k AS idx
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            pos AS (
              SELECT (16 * r.r + c.c) * 3 + ch.ch AS j, ch.ch AS ch
              FROM (SELECT unnest(range(0, 8)) AS r) r,
                   (SELECT unnest(range(0, 8)) AS c) c,
                   (SELECT unnest(range(0, 3)) AS ch) ch)
            SELECT p.ch,
                   (i.idx * 2654435761 + 42 + 97 * p.j) % 256 AS v,
                   CAST(count(*) AS BIGINT) AS n
            FROM imgs i, pos p
            GROUP BY 1, 2 ORDER BY ch, v
        """,
        # image_moments: grayscale spatial moments + centroid. Raster
        # is a pure function of base = (idx·M + 42) mod 256, so the
        # 256 possible moment rows are computed once and joined to
        # images by base (the image_sharpness oracle discipline)
        "image_moments": f"""
            WITH imgs AS (
              SELECT doc_id * {IMG_MULT} + k AS idx
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            bs AS (SELECT unnest(range(0, 256)) AS base),
            ps AS (SELECT unnest(range(0, 256)) AS p),
            g AS (
              SELECT bs.base, ps.p // 16 AS r, ps.p % 16 AS c,
                     (bs.base + 97 * (3 * ps.p + 0)) % 256
                     + (bs.base + 97 * (3 * ps.p + 1)) % 256
                     + (bs.base + 97 * (3 * ps.p + 2)) % 256 AS gv
              FROM bs, ps),
            mb AS (
              SELECT base,
                     CAST(sum(gv) AS BIGINT) AS m00,
                     CAST(sum(c * gv) AS BIGINT) AS m10,
                     CAST(sum(r * gv) AS BIGINT) AS m01,
                     CAST(sum(r * c * gv) AS BIGINT) AS m11,
                     CAST(sum(c * c * gv) AS BIGINT) AS m20,
                     CAST(sum(r * r * gv) AS BIGINT) AS m02
              FROM g GROUP BY base)
            SELECT 'img' || lpad(CAST(i.idx AS VARCHAR), 12, '0')
                     AS image_id,
                   m00, m10, m01, m11, m20, m02,
                   CAST(m10 AS DOUBLE) / CAST(m00 AS DOUBLE) AS cx,
                   CAST(m01 AS DOUBLE) / CAST(m00 AS DOUBLE) AS cy
            FROM imgs i
            JOIN mb ON mb.base = (i.idx * 2654435761 + 42) % 256
            ORDER BY image_id
        """,
        "dominant_color": f"""
            WITH imgs AS (
              SELECT doc_id * {IMG_MULT} + k AS idx
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            bs AS (SELECT unnest(range(0, 256)) AS base),
            ps AS (SELECT unnest(range(0, 256)) AS p),
            g AS (
              SELECT bs.base,
                     ((bs.base + 97 * (3 * ps.p + 0)) % 256) // 32 * 64
                     + ((bs.base + 97 * (3 * ps.p + 1)) % 256) // 32 * 8
                     + ((bs.base + 97 * (3 * ps.p + 2)) % 256) // 32
                       AS bucket
              FROM bs, ps),
            cb AS (SELECT base, bucket, count(*) AS c
                   FROM g GROUP BY base, bucket),
            mx AS (SELECT base, max(c) AS mc FROM cb GROUP BY base),
            db AS (SELECT cb.base,
                          CAST(min(cb.bucket) AS BIGINT) AS bucket,
                          CAST(mx.mc AS BIGINT) AS n_px
                   FROM cb JOIN mx ON cb.base = mx.base
                                  AND cb.c = mx.mc
                   GROUP BY cb.base, mx.mc)
            SELECT 'img' || lpad(CAST(i.idx AS VARCHAR), 12, '0')
                     AS image_id,
                   db.bucket, db.n_px
            FROM imgs i
            JOIN db ON db.base = (i.idx * 2654435761 + 42) % 256
            ORDER BY image_id
        """,
        # image_sharpness: total-variation |Δgray| per image. The
        # raster is a pure function of base = (idx·M + 42) mod 256,
        # so the oracle evaluates the 256 possible gray rasters once
        # (256 bases × 256 positions, gray = Σ_ch (base + 97·(3p+ch))
        # mod 256), reduces each to Σ|Δh| + Σ|Δv|, and joins images
        # to their base — O(docs + 65k) on the SQL side while the
        # engine decodes every real payload
        "image_sharpness": f"""
            WITH imgs AS (
              SELECT doc_id * {IMG_MULT} + k AS idx
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            bs AS (SELECT unnest(range(0, 256)) AS base),
            ps AS (SELECT unnest(range(0, 256)) AS p),
            g AS (
              SELECT bs.base, ps.p // 16 AS r, ps.p % 16 AS c,
                     (bs.base + 97 * (3 * ps.p + 0)) % 256
                     + (bs.base + 97 * (3 * ps.p + 1)) % 256
                     + (bs.base + 97 * (3 * ps.p + 2)) % 256 AS gv
              FROM bs, ps),
            hx AS (
              SELECT g1.base, sum(abs(g2.gv - g1.gv)) AS s
              FROM g g1 JOIN g g2
                ON g2.base = g1.base AND g2.r = g1.r
                   AND g2.c = g1.c + 1
              GROUP BY g1.base),
            vy AS (
              SELECT g1.base, sum(abs(g2.gv - g1.gv)) AS s
              FROM g g1 JOIN g g2
                ON g2.base = g1.base AND g2.c = g1.c
                   AND g2.r = g1.r + 1
              GROUP BY g1.base),
            sb AS (
              SELECT hx.base, CAST(hx.s + vy.s AS BIGINT) AS sharpness
              FROM hx JOIN vy ON vy.base = hx.base)
            SELECT 'img' || lpad(CAST(i.idx AS VARCHAR), 12, '0')
                       AS image_id,
                   sb.sharpness
            FROM imgs i
            JOIN sb ON sb.base = (i.idx * 2654435761 + 42) % 256
            ORDER BY image_id
        """,
        # big_orders (TPC-H Q18 shape): HAVING over per-order exact
        # integer quantity sums, dimension joins, total order
        # (totalprice_c DESC, o_orderkey) + LIMIT on both sides
        "big_orders": f"""
            WITH po AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(round(l_quantity, 0) AS BIGINT))
                          AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum_qty > {Q18_QTY})
            SELECT o.o_orderkey,
                   o.o_custkey AS c_custkey,
                   c.c_name,
                   o.o_orderdate,
                   CAST(round(o_totalprice*100, 0) AS BIGINT)
                       AS totalprice_c,
                   po.sum_qty
            FROM po
            JOIN orders o ON o.o_orderkey = po.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY totalprice_c DESC, o.o_orderkey
            LIMIT {Q18_TOPN}
        """,
        # local_volume (TPC-H Q5 shape): five-way join with the
        # same-nation customer=supplier predicate; integer-cents
        # revenue identical token-for-token to the engine expression
        "local_volume": f"""
            SELECT s.s_nationkey, n.n_name,
                   CAST(sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)
                            * (100 - CAST(round(l_discount*100, 0)
                                           AS BIGINT))) AS BIGINT)
                       AS revenue_u,
                   CAST(count(*) AS BIGINT) AS n_lineitems
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE c.c_nationkey = s.s_nationkey
              AND n.n_regionkey = {Q5_REGION}
              AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
              AND o.o_orderdate < TIMESTAMP '{Q5_DATE_HI}'
            GROUP BY s.s_nationkey, n.n_name
            ORDER BY revenue_u DESC, s.s_nationkey
        """,
        # hot_cells: LEFT self-join on Chebyshev distance <= 1 over
        # the res-4 occupancy counts; strict > against the neighbor
        # max (absent neighbors coalesce to 0) on both sides
        "hot_cells": f"""
            WITH {{ipts}},
            cnt AS (SELECT CAST(floor(x / {{D}}) AS BIGINT) AS cx,
                           CAST(floor(y / {{D}}) AS BIGINT) AS cy,
                           count(*) AS n
                    FROM ipts GROUP BY 1, 2),
            nb AS (
              SELECT a.cx, a.cy, a.n,
                     count(b.cx) AS n_neighbors,
                     coalesce(max(b.n), 0) AS mx
              FROM cnt a LEFT JOIN cnt b
                ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
               AND NOT (b.cx = a.cx AND b.cy = a.cy)
              GROUP BY a.cx, a.cy, a.n)
            SELECT cx, cy,
                   CAST(n AS BIGINT) AS n_images,
                   CAST(n_neighbors AS BIGINT) AS n_neighbors,
                   CAST(mx AS BIGINT) AS max_neighbor_w
            FROM nb WHERE n > mx ORDER BY cx, cy
        """.replace("{ipts}", _image_pts_cte()).replace(
            "{D}", str(EXTENT // 16)
        ),
        # aspect_buckets: the bucket table VALUES come from the SAME
        # Python constants the engine uses (media/buckets.
        # bucket_sql_values), so criterion and tie-break can't drift;
        # argmin tie goes to the smallest bucket_id on both sides
        # (np.argmin first-occurrence == ORDER BY metric, bucket_id)
        "aspect_buckets": f"""
            WITH imgs AS (
              SELECT doc_id * {IMG_MULT} + k AS idx
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            dims AS (
              SELECT idx,
                     CAST(512 + ((idx*7) % 25) * 64 AS BIGINT) AS w,
                     CAST(512 + ((idx*11) % 25) * 64 AS BIGINT) AS h
              FROM imgs),
            buckets(bucket_id, bw, bh, a) AS (
              VALUES {_bucket_values()}),
            m AS (
              SELECT idx, w, h, bucket_id, bw, bh,
                     abs({_ASPECT_SCALE}*w - a*h) AS metric
              FROM dims CROSS JOIN buckets),
            best AS (
              SELECT * FROM m
              QUALIFY row_number() OVER (
                  PARTITION BY idx ORDER BY metric, bucket_id) = 1)
            SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
                   CAST(any_value(bw) AS INT) AS bucket_w,
                   CAST(any_value(bh) AS INT) AS bucket_h,
                   CAST(count(*) AS BIGINT) AS n_images,
                   CAST(sum(w*h) AS BIGINT) AS pixels
            FROM best GROUP BY bucket_id ORDER BY bucket_id
        """,
        # image_shards: window cumulative-byte sum over the curated
        # stream in image_id order; blen = w*h*3 (the raw-format
        # payload length the engine measures with binary_length);
        # min/max idx ≡ min/max image_id (zero-padded decimal)
        "image_shards": f"""
            WITH imgs AS (
              SELECT doc_id * {IMG_MULT} + k AS idx,
                     CAST((CAST(doc_id * {IMG_MULT} + k AS HUGEINT)
                           * {0x9E3779B97F4A7C15})
                          % 9223372036854775808 AS BIGINT) AS p
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            keep AS (
              SELECT idx, CAST(16*16*3 AS BIGINT) AS blen
              FROM imgs WHERE p % 97 >= 10),
            c AS (
              SELECT idx, blen,
                     sum(blen) OVER (ORDER BY idx
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum
              FROM keep),
            s AS (SELECT idx, blen,
                         CAST((cum - blen) // {SHARD_CAP} AS BIGINT)
                             AS shard_id
                  FROM c)
            SELECT shard_id,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(blen) AS BIGINT) AS shard_bytes,
                   'img' || lpad(CAST(min(idx) AS VARCHAR), 12, '0')
                       AS first_id,
                   'img' || lpad(CAST(max(idx) AS VARCHAR), 12, '0')
                       AS last_id
            FROM s GROUP BY shard_id ORDER BY shard_id
        """,
        # gini: row_number formulation — equals the engine's
        # tie-invariant histogram formula for every tie order (see
        # ops/stats.py docstring); HUGEINT sums, ONE double division
        "gini": """
            WITH c AS (SELECT o_orderpriority,
                              CAST(round(o_totalprice*100, 0) AS BIGINT)
                                  AS v
                       FROM orders),
            r AS (SELECT o_orderpriority, v,
                         CAST(row_number() OVER (
                             PARTITION BY o_orderpriority ORDER BY v)
                           AS HUGEINT) AS rn
                  FROM c),
            a AS (SELECT o_orderpriority, count(*) AS n,
                         sum(CAST(v AS HUGEINT)) AS s,
                         sum(rn * v) AS rs
                  FROM r GROUP BY o_orderpriority)
            SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
                   CAST(2*rs - (CAST(n AS HUGEINT)+1)*s AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT)*s AS DOUBLE) AS gini
            FROM a
        """,
        # wmedian: lower weighted median — smallest price whose
        # running weight reaches ceil(W/2); all-integer window cumsum
        "wmedian": """
            WITH c AS (SELECT l_returnflag,
                              CAST(round(l_extendedprice*100, 0)
                                   AS BIGINT) AS p,
                              CAST(round(l_quantity, 0) AS BIGINT) AS w
                       FROM lineitem),
            g AS (SELECT l_returnflag, p, sum(w) AS w
                  FROM c GROUP BY l_returnflag, p),
            s AS (SELECT l_returnflag, p,
                         sum(w) OVER (PARTITION BY l_returnflag
                                      ORDER BY p) AS cw,
                         sum(w) OVER (PARTITION BY l_returnflag) AS tw
                  FROM g)
            SELECT l_returnflag,
                   CAST(any_value(tw) AS BIGINT) AS w_total,
                   min(p) AS wmedian
            FROM s WHERE cw >= (tw + 1) // 2
            GROUP BY l_returnflag
        """,
        # mad: both quantiles are quantile_disc under DECIMAL 0.5 —
        # the engine replicates ceil(n/2) with integer rationals
        "mad": """
            WITH c AS (SELECT event_type,
                              CAST(round(value*100, 0) AS BIGINT) AS v
                       FROM events),
            m AS (SELECT event_type, quantile_disc(v, 0.5) AS med
                  FROM c GROUP BY event_type)
            SELECT c.event_type, any_value(m.med) AS median,
                   quantile_disc(abs(c.v - m.med), 0.5) AS mad
            FROM c JOIN m USING (event_type)
            GROUP BY c.event_type
        """,
        "winsorize": """
            WITH c AS (SELECT event_type, event_id,
                              CAST(round(value*100, 0) AS BIGINT)
                                  AS v_cents
                       FROM events),
            caps AS (SELECT event_type,
                            quantile_disc(v_cents, 0.9) AS cap
                     FROM c GROUP BY event_type)
            SELECT c.event_type, least(c.v_cents, caps.cap) AS v_cents,
                   c.event_id
            FROM c JOIN caps USING (event_type)
        """,
        "weighted_sample": """
            WITH c AS (SELECT event_id, user_id, event_type,
                              CAST(round(value*100, 0) AS BIGINT)
                                  AS v_cents
                       FROM events)
            SELECT event_id, user_id, event_type, v_cents
            FROM c
            WHERE (((event_id % 2147483646 + 1) * 48271 % 2147483647)
                   * 48271 % 2147483647) * 100000
                  < v_cents * 2147483647
        """,
        "order_rank": """
            SELECT o_orderkey, o_totalprice,
                   CAST(row_number() OVER (ORDER BY o_totalprice DESC,
                                                    o_orderkey)
                        AS BIGINT) AS rank
            FROM orders
        """,
        "cooccur": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS item_a, b.event_type AS item_b,
                   count(*) AS n_users
            FROM d a JOIN d b ON a.user_id = b.user_id
                             AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "item_sim": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
            co AS (SELECT a.event_type AS item_a,
                          b.event_type AS item_b,
                          count(*) AS n_xy
                   FROM d a JOIN d b ON a.user_id = b.user_id
                                    AND a.event_type < b.event_type
                   GROUP BY 1, 2),
            m AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1)
            SELECT co.item_a, co.item_b, co.n_xy,
                   CAST(co.n_xy AS DOUBLE)
                     / (sqrt(CAST(ma.n AS DOUBLE))
                        * sqrt(CAST(mb.n AS DOUBLE))) AS cosine,
                   CAST(co.n_xy AS DOUBLE)
                     / CAST(ma.n + mb.n - co.n_xy AS DOUBLE) AS jaccard
            FROM co
            JOIN m ma ON ma.event_type = co.item_a
            JOIN m mb ON mb.event_type = co.item_b
            ORDER BY co.item_a, co.item_b
        """,
        "intervals": """
            WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                               epoch_us(ts)
                                 + CAST(round(value*100, 0) AS BIGINT)
                                   * 3600000 AS e,
                               event_id
                        FROM events),
            m AS (SELECT user_id, s, e, event_id,
                         max(e) OVER (PARTITION BY user_id
                                      ORDER BY s, e, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND 1 PRECEDING) AS pm
                  FROM iv),
            f AS (SELECT user_id, s, e, event_id,
                         CASE WHEN pm IS NULL OR s > pm
                              THEN 1 ELSE 0 END AS ni
                  FROM m),
            g AS (SELECT user_id, s, e,
                         sum(ni) OVER (PARTITION BY user_id
                                       ORDER BY s, e, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW) AS isl
                  FROM f)
            SELECT user_id, min(s) AS start_us, max(e) AS end_us,
                   count(*) AS n_merged
            FROM g GROUP BY user_id, isl
        """,
        "triangles": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            raw AS (SELECT doc_id AS i,
                           (doc_id + 1) % nn.n AS j1,
                           (doc_id + 2) % nn.n AS j2,
                           (doc_id * 7 + 3) % nn.n AS j3
                    FROM documents, nn),
            und AS (SELECT least(i, j) AS u, greatest(i, j) AS v
                    FROM (SELECT i, j1 AS j FROM raw
                          UNION ALL SELECT i, j2 FROM raw
                          UNION ALL SELECT i, j3 FROM raw)
                    WHERE i <> j),
            e AS (SELECT DISTINCT u, v FROM und)
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM e a
            JOIN e b ON b.u = a.u AND b.v > a.v
            JOIN e c ON c.u = a.v AND c.v = b.v
        """,
        "hmean": f"""
            WITH e AS (SELECT event_type,
                              CAST(round(value * 100, 0) AS BIGINT)
                                AS v
                       FROM events),
            g AS (SELECT event_type,
                         CAST(count(*) AS HUGEINT) AS n,
                         SUM(CAST({HMEAN_SCALE} AS HUGEINT) // v)
                           AS rsum
                  FROM e WHERE v > 0 GROUP BY 1)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   CAST(rsum AS BIGINT) AS rsum,
                   CAST(n * {HMEAN_SCALE} AS DOUBLE)
                     / CAST(rsum AS DOUBLE) AS hmean
            FROM g ORDER BY event_type
        """,
        "rfm": f"""
            WITH a AS (SELECT user_id,
                              epoch_us(max(ts)) AS r_max,
                              count(*) AS f,
                              CAST(sum(CAST(round(value * 100, 0)
                                            AS BIGINT)) AS BIGINT)
                                AS m
                       FROM events GROUP BY 1),
            t AS (SELECT user_id, r_max, f, m,
                         ntile({RFM_TILES}) OVER (ORDER BY r_max,
                                                  user_id) AS r_tile,
                         ntile({RFM_TILES}) OVER (ORDER BY f, user_id)
                           AS f_tile,
                         ntile({RFM_TILES}) OVER (ORDER BY m, user_id)
                           AS m_tile
                  FROM a)
            SELECT user_id, r_max, CAST(f AS BIGINT) AS f, m,
                   CAST(r_tile AS BIGINT) AS r_tile,
                   CAST(f_tile AS BIGINT) AS f_tile,
                   CAST(m_tile AS BIGINT) AS m_tile,
                   CAST(r_tile * 100 + f_tile * 10 + m_tile
                        AS BIGINT) AS rfm
            FROM t ORDER BY user_id
        """,
        "impute": f"""
            WITH e AS (SELECT event_id, event_type,
                              CAST(round(value * 100, 0) AS BIGINT)
                                AS v,
                              CASE WHEN event_id % {IMPUTE_MOD} = 0
                                   THEN 1 ELSE 0 END AS miss
                       FROM events),
            m AS (SELECT event_type, quantile_disc(v, 0.5) AS med
                  FROM e WHERE miss = 0 GROUP BY 1)
            SELECT e.event_id, e.event_type,
                   CAST(CASE WHEN e.miss = 1 THEN m.med ELSE e.v END
                        AS BIGINT) AS v_filled,
                   CAST(e.miss AS BIGINT) AS was_missing
            FROM e JOIN m USING (event_type)
            ORDER BY e.event_id
        """,
        # cms_counts: replay the sketch cell-for-cell — bucket sums
        # per hash row, then min over rows per query key
        "cms_counts": f"""
            WITH uc AS (SELECT user_id, count(*) AS c
                        FROM events GROUP BY 1),
            h AS (SELECT * FROM {_cms_hash_values()} ),
            bc AS (SELECT h.i,
                          ((uc.user_id * h.a + h.b) % 2147483647)
                            % {CMS_W} AS bkt,
                          SUM(uc.c) AS s
                   FROM uc, h GROUP BY 1, 2),
            q AS (SELECT user_id, c FROM uc
                  WHERE user_id < {CMS_QMAX}),
            qb AS (SELECT q.user_id, q.c, h.i,
                          ((q.user_id * h.a + h.b) % 2147483647)
                            % {CMS_W} AS bkt
                   FROM q, h)
            SELECT qb.user_id,
                   CAST(MIN(bc.s) AS BIGINT) AS est,
                   CAST(MAX(qb.c) AS BIGINT) AS n_true
            FROM qb JOIN bc ON bc.i = qb.i AND bc.bkt = qb.bkt
            GROUP BY qb.user_id ORDER BY qb.user_id
        """,
        "vocab_stats": """
            WITH t AS (SELECT lang,
                              unnest(string_split(text, ' ')) AS w
                       FROM documents),
            c AS (SELECT lang, w, count(*) AS c FROM t GROUP BY 1, 2)
            SELECT lang,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hapax,
                   CAST(count(*) AS DOUBLE)
                     / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS ttr
            FROM c GROUP BY lang ORDER BY lang
        """,
        # ewma: dyadic truncated EWMA — bounded rn self-join, weight
        # 1 << (k-1 - gap); num/den exact ints, one mirrored division
        "ewma": f"""
            WITH e AS (
              SELECT event_id, user_id, ts,
                     CAST(round(value * 100, 0) AS BIGINT) AS v,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events)
            SELECT a.event_id, a.user_id,
                   CAST(SUM(b.v * (1 << ({EWMA_K - 1}
                        - CAST(a.rn - b.rn AS INT)))) AS BIGINT)
                     AS num,
                   CAST(SUM(1 << ({EWMA_K - 1}
                        - CAST(a.rn - b.rn AS INT))) AS BIGINT)
                     AS den,
                   CAST(SUM(b.v * (1 << ({EWMA_K - 1}
                        - CAST(a.rn - b.rn AS INT)))) AS DOUBLE)
                   / CAST(SUM(1 << ({EWMA_K - 1}
                        - CAST(a.rn - b.rn AS INT))) AS DOUBLE)
                     AS ewma
            FROM e a
            JOIN e b ON b.user_id = a.user_id
                    AND b.rn BETWEEN a.rn - {EWMA_K - 1} AND a.rn
            GROUP BY 1, 2
            ORDER BY 1
        """,
        # road_lengths: horizontal segment × rect interval clip; the
        # integer y lands off-lattice at y+0.5 so [miny, maxy)
        # containment is the integer test yi >= miny AND yi < maxy
        "road_lengths": f"""
            WITH segs AS (
              SELECT doc_id,
                     (doc_id * {RL_AY} + {RL_BY}) % {EXTENT} AS yi,
                     (doc_id * {RL_AX} + {RL_BX}) % {EXTENT} AS x0,
                     least((doc_id * {RL_AX} + {RL_BX}) % {EXTENT}
                           + (doc_id * {RL_AL} + {RL_BL})
                             % {RL_MAXLEN} + 1,
                           {EXTENT}) AS x1
              FROM documents),
            d AS (SELECT * FROM {{DSQL}} ),
            ov AS (
              SELECT d.district_id,
                     greatest(least(s.x1, d.maxx)
                              - greatest(s.x0, d.minx), 0) AS len
              FROM segs s
              JOIN d ON s.yi >= d.miny AND s.yi < d.maxy)
            SELECT district_id,
                   CAST(sum(len) AS BIGINT) AS road_len,
                   CAST(sum(CASE WHEN len > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_segs
            FROM ov
            GROUP BY 1
            HAVING sum(CASE WHEN len > 0 THEN 1 ELSE 0 END) > 0
            ORDER BY 1
        """.replace("{DSQL}", districts_sql(N_DISTRICTS)),
        # kcore: unrolled dead-set peeling. x_r = dead set after r
        # rounds: x_{r+1} = x_r ∪ {alive nodes whose alive-degree < k}
        # (nodes with ZERO alive neighbors vanish from deg_r — the
        # "NOT IN deg_r WHERE d >= k" form catches both). Chains peel
        # in 3 rounds; round 4 is the engine's slack round (no-op).
        "kcore": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            ring AS (SELECT doc_id AS i FROM documents),
            e0 AS (
              SELECT i AS u, (i + 1) % nn.n AS v FROM ring, nn
              UNION ALL SELECT i, (i + 2) % nn.n FROM ring, nn
              UNION ALL SELECT i, nn.n + i FROM ring, nn
                WHERE i % 10 = 0
              UNION ALL SELECT nn.n + i, 2 * nn.n + i FROM ring, nn
                WHERE i % 10 = 0
              UNION ALL SELECT 2 * nn.n + i, 3 * nn.n + i FROM ring, nn
                WHERE i % 10 = 0),
            und AS (SELECT DISTINCT least(u, v) AS a,
                           greatest(u, v) AS b
                    FROM e0 WHERE u <> v),
            s AS (SELECT a AS src, b AS dst FROM und
                  UNION ALL SELECT b, a FROM und),
            deg0 AS (SELECT src AS node, count(*) AS d
                     FROM s GROUP BY 1),
            x1 AS (SELECT node FROM deg0 WHERE d < 2),
            a1 AS (SELECT src, dst FROM s
                   WHERE src NOT IN (SELECT node FROM x1)
                     AND dst NOT IN (SELECT node FROM x1)),
            deg1 AS (SELECT src AS node, count(*) AS d
                     FROM a1 GROUP BY 1),
            x2 AS (SELECT node FROM x1
                   UNION
                   SELECT node FROM deg0
                   WHERE node NOT IN (SELECT node FROM x1)
                     AND node NOT IN (SELECT node FROM deg1
                                      WHERE d >= 2)),
            a2 AS (SELECT src, dst FROM s
                   WHERE src NOT IN (SELECT node FROM x2)
                     AND dst NOT IN (SELECT node FROM x2)),
            deg2 AS (SELECT src AS node, count(*) AS d
                     FROM a2 GROUP BY 1),
            x3 AS (SELECT node FROM x2
                   UNION
                   SELECT node FROM deg0
                   WHERE node NOT IN (SELECT node FROM x2)
                     AND node NOT IN (SELECT node FROM deg2
                                      WHERE d >= 2)),
            a3 AS (SELECT src, dst FROM s
                   WHERE src NOT IN (SELECT node FROM x3)
                     AND dst NOT IN (SELECT node FROM x3)),
            deg3 AS (SELECT src AS node, count(*) AS d
                     FROM a3 GROUP BY 1),
            x4 AS (SELECT node FROM x3
                   UNION
                   SELECT node FROM deg0
                   WHERE node NOT IN (SELECT node FROM x3)
                     AND node NOT IN (SELECT node FROM deg3
                                      WHERE d >= 2))
            SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
            FROM s
            WHERE src NOT IN (SELECT node FROM x4)
              AND dst NOT IN (SELECT node FROM x4)
            GROUP BY 1 ORDER BY 1
        """,
        "clustering": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            raw AS (SELECT doc_id AS i,
                           (doc_id + 1) % nn.n AS j1,
                           (doc_id + 2) % nn.n AS j2,
                           (doc_id * 7 + 3) % nn.n AS j3
                    FROM documents, nn),
            und AS (SELECT least(i, j) AS u, greatest(i, j) AS v
                    FROM (SELECT i, j1 AS j FROM raw
                          UNION ALL SELECT i, j2 FROM raw
                          UNION ALL SELECT i, j3 FROM raw)
                    WHERE i <> j),
            e AS (SELECT DISTINCT u, v FROM und),
            tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
                    FROM e a
                    JOIN e b ON b.u = a.u AND b.v > a.v
                    JOIN e c ON c.u = a.v AND c.v = b.v),
            tcnt AS (SELECT node, count(*) AS tri FROM (
                       SELECT x AS node FROM tri
                       UNION ALL SELECT y FROM tri
                       UNION ALL SELECT z FROM tri)
                     GROUP BY node),
            deg AS (SELECT node, count(*) AS degree FROM (
                      SELECT u AS node FROM e
                      UNION ALL SELECT v FROM e)
                    GROUP BY node)
            SELECT deg.node,
                   CAST(degree AS BIGINT) AS degree,
                   CAST(COALESCE(tri, 0) AS BIGINT) AS n_tri,
                   CASE WHEN degree >= 2
                        THEN CAST(2 * COALESCE(tri, 0) AS DOUBLE)
                             / CAST(degree * (degree - 1) AS DOUBLE)
                        ELSE NULL END AS lcc
            FROM deg LEFT JOIN tcnt USING (node)
            ORDER BY deg.node
        """,
        "outliers": """
            WITH c AS (SELECT event_id, event_type,
                              CAST(round(value*100, 0) AS BIGINT)
                                  AS v_cents
                       FROM events),
            g AS (SELECT event_type,
                         CAST(count(*) AS HUGEINT) AS n,
                         sum(CAST(v_cents AS HUGEINT)) AS s,
                         sum(CAST(v_cents AS HUGEINT)
                             * CAST(v_cents AS HUGEINT)) AS q
                  FROM c GROUP BY event_type)
            SELECT c.event_type, c.v_cents, c.event_id
            FROM c JOIN g USING (event_type)
            WHERE 2*(CAST(c.v_cents AS HUGEINT)*n - s) > 0
              AND (2*(CAST(c.v_cents AS HUGEINT)*n - s))
                  * (2*(CAST(c.v_cents AS HUGEINT)*n - s))
                  > 9 * (n*q - s*s)
        """,
        "rollup_revenue": """
            SELECT coalesce(r_name, 'ALL') AS r_name,
                   coalesce(n_name, 'ALL') AS n_name,
                   CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            JOIN region ON r_regionkey = n_regionkey
            GROUP BY ROLLUP(r_name, n_name)
        """,
        "decontaminate": f"""
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            idx AS (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i
                    FROM t WHERE len(toks) >= 3),
            shing AS (SELECT DISTINCT doc_id,
                        toks[i] || chr(1) || toks[i+1] || chr(1)
                          || toks[i+2] AS sh
                      FROM idx),
            bench AS (SELECT DISTINCT sh FROM shing
                      WHERE doc_id % {DECON_MOD} = 0),
            hit AS (SELECT DISTINCT s.doc_id FROM shing s
                    JOIN bench b ON s.sh = b.sh
                    WHERE s.doc_id % {DECON_MOD} != 0)
            SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
            FROM documents d LEFT JOIN hit h ON h.doc_id = d.doc_id
            WHERE d.doc_id % {DECON_MOD} != 0
        """,
        # near_dup: exact word-3-shingle Jaccard >= 0.5 pairs, then
        # connected components (transitive closure, min-id label).
        # Same single-space split and the same IEEE double expression
        # c/(na+nb-c) as text/cluster.py, so values match bit-for-bit.
        "near_dup": f"""
            WITH RECURSIVE {_near_dup_ctes()}
            SELECT s AS doc_id, least(s, min(d)) AS component_id
            FROM reach GROUP BY s
        """,
        # dedup_rewrite: survivors = corpus ANTI JOIN the non-canonical
        # cluster members (same closure CTEs as near_dup, one
        # generation site)
        "dedup_rewrite": f"""
            WITH RECURSIVE {_near_dup_ctes()},
            comp AS (SELECT s AS doc_id,
                            least(s, min(d)) AS component_id
                     FROM reach GROUP BY s)
            SELECT d.doc_id FROM documents d
            WHERE NOT EXISTS (
              SELECT 1 FROM comp c
              WHERE c.doc_id = d.doc_id
                AND c.component_id <> c.doc_id)
        """,
        "islands": f"""
            WITH {_xl_rects_cte()}
            SELECT a.doc_id FROM srcs a
            WHERE NOT EXISTS (
              SELECT 1 FROM srcs b WHERE b.doc_id != a.doc_id
                AND a.sminx <= b.smaxx AND a.smaxx >= b.sminx
                AND a.sminy <= b.smaxy AND a.smaxy >= b.sminy)
        """,
        "count_overlaps": f"""
            WITH {_xl_rects_cte()}
            SELECT CAST(count(*) AS BIGINT) AS n_overlaps
            FROM srcs a JOIN srcs b ON a.doc_id < b.doc_id
            WHERE least(a.smaxx, b.smaxx) > greatest(a.sminx, b.sminx)
              AND least(a.smaxy, b.smaxy) > greatest(a.sminy, b.sminy)
        """,
        "embed_dedup": f"""
            SELECT a.vec_id AS id_i, b.vec_id AS id_j
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding)
                  >= {EMBED_DUP_THRESHOLD}
        """,
        "token_bpe": _token_bpe_sql(),
        "redact": _redact_sql(),
        "chunks": _chunks_sql(),
        "pack": _pack_sql(),
        "bm25": _bm25_sql(),
        "bm25_multi": _bm25_multi_sql(),
        "lang_id": _langid_sql(),
        "fingerprint": r"""
            WITH RECURSIVE fp AS (
              SELECT doc_id, text, 1 AS i,
                     CAST(14695981039346656037 AS HUGEINT) AS h,
                     len(text) AS n
              FROM documents
              UNION ALL
              SELECT doc_id, text, i + 1,
                     ((xor(CAST(h AS UBIGINT),
                           CAST(ascii(substr(text, i, 1)) AS UBIGINT)))::HUGEINT
                       * CAST(1099511628211 AS HUGEINT))
                       % CAST(18446744073709551616 AS HUGEINT),
                     n
              FROM fp WHERE i <= n
            )
            SELECT doc_id,
              CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
                   THEN h - CAST(18446744073709551616 AS HUGEINT)
                   ELSE h END AS BIGINT) AS fingerprint
            FROM fp WHERE i = n + 1
        """,
        "ann_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
                       WHERE vec_id < {N_ANN_QUERIES}),
            c AS (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id >= {N_ANN_QUERIES}),
            sims AS (
              SELECT q.query_id, c.vec_id,
                     list_cosine_similarity(q.embedding, c.embedding) AS sim
              FROM q CROSS JOIN c),
            ranked AS (
              SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id) AS rank
              FROM sims)
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= {ANN_K}
        """,
        "except_parts": f"""
            SELECT l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{SETOP_LO}'
              AND l_shipdate <  TIMESTAMP '{SETOP_MID}'
            EXCEPT ALL
            SELECT l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{SETOP_MID}'
              AND l_shipdate <  TIMESTAMP '{SETOP_HI}'
        """,
        "intersect_parts": f"""
            SELECT l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{SETOP_LO}'
              AND l_shipdate <  TIMESTAMP '{SETOP_MID}'
            INTERSECT ALL
            SELECT l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{SETOP_MID}'
              AND l_shipdate <  TIMESTAMP '{SETOP_HI}'
        """,
        "yoy_orders": f"""
            WITH a AS (
                SELECT o_custkey, count(*) AS cnt_a FROM orders
                WHERE o_orderdate >= TIMESTAMP '{SETOP_LO}'
                  AND o_orderdate <  TIMESTAMP '{SETOP_MID}'
                GROUP BY o_custkey
            ), b AS (
                SELECT o_custkey, count(*) AS cnt_b FROM orders
                WHERE o_orderdate >= TIMESTAMP '{SETOP_MID}'
                  AND o_orderdate <  TIMESTAMP '{SETOP_HI}'
                GROUP BY o_custkey
            )
            SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
                   cnt_a, cnt_b
            FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
        """,
        "hopping": f"""
            WITH e AS (SELECT epoch_us(ts) // {HOP_US} AS wi,
                              CAST(round(value*100, 0) AS BIGINT) AS v
                       FROM events),
            x AS (SELECT wi - unnest(range({HOP_K})) AS win, v FROM e)
            SELECT win * {HOP_US} AS win_start_us,
                   CAST(sum(v) AS BIGINT) AS value_cents,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM x GROUP BY win
        """,
        "approx_percentiles": f"""
            WITH s AS (SELECT l_returnflag AS k, l_extendedprice AS x
                       FROM lineitem),
            mm AS (SELECT k, min(x) AS lo, max(x) AS hi,
                          CAST(count(x) AS BIGINT) AS n
                   FROM s GROUP BY k),
            b AS (SELECT s.k,
                         CASE WHEN hi > lo THEN least(CAST(floor(
                             (x - lo) / (hi - lo) * {HQ_BINS}.0)
                             AS BIGINT), {HQ_BINS - 1})
                         ELSE 0 END AS bin
                  FROM s JOIN mm USING (k)),
            c AS (SELECT k, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
            cum AS (SELECT k, bin, CAST(sum(cnt) OVER (
                        PARTITION BY k ORDER BY bin) AS BIGINT) AS cum
                    FROM c)
            SELECT mm.k AS l_returnflag,
                   CASE WHEN hi > lo THEN lo + CAST((
                       SELECT min(bin) FROM cum
                       WHERE cum.k = mm.k
                         AND cum.cum >= (1*mm.n + 3) // 4) AS DOUBLE)
                       * ((hi - lo) / {HQ_BINS}.0) ELSE lo END AS p25,
                   CASE WHEN hi > lo THEN lo + CAST((
                       SELECT min(bin) FROM cum
                       WHERE cum.k = mm.k
                         AND cum.cum >= (1*mm.n + 1) // 2) AS DOUBLE)
                       * ((hi - lo) / {HQ_BINS}.0) ELSE lo END AS p50,
                   CASE WHEN hi > lo THEN lo + CAST((
                       SELECT min(bin) FROM cum
                       WHERE cum.k = mm.k
                         AND cum.cum >= (9*mm.n + 9) // 10) AS DOUBLE)
                       * ((hi - lo) / {HQ_BINS}.0) ELSE lo END AS p90,
                   CASE WHEN hi > lo THEN lo + CAST((
                       SELECT min(bin) FROM cum
                       WHERE cum.k = mm.k
                         AND cum.cum >= (99*mm.n + 99) // 100)
                       AS DOUBLE)
                       * ((hi - lo) / {HQ_BINS}.0) ELSE lo END AS p99,
                   mm.n
            FROM mm
        """,
        "lm_score": f"""
            WITH t AS (SELECT doc_id,
                              unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                  FROM t GROUP BY tok),
            tot AS (SELECT CAST(round(
                        ln(CAST(sum(c) AS DOUBLE)) * {LM_Q}.0, 0)
                    AS BIGINT) AS qn FROM c),
            q AS (SELECT tok, CAST(round(
                        ln(CAST(c AS DOUBLE)) * {LM_Q}.0, 0)
                    AS BIGINT) AS qc FROM c),
            d AS (SELECT t.doc_id,
                         CAST(count(*) AS BIGINT) AS n_tokens,
                         CAST(sum(q.qc) AS BIGINT) AS sum_qc
                  FROM t JOIN q USING (tok) GROUP BY t.doc_id)
            SELECT d.doc_id, d.n_tokens,
                   d.sum_qc - d.n_tokens * tot.qn AS logprob_q,
                   CAST(d.sum_qc - d.n_tokens * tot.qn AS DOUBLE)
                     / CAST(d.n_tokens * {LM_Q} AS DOUBLE) AS score
            FROM d, tot
        """,
        "dedup_spans": f"""
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr
                       FROM documents),
            p AS (SELECT doc_id, arr,
                         unnest(range(len(arr) - {SPAN_N - 1})) AS pos
                  FROM d WHERE len(arr) >= {SPAN_N}),
            g AS (SELECT doc_id, pos,
                         array_to_string(
                             arr[pos+1: pos+{SPAN_N}], ' ') AS gram
                  FROM p),
            banned AS (SELECT gram FROM g GROUP BY gram
                       HAVING count(*) > {SPAN_MAX_OCC}),
            cov AS (SELECT DISTINCT doc_id, cpos FROM (
                SELECT doc_id, pos + unnest(range({SPAN_N})) AS cpos
                FROM g WHERE gram IN (SELECT gram FROM banned))),
            t AS (SELECT doc_id, unnest(arr) AS tok,
                         unnest(range(len(arr))) AS pos
                  FROM d),
            kept AS (SELECT t.doc_id, t.tok, t.pos
                     FROM t LEFT JOIN cov
                       ON t.doc_id = cov.doc_id AND t.pos = cov.cpos
                     WHERE cov.doc_id IS NULL),
            agg AS (SELECT doc_id,
                           string_agg(tok, ' ' ORDER BY pos)
                             AS text_clean,
                           count(*) AS n_kept
                    FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(a.text_clean, '') AS text_clean,
                   CAST(len(d.arr) - COALESCE(a.n_kept, 0) AS BIGINT)
                     AS n_removed
            FROM d LEFT JOIN agg a USING (doc_id)
        """,
        "upsert": f"""
            WITH chg AS (
                SELECT c_custkey, c_acctbal + 1000.0 AS c_acctbal,
                       c_nationkey, (c_custkey % 11 = 0) AS del
                FROM customer
                WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 0
                UNION ALL
                SELECT c_custkey + {UPS_OFF},
                       CAST(c_custkey AS DOUBLE) * 0.25,
                       CAST(c_custkey % 25 AS INTEGER), FALSE
                FROM customer WHERE c_custkey % 13 = 0
            )
            SELECT COALESCE(g.c_custkey, c.c_custkey) AS c_custkey,
                   CASE WHEN g.c_custkey IS NOT NULL
                        THEN g.c_acctbal ELSE c.c_acctbal
                   END AS c_acctbal,
                   CASE WHEN g.c_custkey IS NOT NULL
                        THEN g.c_nationkey ELSE c.c_nationkey
                   END AS c_nationkey
            FROM customer c FULL OUTER JOIN chg g
              ON c.c_custkey = g.c_custkey
            WHERE NOT COALESCE(g.del, FALSE)
        """,
        "forecast_revenue": f"""
            WITH r AS (
              SELECT CAST(round(l_extendedprice*100, 0) AS BIGINT)
                       * CAST(round(l_discount*100, 0) AS BIGINT)
                       AS rev_u
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '{SETOP_LO}'
                AND l_shipdate <  TIMESTAMP '{SETOP_MID}'
                AND CAST(round(l_discount*100, 0) AS BIGINT)
                    BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
                AND l_quantity < {Q6_QTY})
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(CAST(sum(rev_u) AS HUGEINT) AS DOUBLE)
                     AS revenue_u
            FROM r
        """,
        "regression": """
            WITH e AS (SELECT event_type,
                    epoch_us(ts) // 86400000000 AS x,
                    CAST(round(value*100, 0) AS BIGINT) AS y
               FROM events),
            a AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                    CAST(sum(x) AS HUGEINT) AS sx,
                    CAST(sum(y) AS HUGEINT) AS sy,
                    CAST(sum(x*x) AS HUGEINT) AS sxx,
                    CAST(sum(x*y) AS HUGEINT) AS sxy
                  FROM e GROUP BY event_type)
            SELECT event_type, CAST(n AS BIGINT) AS n,
               CASE WHEN n*sxx - sx*sx <> 0 THEN
                 CAST(n*sxy - sx*sy AS DOUBLE)
                   / CAST(n*sxx - sx*sx AS DOUBLE) END AS slope,
               CASE WHEN n*sxx - sx*sx <> 0 THEN
                 CAST(sy*sxx - sx*sxy AS DOUBLE)
                   / CAST(n*sxx - sx*sx AS DOUBLE) END AS intercept
            FROM a ORDER BY event_type
        """,
        "autocorr": """
            WITH v AS (SELECT user_id, ts, event_id,
                    CAST(round(value*100, 0) AS BIGINT) AS y
               FROM events),
            p AS (SELECT user_id, y,
                    lag(y) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS x
                  FROM v),
            a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS m,
                    CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(y) AS BIGINT) AS sy,
                    CAST(sum(x*x) AS BIGINT) AS sxx,
                    CAST(sum(y*y) AS BIGINT) AS syy,
                    CAST(sum(x*y) AS BIGINT) AS sxy
                  FROM p WHERE x IS NOT NULL GROUP BY user_id
                  HAVING count(*) >= 2)
            SELECT user_id, m,
               m*sxy - sx*sy AS num,
               m*sxx - sx*sx AS d1,
               m*syy - sy*sy AS d2,
               CASE WHEN m*sxx - sx*sx > 0 AND m*syy - sy*sy > 0 THEN
                 CAST(m*sxy - sx*sy AS DOUBLE)
                   / sqrt(CAST(m*sxx - sx*sx AS DOUBLE)
                          * CAST(m*syy - sy*sy AS DOUBLE))
               END AS r
            FROM a ORDER BY user_id
        """,
        "geomean": """
            WITH e AS (SELECT event_type,
                    CAST(floor(ln(CAST(CAST(round(value*100, 0)
                                             AS BIGINT) AS DOUBLE))
                               * 1073741824.0) AS BIGINT) AS q
               FROM events
               WHERE CAST(round(value*100, 0) AS BIGINT) > 0)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(q) AS BIGINT) AS qlogsum,
                   CAST(CAST(sum(q) AS BIGINT) AS DOUBLE)
                     / CAST(count(*) * 1073741824 AS DOUBLE)
                     AS log_gmean
            FROM e GROUP BY event_type ORDER BY event_type
        """,
        "session_paths": f"""
            WITH ordered AS (
              SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > {int(SPATH_GAP_MIN * 60 * 1_000_000)}
                     THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts, event_id)),
            tagged AS (
              SELECT *, sum(is_new) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid
              FROM ordered),
            paths AS (
              SELECT user_id, sid,
                     string_agg(event_type, ' '
                                ORDER BY ts, event_id) AS path
              FROM tagged GROUP BY user_id, sid)
            SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            FROM paths GROUP BY path
            HAVING count(*) >= {SPATH_MIN_COUNT}
            ORDER BY path
        """,
        "link_pred": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            e0 AS (
              SELECT doc_id AS i, (doc_id + 1) % nn.n AS j
              FROM documents, nn
              UNION ALL
              SELECT doc_id, (doc_id + 2) % nn.n FROM documents, nn
              UNION ALL
              SELECT doc_id, (doc_id * 7 + 3) % nn.n
              FROM documents, nn),
            sym AS (SELECT i AS w, j AS x FROM e0 WHERE i <> j
                    UNION
                    SELECT j, i FROM e0 WHERE i <> j),
            deg AS (SELECT w AS node, count(*) AS deg
                    FROM sym GROUP BY w),
            cn AS (SELECT s1.x AS a, s2.x AS b,
                          CAST(count(*) AS BIGINT) AS common
                   FROM sym s1 JOIN sym s2
                     ON s1.w = s2.w AND s1.x < s2.x
                   GROUP BY s1.x, s2.x HAVING count(*) >= 2),
            adj AS (SELECT DISTINCT least(w, x) AS a,
                           greatest(w, x) AS b FROM sym),
            cand AS (SELECT cn.a, cn.b, cn.common FROM cn
                     LEFT JOIN adj
                       ON cn.a = adj.a AND cn.b = adj.b
                     WHERE adj.a IS NULL)
            SELECT cand.a, cand.b, common,
                   CAST(d1.deg AS BIGINT) AS da,
                   CAST(d2.deg AS BIGINT) AS db,
                   CAST(common AS DOUBLE)
                     / CAST(d1.deg + d2.deg - common AS DOUBLE)
                     AS jaccard
            FROM cand
            JOIN deg d1 ON cand.a = d1.node
            JOIN deg d2 ON cand.b = d2.node
            ORDER BY cand.a, cand.b
        """,
        # rolling_median: the window holds exact int cents < 2^52, so
        # DuckDB's quantile_cont(0.5) interpolation (lo·(1−f)+hi·f,
        # f=0.5) and the engine's lo+(hi−lo)·0.5 both equal the exact
        # dyadic (lo+hi)/2 — bit-identical despite different dags.
        "rolling_median": f"""
            SELECT event_id, user_id, ts,
                   quantile_cont(CAST(round(value * 100, 0) AS BIGINT),
                                 0.5) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {RMED_WINDOW - 1} PRECEDING
                          AND CURRENT ROW
                   ) AS med
            FROM events
        """,
        "ab_test": """
            WITH v AS (SELECT event_type, user_id % 2 AS cohort,
                              CAST(round(value * 100, 0) AS BIGINT)
                                AS val
                       FROM events),
            m AS (SELECT event_type,
                    CAST(count(*) FILTER (cohort = 0) AS HUGEINT) AS n0,
                    CAST(count(*) FILTER (cohort = 1) AS HUGEINT) AS n1,
                    CAST(coalesce(sum(val) FILTER (cohort = 0), 0)
                         AS HUGEINT) AS s0,
                    CAST(coalesce(sum(val) FILTER (cohort = 1), 0)
                         AS HUGEINT) AS s1,
                    CAST(coalesce(sum(val * val) FILTER (cohort = 0), 0)
                         AS HUGEINT) AS q0,
                    CAST(coalesce(sum(val * val) FILTER (cohort = 1), 0)
                         AS HUGEINT) AS q1
                  FROM v GROUP BY event_type)
            SELECT event_type,
                   CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
                   CASE WHEN n0 > 0 THEN
                     CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                   END AS mean0,
                   CASE WHEN n1 > 0 THEN
                     CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   END AS mean1,
                   CASE WHEN n0 >= 2 AND n1 >= 2 AND
                     ((n1 * q1 - s1 * s1) * n0
                      + (n0 * q0 - s0 * s0) * n1) * (n0 + n1) > 0
                   THEN
                     CAST((s1 * n0 - s0 * n1) * (s1 * n0 - s0 * n1)
                          * (n0 + n1 - 2) AS DOUBLE)
                     / CAST(((n1 * q1 - s1 * s1) * n0
                             + (n0 * q0 - s0 * s0) * n1)
                            * (n0 + n1) AS DOUBLE)
                   END AS tsq
            FROM m ORDER BY event_type
        """,
        "growth": """
            WITH d AS (
              SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                          AS BIGINT) AS rev
              FROM events GROUP BY event_type, day)
            SELECT event_type, day, rev,
                   CASE WHEN prev IS NOT NULL AND prev <> 0 THEN
                     CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE)
                   END AS growth
            FROM (SELECT event_type, day, rev,
                         lag(rev) OVER (PARTITION BY event_type
                                        ORDER BY day) AS prev
                  FROM d)
            ORDER BY event_type, day
        """,
        "embed_quant": f"""
            WITH v AS (SELECT
                         CAST(unnest(embedding) AS DOUBLE) AS v,
                         CAST(generate_subscripts(embedding, 1)
                              AS BIGINT) AS dim
                       FROM embeddings),
            mm AS (SELECT dim, min(v) AS vmin, max(v) AS vmax
                   FROM v GROUP BY dim),
            c AS (SELECT v.dim,
                         CAST(least(floor((v.v - mm.vmin) * 255.0
                                          / (mm.vmax - mm.vmin)),
                                    CAST({EQ_CODES} AS DOUBLE))
                              AS BIGINT) AS code
                  FROM v JOIN mm ON v.dim = mm.dim)
            SELECT mm.dim, mm.vmin, mm.vmax, nc.n_codes
            FROM mm JOIN (SELECT dim,
                                 CAST(count(DISTINCT code) AS BIGINT)
                                   AS n_codes
                          FROM c GROUP BY dim) nc
              ON mm.dim = nc.dim
            ORDER BY mm.dim
        """,
        "nb_train": f"""
            WITH tok AS (SELECT lang,
                                unnest(string_split(text, ' ')) AS token
                         FROM documents),
            c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
                  FROM tok GROUP BY lang, token),
            nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
                   FROM tok GROUP BY lang),
            v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
                  FROM tok)
            SELECT c.lang, c.token, c.c,
                   CAST(floor(ln(CAST(c.c + {NB_ALPHA} AS DOUBLE))
                              * 1073741824.0) AS BIGINT)
                   - CAST(floor(ln(CAST(nl.nl + {NB_ALPHA} * v.v
                                         AS DOUBLE))
                                * 1073741824.0) AS BIGINT) AS qlogp
            FROM c JOIN nl ON c.lang = nl.lang, v
            ORDER BY c.lang, c.token
        """,
        # nb_classify: score = Σ qnum_present − n_tokens·qden (absent
        # tokens contribute qlog(alpha)=0 under alpha=1); argmax class
        # with min(lang) tie-break — exact int64 end to end.
        "nb_classify": f"""
            WITH tok AS (SELECT doc_id,
                                unnest(string_split(text, ' ')) AS token
                         FROM documents),
            ltok AS (SELECT lang,
                            unnest(string_split(text, ' ')) AS token
                     FROM documents),
            c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
                  FROM ltok GROUP BY lang, token),
            nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
                   FROM ltok GROUP BY lang),
            v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
                  FROM ltok),
            qd AS (SELECT nl.lang,
                          CAST(floor(ln(CAST(nl.nl + {NB_ALPHA} * v.v
                                              AS DOUBLE))
                                     * 1073741824.0) AS BIGINT) AS qden
                   FROM nl, v),
            ml AS (SELECT lang, token,
                          CAST(floor(ln(CAST(c + {NB_ALPHA} AS DOUBLE))
                                     * 1073741824.0) AS BIGINT) AS qnum
                   FROM c),
            sc AS (SELECT t.doc_id, qd.lang,
                          sum(coalesce(ml.qnum, 0) - qd.qden) AS score
                   FROM tok t CROSS JOIN qd
                   LEFT JOIN ml ON ml.lang = qd.lang
                                AND ml.token = t.token
                   GROUP BY t.doc_id, qd.lang),
            best AS (SELECT doc_id, max(score) AS mx
                     FROM sc GROUP BY doc_id)
            SELECT sc.doc_id, min(sc.lang) AS pred,
                   CAST(best.mx AS BIGINT) AS score
            FROM sc JOIN best ON sc.doc_id = best.doc_id
                             AND sc.score = best.mx
            GROUP BY sc.doc_id, best.mx
            ORDER BY sc.doc_id
        """,
        "raster_open": f"""
            WITH cells AS (
              SELECT CAST(i % {1 << MORPH_RES} AS BIGINT) AS cx,
                     CAST(i // {1 << MORPH_RES} AS BIGINT) AS cy,
                     CAST((i % {1 << MORPH_RES})
                          * {EXTENT // (1 << MORPH_RES)} AS DOUBLE)
                       AS x0,
                     CAST((i // {1 << MORPH_RES})
                          * {EXTENT // (1 << MORPH_RES)} AS DOUBLE)
                       AS y0
              FROM range({(1 << MORPH_RES) ** 2}) t(i)),
            dist AS (SELECT * FROM {districts_sql(N_DISTRICTS)} ),
            mask AS (
              SELECT d.district_id, c.cx, c.cy
              FROM cells c JOIN dist d
                ON c.x0 < d.maxx
               AND c.x0 + {EXTENT // (1 << MORPH_RES)} > d.minx
               AND c.y0 < d.maxy
               AND c.y0 + {EXTENT // (1 << MORPH_RES)} > d.miny
              WHERE greatest(0.0,
                      least(c.x0 + {EXTENT // (1 << MORPH_RES)},
                            d.maxx) - greatest(c.x0, d.minx))
                  * greatest(0.0,
                      least(c.y0 + {EXTENT // (1 << MORPH_RES)},
                            d.maxy) - greatest(c.y0, d.miny))
                  >= {0.5 * (EXTENT / (1 << MORPH_RES)) ** 2}),
            off(dx, dy) AS (VALUES (0, 0), (1, 0), (-1, 0), (0, 1),
                                   (0, -1)),
            er AS (SELECT m.district_id, m.cx, m.cy
                   FROM mask m JOIN off o ON true
                   JOIN mask n
                     ON n.district_id = m.district_id
                    AND n.cx = m.cx + o.dx AND n.cy = m.cy + o.dy
                   GROUP BY m.district_id, m.cx, m.cy
                   HAVING count(*) = 5)
            SELECT DISTINCT e.district_id,
                   CAST(e.cx + o.dx AS BIGINT) AS cx,
                   CAST(e.cy + o.dy AS BIGINT) AS cy
            FROM er e JOIN off o ON true
            WHERE e.cx + o.dx BETWEEN 0 AND {(1 << MORPH_RES) - 1}
              AND e.cy + o.dy BETWEEN 0 AND {(1 << MORPH_RES) - 1}
            ORDER BY district_id, cx, cy
        """,
        "iqr_outliers": """
            WITH v AS (SELECT event_type AS k,
                              CAST(round(value * 100, 0) AS BIGINT) AS v
                       FROM events),
            q AS (SELECT k, quantile_disc(v, 0.25) AS q1,
                         quantile_disc(v, 0.75) AS q3
                  FROM v GROUP BY k)
            SELECT q.k AS event_type, q.q1, q.q3,
                   CAST(count(*) FILTER
                        (2 * v.v < 5 * q.q1 - 3 * q.q3) AS BIGINT)
                     AS n_low,
                   CAST(count(*) FILTER
                        (2 * v.v > 5 * q.q3 - 3 * q.q1) AS BIGINT)
                     AS n_high
            FROM v JOIN q ON v.k = q.k
            GROUP BY q.k, q.q1, q.q3
            ORDER BY event_type
        """,
        # zorder_parts: the Morton interleave is the same unrolled
        # shift/mask dag as ops/tiling.morton_key (bits disjoint so
        # + == |); rank ntile cut is exact integer arithmetic
        "zorder_parts": f"""
            WITH pts AS (
              SELECT doc_id,
                     ((doc_id * {AX} + {BX}) % {EXTENT})
                       // {EXTENT >> ZORD_RES} AS cx,
                     ((doc_id * {AY} + {BY}) % {EXTENT})
                       // {EXTENT >> ZORD_RES} AS cy
              FROM documents),
            mk AS (SELECT doc_id,
                          {" + ".join(
                              f"(((cx >> {b}) & 1) << {2 * b + 1})"
                              f" + (((cy >> {b}) & 1) << {2 * b})"
                              for b in range(ZORD_RES)
                          )} AS mkey
                   FROM pts),
            rk AS (SELECT mkey,
                          row_number() OVER (ORDER BY mkey, doc_id)
                            AS rn,
                          count(*) OVER () AS n
                   FROM mk)
            SELECT CAST((rn - 1) * {ZORD_PARTS} // n AS BIGINT)
                     AS part,
                   CAST(min(mkey) AS BIGINT) AS mkey_min,
                   CAST(max(mkey) AS BIGINT) AS mkey_max,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM rk GROUP BY part ORDER BY part
        """,
        # assign_donut: hole bounds are integer quarter-offsets of the
        # integral rect coords; points are half-integer so strict
        # hole-interior comparisons have no boundary cases
        "assign_donut": f"""
            WITH dist AS (SELECT * FROM {districts_sql(N_DISTRICTS)} )
            SELECT doc_id, district_id
            FROM documents, dist
            WHERE {_points_expr()[0]} >= minx
              AND {_points_expr()[0]} < maxx
              AND {_points_expr()[1]} >= miny
              AND {_points_expr()[1]} < maxy
              AND NOT (
                {_points_expr()[0]} > minx
                  + (CAST(maxx AS BIGINT) - CAST(minx AS BIGINT)) // 4
                AND {_points_expr()[0]} < maxx
                  - (CAST(maxx AS BIGINT) - CAST(minx AS BIGINT)) // 4
                AND {_points_expr()[1]} > miny
                  + (CAST(maxy AS BIGINT) - CAST(miny AS BIGINT)) // 4
                AND {_points_expr()[1]} < maxy
                  - (CAST(maxy AS BIGINT) - CAST(miny AS BIGINT)) // 4
              )
        """,
        "session_len_pct": """
            WITH ordered AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 30*60*1000000
                     THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            tagged AS (
              SELECT user_id, ts,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING)
                  AS session_id
              FROM ordered),
            s AS (SELECT user_id, session_id,
                         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur
                  FROM tagged GROUP BY user_id, session_id)
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(quantile_disc(dur, 0.5) AS BIGINT) AS p50,
                   CAST(quantile_disc(dur, 0.9) AS BIGINT) AS p90,
                   CAST(quantile_disc(dur, 0.99) AS BIGINT) AS p99
            FROM s
        """,
        "rolling_channel": f"""
            SELECT event_id, user_id, ts,
                   min(CAST(round(value * 100, 0) AS BIGINT)) OVER w
                     AS vmin,
                   max(CAST(round(value * 100, 0) AS BIGINT)) OVER w
                     AS vmax
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {RMED_WINDOW - 1} PRECEDING
                              AND CURRENT ROW)
        """,
        "top2_share": """
            WITH uv AS (SELECT event_type, user_id,
                               CAST(sum(CAST(round(value * 100, 0)
                                             AS BIGINT)) AS BIGINT)
                                 AS v
                        FROM events GROUP BY event_type, user_id),
            r AS (SELECT event_type, user_id, v,
                         row_number() OVER (PARTITION BY event_type
                           ORDER BY v DESC, user_id) AS rn,
                         sum(v) OVER (PARTITION BY event_type) AS tot
                  FROM uv)
            SELECT event_type,
                   CAST(max(CASE WHEN rn = 1 THEN user_id END)
                        AS BIGINT) AS top_user1,
                   CAST(max(CASE WHEN rn = 2 THEN user_id END)
                        AS BIGINT) AS top_user2,
                   CAST(sum(CASE WHEN rn <= 2 THEN v ELSE 0 END)
                        AS BIGINT) AS top2_rev,
                   CAST(max(tot) AS BIGINT) AS total_rev,
                   CAST(sum(CASE WHEN rn <= 2 THEN v ELSE 0 END)
                        AS DOUBLE) / CAST(max(tot) AS DOUBLE)
                     AS share
            FROM r GROUP BY event_type ORDER BY event_type
        """,
        "pow2_hist": """
            WITH v AS (SELECT event_type,
                              CAST(round(value * 100, 0) AS BIGINT)
                                AS v
                       FROM events)
            SELECT event_type,
                   CAST(CASE WHEN v < 1 THEN -1
                             ELSE length(bin(v)) - 1 END
                        AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS v
            FROM v GROUP BY event_type, bucket
            ORDER BY event_type, bucket
        """,
        "peak_concurrency": f"""
            WITH iv AS (SELECT event_type, event_id,
                               epoch_us(ts) AS s,
                               epoch_us(ts) + {CONCUR_WIN_US} AS e
                        FROM events),
            pts AS (SELECT event_type, s AS t, 1 AS d, event_id AS i
                    FROM iv
                    UNION ALL
                    SELECT event_type, e, -1, event_id FROM iv),
            w AS (SELECT event_type, t,
                         sum(d) OVER (PARTITION BY event_type
                           ORDER BY t, d, i
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS depth
                  FROM pts),
            m AS (SELECT event_type, max(depth) AS pk
                  FROM w GROUP BY event_type)
            SELECT w.event_type, CAST(m.pk AS BIGINT) AS peak,
                   CAST(min(w.t) AS BIGINT) AS peak_ts
            FROM w JOIN m ON w.event_type = m.event_type
                         AND w.depth = m.pk
            GROUP BY w.event_type, m.pk
            ORDER BY w.event_type
        """,
        "user_growth": """
            WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
                       FROM events GROUP BY user_id),
            c AS (SELECT d0 AS day,
                         CAST(count(*) AS BIGINT) AS new_users
                  FROM f GROUP BY d0)
            SELECT day, new_users,
                   CAST(sum(new_users) OVER (ORDER BY day)
                        AS BIGINT) AS cum_users
            FROM c ORDER BY day
        """,
        "district_image_quality": f"""
            WITH imgs AS (
              SELECT doc_id * {IMG_MULT} + k AS idx,
                     CAST((CAST(doc_id * {IMG_MULT} + k AS HUGEINT)
                           * {0x9E3779B97F4A7C15})
                          % 9223372036854775808 AS BIGINT) AS p
              FROM documents,
                   (SELECT unnest(range(0, {IMG_MULT})) AS k)),
            ipts AS (
              SELECT idx,
                     CAST(({" + ".join(
                         f"((p >> {2 * k}) & 1) * {1 << k}"
                         for k in range(20))}) AS DOUBLE) + 0.5 AS x,
                     CAST(({" + ".join(
                         f"((p >> {2 * k + 1}) & 1) * {1 << k}"
                         for k in range(20))}) AS DOUBLE) + 0.5 AS y
              FROM imgs),
            bs AS (SELECT unnest(range(0, 256)) AS base),
            ps AS (SELECT unnest(range(0, 256)) AS pp),
            g AS (
              SELECT bs.base, ps.pp // 16 AS r, ps.pp % 16 AS c,
                     (bs.base + 97 * (3 * ps.pp + 0)) % 256
                     + (bs.base + 97 * (3 * ps.pp + 1)) % 256
                     + (bs.base + 97 * (3 * ps.pp + 2)) % 256 AS gv
              FROM bs, ps),
            hx AS (
              SELECT g1.base, sum(abs(g2.gv - g1.gv)) AS s
              FROM g g1 JOIN g g2
                ON g2.base = g1.base AND g2.r = g1.r
                   AND g2.c = g1.c + 1
              GROUP BY g1.base),
            vy AS (
              SELECT g1.base, sum(abs(g2.gv - g1.gv)) AS s
              FROM g g1 JOIN g g2
                ON g2.base = g1.base AND g2.c = g1.c
                   AND g2.r = g1.r + 1
              GROUP BY g1.base),
            sb AS (
              SELECT hx.base, CAST(hx.s + vy.s AS BIGINT) AS sharpness
              FROM hx JOIN vy ON vy.base = hx.base),
            dist AS (SELECT * FROM {districts_sql(N_DISTRICTS)} ),
            a AS (
              SELECT d.district_id, i.idx
              FROM ipts i JOIN dist d
                ON i.x >= d.minx AND i.x < d.maxx
               AND i.y >= d.miny AND i.y < d.maxy)
            SELECT a.district_id,
                   CAST(count(*) AS BIGINT) AS n_images,
                   CAST(sum(sb.sharpness) AS BIGINT) AS total_sharp
            FROM a JOIN sb
              ON sb.base = (a.idx * 2654435761 + 42) % 256
            GROUP BY a.district_id ORDER BY a.district_id
        """,
        "quarantine": f"""
            SELECT event_id, 'value_range' AS rule FROM events
            WHERE value > {DQ_VALUE_MAX}
            UNION ALL
            SELECT event_id, 'micro_value' FROM events
            WHERE value < 1.0
            UNION ALL
            SELECT event_id, 'weekend' FROM events
            WHERE (epoch_us(ts) // 86400000000) % 7 >= 5
        """,
        "transition_support": """
            WITH o AS (SELECT user_id, event_type,
                              lead(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
                       FROM events)
            SELECT event_type AS src, nxt AS dst,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n
            FROM o WHERE nxt IS NOT NULL
            GROUP BY src, dst ORDER BY src, dst
        """,
        "powerlaw": """
            WITH b AS (SELECT l_orderkey,
                              CAST(count(*) AS BIGINT) AS n_items
                       FROM lineitem GROUP BY l_orderkey),
            h AS (SELECT n_items, CAST(count(*) AS BIGINT) AS n_orders
                  FROM b GROUP BY n_items),
            q AS (SELECT CAST(floor(ln(CAST(n_items AS DOUBLE))
                                    * 1073741824.0) AS BIGINT) AS x,
                         CAST(floor(ln(CAST(n_orders AS DOUBLE))
                                    * 1073741824.0) AS BIGINT) AS y
                  FROM h),
            m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                         CAST(sum(x) AS HUGEINT) AS sx,
                         CAST(sum(y) AS HUGEINT) AS sy,
                         sum(CAST(x AS HUGEINT) * y) AS sxy,
                         sum(CAST(x AS HUGEINT) * x) AS sxx
                  FROM q)
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
                   CAST(sy * sxx - sx * sxy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) AS icept
            FROM m
        """,
        "gini_splits": """
            WITH s AS (SELECT event_type AS k, user_id % 2 AS y,
                              CAST(round(value * 100, 0) AS BIGINT)
                                AS v
                       FROM events),
            d AS (SELECT k, v, CAST(sum(y) AS BIGINT) AS c1,
                         CAST(sum(1 - y) AS BIGINT) AS c0
                  FROM s GROUP BY k, v),
            c AS (SELECT k, v,
                         sum(c1 + c0) OVER w AS n_l,
                         sum(c1) OVER w AS m1,
                         sum(c0) OVER w AS m0,
                         sum(c1 + c0) OVER (PARTITION BY k) AS n,
                         sum(c1) OVER (PARTITION BY k) AS t1,
                         sum(c0) OVER (PARTITION BY k) AS t0
                  FROM d
                  WINDOW w AS (PARTITION BY k ORDER BY v))
            SELECT k AS event_type, v AS threshold,
                   CAST(n_l AS BIGINT) AS n_l,
                   CAST(n - n_l AS BIGINT) AS n_r,
                   CAST(CAST(n_l AS HUGEINT) * n_l
                        - CAST(m1 AS HUGEINT) * m1
                        - CAST(m0 AS HUGEINT) * m0 AS BIGINT)
                     AS gl_num,
                   CAST(CAST(n - n_l AS HUGEINT) * (n - n_l)
                        - CAST(t1 - m1 AS HUGEINT) * (t1 - m1)
                        - CAST(t0 - m0 AS HUGEINT) * (t0 - m0)
                        AS BIGINT) AS gr_num
            FROM c WHERE n - n_l > 0
            ORDER BY k, v
        """,
        "revenue_deciles": """
            WITH s AS (SELECT event_type, event_id,
                              CAST(round(value * 100, 0) AS BIGINT)
                                AS v
                       FROM events),
            t AS (SELECT event_type, v,
                         ntile(10) OVER (PARTITION BY event_type
                                         ORDER BY v, event_id)
                           AS decile
                  FROM s)
            SELECT event_type, CAST(decile AS BIGINT) AS decile,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS rev
            FROM t GROUP BY event_type, decile
            ORDER BY event_type, decile
        """,
        # district_dispersion: 2·px = 2·((k·a+b) mod E) + 1 is integer,
        # so all moments are exact; r2_mean is the ONE mirrored division
        "district_dispersion": f"""
            WITH dist AS (SELECT * FROM {districts_sql(N_DISTRICTS)} ),
            a AS (
              SELECT district_id,
                     2 * ((doc_id * {AX} + {BX}) % {EXTENT}) + 1 AS x2,
                     2 * ((doc_id * {AY} + {BY}) % {EXTENT}) + 1 AS y2
              FROM documents, dist
              WHERE {_points_expr()[0]} >= minx
                AND {_points_expr()[0]} < maxx
                AND {_points_expr()[1]} >= miny
                AND {_points_expr()[1]} < maxy),
            m AS (SELECT district_id,
                         CAST(count(*) AS HUGEINT) AS n,
                         CAST(sum(x2) AS HUGEINT) AS sx,
                         CAST(sum(x2 * x2) AS HUGEINT) AS sxx,
                         CAST(sum(y2) AS HUGEINT) AS sy,
                         CAST(sum(y2 * y2) AS HUGEINT) AS syy
                  FROM a GROUP BY district_id)
            SELECT district_id, CAST(n AS BIGINT) AS n,
                   CAST(n * sxx - sx * sx AS BIGINT) AS vx_num,
                   CAST(n * syy - sy * sy AS BIGINT) AS vy_num,
                   CAST((n * sxx - sx * sx) + (n * syy - sy * sy)
                        AS DOUBLE)
                     / CAST(4 * n * n AS DOUBLE) AS r2_mean
            FROM m ORDER BY district_id
        """,
        "winback": f"""
            WITH d AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day
                       FROM events),
            g AS (SELECT user_id, day,
                         lag(day) OVER (PARTITION BY user_id
                                        ORDER BY day) AS prev
                  FROM d),
            h AS (SELECT user_id, prev AS dormant, day AS react,
                         day - prev AS gap
                  FROM g
                  WHERE prev IS NOT NULL
                    AND day - prev >= {WINBACK_DAYS}),
            f AS (SELECT user_id, min(react) AS react_min
                  FROM h GROUP BY user_id)
            SELECT h.user_id,
                   DATE '1970-01-01' + CAST(h.dormant AS INTEGER)
                     AS dormant_day,
                   DATE '1970-01-01' + CAST(h.react AS INTEGER)
                     AS react_day,
                   CAST(h.gap AS BIGINT) AS gap_days
            FROM h JOIN f ON h.user_id = f.user_id
                         AND h.react = f.react_min
            ORDER BY h.user_id
        """,
        "components": f"""
            WITH RECURSIVE
            nn AS (SELECT count(*) AS n FROM documents),
            e0 AS (
              SELECT doc_id AS i, doc_id + 1 AS j FROM documents, nn
              WHERE doc_id % {CHAIN_BLOCK} <> {CHAIN_BLOCK - 1}
                AND doc_id + 1 < nn.n
              UNION ALL
              SELECT doc_id, doc_id + 2 FROM documents, nn
              WHERE doc_id % {CHAIN_BLOCK} < {CHAIN_BLOCK - 2}
                AND doc_id + 2 < nn.n),
            e AS (SELECT i, j FROM e0 UNION SELECT j, i FROM e0),
            reach(s, d) AS (
              SELECT i, j FROM e
              UNION
              SELECT r.s, e.j FROM reach r JOIN e ON r.d = e.i)
            SELECT s AS node, least(s, min(d)) AS component
            FROM reach GROUP BY s ORDER BY node
        """,
        "reorder_gaps": """
            WITH d AS (SELECT DISTINCT o_custkey,
                              epoch_us(o_orderdate) // 86400000000
                                AS day
                       FROM orders),
            g AS (SELECT o_custkey,
                         day - lag(day) OVER (PARTITION BY o_custkey
                                              ORDER BY day) AS gap
                  FROM d)
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(quantile_disc(gap, 0.5) AS BIGINT) AS med_gap
            FROM g WHERE gap IS NOT NULL
            GROUP BY o_custkey ORDER BY o_custkey
        """,
        "mannwhitney": """
            WITH s AS (SELECT user_id % 2 AS side,
                              CAST(round(value * 100, 0) AS BIGINT)
                                AS v
                       FROM events),
            d AS (SELECT v, CAST(sum(side) AS BIGINT) AS c1,
                         CAST(sum(1 - side) AS BIGINT) AS c0
                  FROM s GROUP BY v),
            c AS (SELECT v, c1, c0,
                         coalesce(sum(c1 + c0) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cumb
                  FROM d),
            n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                         CAST(sum(c0) AS BIGINT) AS n0
                  FROM d)
            SELECT n.n1, n.n0,
                   CAST(sum(CAST(c1 AS HUGEINT)
                            * (2 * cumb + c1 + c0 + 1))
                        - CAST(n.n1 AS HUGEINT) * (n.n1 + 1)
                        AS BIGINT) AS u2,
                   CAST(sum(CAST(c1 AS HUGEINT)
                            * (2 * cumb + c1 + c0 + 1))
                        - CAST(n.n1 AS HUGEINT) * (n.n1 + 1)
                        AS DOUBLE) / 2.0 AS u
            FROM c, n GROUP BY n.n1, n.n0
        """,
        "basket_hist": """
            WITH b AS (SELECT l_orderkey,
                              CAST(count(*) AS BIGINT) AS n_items
                       FROM lineitem GROUP BY l_orderkey)
            SELECT n_items, CAST(count(*) AS BIGINT) AS n_orders
            FROM b GROUP BY n_items ORDER BY n_items
        """,
        "ks_test": """
            WITH s AS (SELECT doc_id % 2 AS side, n_chars AS v
                       FROM documents),
            n AS (SELECT CAST(sum(side) AS BIGINT) AS n1,
                         CAST(sum(1 - side) AS BIGINT) AS n0
                  FROM s),
            d AS (SELECT v, CAST(sum(side) AS BIGINT) AS c1,
                         CAST(sum(1 - side) AS BIGINT) AS c0
                  FROM s GROUP BY v),
            c AS (SELECT v,
                         sum(c1) OVER (ORDER BY v) AS f1,
                         sum(c0) OVER (ORDER BY v) AS f0
                  FROM d)
            SELECT n.n1, n.n0,
                   CAST(max(abs(CAST(f1 AS HUGEINT) * n.n0
                                - CAST(f0 AS HUGEINT) * n.n1))
                        AS BIGINT) AS d_num,
                   CAST(max(abs(CAST(f1 AS HUGEINT) * n.n0
                                - CAST(f0 AS HUGEINT) * n.n1))
                        AS DOUBLE)
                     / CAST(n.n1 * n.n0 AS DOUBLE) AS d
            FROM c, n GROUP BY n.n1, n.n0
        """,
        "focal_stats": f"""
            WITH cells AS (
              SELECT CAST(i % {1 << MORPH_RES} AS BIGINT) AS cx,
                     CAST(i // {1 << MORPH_RES} AS BIGINT) AS cy,
                     CAST((i % {1 << MORPH_RES})
                          * {EXTENT // (1 << MORPH_RES)} AS DOUBLE)
                       AS x0,
                     CAST((i // {1 << MORPH_RES})
                          * {EXTENT // (1 << MORPH_RES)} AS DOUBLE)
                       AS y0
              FROM range({(1 << MORPH_RES) ** 2}) t(i)),
            dist AS (SELECT * FROM {districts_sql(N_DISTRICTS)} ),
            mask AS (
              SELECT d.district_id, c.cx, c.cy,
                     (c.cx * 7 + c.cy * 13) % 100 AS v
              FROM cells c JOIN dist d
                ON c.x0 < d.maxx
               AND c.x0 + {EXTENT // (1 << MORPH_RES)} > d.minx
               AND c.y0 < d.maxy
               AND c.y0 + {EXTENT // (1 << MORPH_RES)} > d.miny
              WHERE greatest(0.0,
                      least(c.x0 + {EXTENT // (1 << MORPH_RES)},
                            d.maxx) - greatest(c.x0, d.minx))
                  * greatest(0.0,
                      least(c.y0 + {EXTENT // (1 << MORPH_RES)},
                            d.maxy) - greatest(c.y0, d.miny))
                  >= {0.5 * (EXTENT / (1 << MORPH_RES)) ** 2}),
            off(dx, dy) AS (VALUES (-1, -1), (-1, 0), (-1, 1),
                                   (0, -1), (0, 0), (0, 1),
                                   (1, -1), (1, 0), (1, 1))
            SELECT m.district_id, m.cx, m.cy,
                   CAST(sum(n.v) AS BIGINT) AS fsum,
                   CAST(count(*) AS BIGINT) AS n_nb
            FROM mask m JOIN off o ON true
            JOIN mask n
              ON n.district_id = m.district_id
             AND n.cx = m.cx + o.dx AND n.cy = m.cy + o.dy
            GROUP BY m.district_id, m.cx, m.cy
            ORDER BY m.district_id, m.cx, m.cy
        """,
        "max_drawdown": """
            WITH t AS (SELECT user_id, ts, event_id,
                              CAST(round(value * 100, 0) AS BIGINT)
                                AS v
                       FROM events),
            w AS (SELECT user_id, ts, v,
                         max(v) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS pk
                  FROM t),
            d AS (SELECT user_id, ts, pk - v AS dd FROM w),
            m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                         max(dd) AS mx
                  FROM d GROUP BY user_id)
            SELECT d.user_id, m.n, CAST(m.mx AS BIGINT) AS max_dd,
                   min(d.ts) AS trough_ts
            FROM d JOIN m ON d.user_id = m.user_id AND d.dd = m.mx
            GROUP BY d.user_id, m.n, m.mx
            ORDER BY d.user_id
        """,
        # theil_sen: DuckDB // truncates toward zero; the CASE
        # converts to floor (den > 0 always since a.day < b.day)
        "theil_sen": """
            WITH d AS (
              SELECT event_type,
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                       AS day,
                     CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                          AS BIGINT) AS rev
              FROM events GROUP BY event_type, day),
            p AS (SELECT a.event_type,
                         CAST(b.rev - a.rev AS HUGEINT)
                           * 1073741824 AS num,
                         CAST(b.day - a.day AS HUGEINT) AS den
                  FROM d a JOIN d b
                    ON a.event_type = b.event_type
                   AND a.day < b.day),
            s AS (SELECT event_type,
                         num // den
                         - CASE WHEN num < 0 AND num % den <> 0
                                THEN 1 ELSE 0 END AS q
                  FROM p),
            n AS (SELECT event_type,
                         CAST(count(*) AS BIGINT) AS n_points
                  FROM d GROUP BY event_type)
            SELECT s.event_type, n.n_points,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(quantile_disc(s.q, 0.5) AS BIGINT)
                     AS qslope_med
            FROM s JOIN n ON s.event_type = n.event_type
            GROUP BY s.event_type, n.n_points
            ORDER BY s.event_type
        """,
        "dow_profile": """
            WITH d AS (
              SELECT event_type, CAST(ts AS DATE) AS dte,
                     CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                          AS BIGINT) AS rev
              FROM events GROUP BY event_type, dte),
            g AS (SELECT event_type,
                         (dte - DATE '1970-01-01') % 7 AS dow,
                         dte, rev,
                         count(*) OVER (PARTITION BY event_type,
                           (dte - DATE '1970-01-01') % 7) AS n,
                         sum(rev) OVER (PARTITION BY event_type,
                           (dte - DATE '1970-01-01') % 7) AS s
                  FROM d),
            dev AS (SELECT event_type, dow, dte, n, s,
                           abs(CAST(rev AS HUGEINT) * n - s) AS dv
                    FROM g),
            m AS (SELECT event_type, dow, max(dv) AS mx
                  FROM dev GROUP BY event_type, dow)
            SELECT dev.event_type, CAST(dev.dow AS BIGINT) AS dow,
                   CAST(max(dev.n) AS BIGINT) AS n_days,
                   CAST(max(dev.s) AS BIGINT) AS rev,
                   min(dev.dte) AS peak_day,
                   CAST(m.mx AS BIGINT) AS peak_dev
            FROM dev JOIN m ON dev.event_type = m.event_type
                           AND dev.dow = m.dow AND dev.dv = m.mx
            GROUP BY dev.event_type, dev.dow, m.mx
            ORDER BY dev.event_type, dev.dow
        """,
        "benford": """
            WITH v AS (SELECT CAST(round(o_totalprice * 100, 0)
                              AS BIGINT) AS val FROM orders)
            SELECT CAST(substr(CAST(val AS VARCHAR), 1, 1) AS BIGINT)
                     AS digit,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(val) AS BIGINT) AS v
            FROM v GROUP BY digit ORDER BY digit
        """,
        "cusum": """
            WITH d AS (
              SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                          AS BIGINT) AS rev
              FROM events GROUP BY event_type, day),
            w AS (SELECT event_type, day,
                         sum(rev) OVER (PARTITION BY event_type
                                        ORDER BY day) AS p,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY day) AS k,
                         sum(rev) OVER (PARTITION BY event_type) AS s,
                         count(*) OVER (PARTITION BY event_type) AS n
                  FROM d),
            dev AS (SELECT event_type, day, n,
                           abs(CAST(n AS HUGEINT) * CAST(p AS HUGEINT)
                               - CAST(k AS HUGEINT)
                                 * CAST(s AS HUGEINT)) AS adev
                    FROM w),
            m AS (SELECT event_type, max(adev) AS mx
                  FROM dev GROUP BY event_type)
            SELECT dev.event_type,
                   CAST(max(dev.n) AS BIGINT) AS n_days,
                   min(dev.day) AS cp_day,
                   CAST(m.mx AS BIGINT) AS max_dev
            FROM dev JOIN m ON dev.event_type = m.event_type
                           AND dev.adev = m.mx
            GROUP BY dev.event_type, m.mx
            ORDER BY dev.event_type
        """,
        "degree_hist": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            e0 AS (
              SELECT doc_id AS i, (doc_id + 1) % nn.n AS j
              FROM documents, nn
              UNION ALL
              SELECT doc_id, (doc_id + 2) % nn.n FROM documents, nn
              UNION ALL
              SELECT doc_id, (doc_id * 7 + 3) % nn.n
              FROM documents, nn),
            sym AS (SELECT i AS w, j AS x FROM e0 WHERE i <> j
                    UNION
                    SELECT j, i FROM e0 WHERE i <> j),
            deg AS (SELECT w, CAST(count(*) AS BIGINT) AS deg
                    FROM sym GROUP BY w)
            SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY deg ORDER BY deg
        """,
        "dq_audit": f"""
            WITH
            r1 AS (SELECT 'null_value' AS rule,
                     CAST(count(*) FILTER (WHERE value IS NULL)
                          AS BIGINT) AS violations FROM events),
            r2 AS (SELECT 'value_range',
                     CAST(count(*) FILTER (WHERE value > {DQ_VALUE_MAX})
                          AS BIGINT) FROM events),
            r3 AS (SELECT 'qty_range',
                     CAST(count(*) FILTER
                          (WHERE l_quantity < 1.0 OR l_quantity > 50.0)
                          AS BIGINT) FROM lineitem),
            r4 AS (SELECT 'fk_orphans', CAST(count(*) AS BIGINT)
                   FROM lineitem l LEFT JOIN orders o
                     ON l.l_orderkey = o.o_orderkey
                   WHERE o.o_orderkey IS NULL),
            r5 AS (SELECT 'dup_pk',
                     CAST(count(*) - count(DISTINCT o_orderkey)
                          AS BIGINT) FROM orders),
            r6 AS (SELECT 'ship_before_order', CAST(count(*) AS BIGINT)
                   FROM lineitem l JOIN orders o
                     ON l.l_orderkey = o.o_orderkey
                   WHERE l.l_shipdate < o.o_orderdate)
            SELECT * FROM r1 UNION ALL SELECT * FROM r2
            UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
            UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r6
            ORDER BY rule
        """,
        **_tpch_oracles(),
    }


def _tpch_oracles():
    from .pipelines_tpch import TPCH_ORACLES

    return TPCH_ORACLES
