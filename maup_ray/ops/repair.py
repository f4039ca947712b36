"""Gap/overlap repair family (ref: repair.py) — ops 9-18 of SURVEY §2.

These operate on polygon TABLES (the small side — district/precinct
scale). At block scale the same functions run inside per-cell/region
``groupby().map_groups`` partitions (the reference's own
nest_within_regions pattern, smart_repair.py:272-328); repairs never
cross group boundaries.

Per-row transforms (snap, vertex dedup, make_valid-lite) also accept a
``ray.data.Dataset`` and become stateless ``map_batches`` stages.

``make_valid`` here is a documented bounded subset of GEOS make_valid:
consecutive-duplicate removal, ring orientation normalization, and
degenerate-ring dropping (the cases the reference's test corpus
exercises after snap_to_grid; ref repair.py:47-57).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import boolean
from ..geom.core import area as poly_area
from ..geom.core import bounds, dedup_geom, ensure_multi, perimeter, snap_geom
from ..geom.wkb import decode_polygons, encode_multipolygon

__all__ = [
    "snap_to_grid",
    "remove_repeated_vertices",
    "make_valid",
    "holes_of_union",
    "count_holes",
    "crop_to",
    "expand_to",
    "absorb_by_shared_perimeter",
    "close_gaps",
    "resolve_overlaps",
    "quick_repair",
    "autorepair",
    "doctor",
    "union_all_table",
]


# ------------------------------------------------------------ per-row maps


def _map_geometry(obj, fn, geometry_col="geometry"):
    def apply(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch[geometry_col]:
            g = decode_polygons(b.as_py())
            out.append(encode_multipolygon(fn(g)))
        i = batch.column_names.index(geometry_col)
        return batch.set_column(
            i, geometry_col, pa.array(out, type=pa.binary())
        )

    if isinstance(obj, pa.Table):
        return apply(obj)
    return obj.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def snap_to_grid(obj, n: int = -7, geometry_col: str = "geometry"):
    """Round all vertices to 10**n (ref: repair.py:252-258)."""
    grid = 10.0**n
    return _map_geometry(
        obj, lambda g: dedup_geom(snap_geom(g, grid)), geometry_col
    )


def remove_repeated_vertices(obj, geometry_col: str = "geometry"):
    """ref: repair.py:242-249."""
    return _map_geometry(obj, dedup_geom, geometry_col)


def _needs_valid_fix(g, tol: float) -> bool:
    """Cheap invalidity screen, two necessary symptoms:

    (a) noding the geometry's OWN boundary splits a segment — some
        ring self-intersects, crosses another ring, or has a vertex in
        another segment's interior (valid polygons touch only at
        finitely many vertices, which split nothing);
    (b) one polygon part's representative point lies strictly inside
        another part — nested shells / fully-contained duplicates,
        which produce no crossings at all.

    False for clean geometries, so the hot path stays bit-identical
    (the parity rebuild below never runs on valid input)."""
    for poly in g:
        for ring in poly:
            # a non-consecutive repeated vertex = ring touches itself
            # (figure-8) — invalid but split-free, so test explicitly
            rr = np.round(ring / tol) * tol
            if len(np.unique(rr, axis=0)) != len(rr):
                return True
    p0, p1 = boolean._gather_segments([g])
    if len(p0) == 0:
        return False
    p0s = np.round(p0 / tol) * tol
    p1s = np.round(p1 / tol) * tol
    nz = int(((p0s != p1s).any(axis=1)).sum())
    q0, _ = boolean._node_segments(p0, p1, tol)
    if len(q0) != nz:
        return True
    if len(g) > 1:
        from ..geom.core import representative_point
        from ..geom.pip import point_in_polygon

        for i, poly in enumerate(g):
            pt = np.array([representative_point([poly])])
            for j, other in enumerate(g):
                if i != j and point_in_polygon(
                    pt, other, include_boundary=False
                )[0]:
                    return True
    return False


def _make_valid_geom(g):
    """Noding + even-odd re-polygonization — shapely ``make_valid``'s
    default 'linework' semantics on polygonal input (ref repair.py:
    47-57, smart_repair.py:128-160): every ring becomes a closed
    curve, and the valid output is the union of arrangement faces
    enclosed an ODD number of times. A bowtie/figure-8 shell splits
    into its lobes, a hole crossing its shell is clipped to it, and a
    doubly-enclosed nested shell flips into a hole.

    Fast path: geometries that pass the :func:`_needs_valid_fix`
    screen only go through ``dedup_geom`` (bit-identical to the r3
    bounded make_valid — keeps every oracle and pinned hash stable);
    the arrangement rebuild runs on dirty rows only."""
    g = dedup_geom(g)
    if not g:
        return g
    tol = boolean._default_tol([g])
    if not _needs_valid_fix(g, tol):
        return g
    # each ring (shell OR hole) becomes one single-ring input; face
    # membership in the arrangement is even-odd crossing parity per
    # input, so summing memberships mod 2 is the even-odd winding of
    # the whole boundary multicurve
    rings = [[[ring]] for poly in g for ring in poly if len(ring) >= 3]
    faces = boolean.arrangement_faces(rings, tol=tol)
    keep = [piece for piece, mem in faces if sum(mem) % 2 == 1]
    if not keep:
        return []
    return boolean.union_all(keep, tol=tol)


def make_valid(obj, geometry_col: str = "geometry"):
    """make_valid (ref repair.py:47-57): dedup + orientation +
    degenerate drop on clean rows; self-intersecting / crossed-ring /
    nested-shell rows are rebuilt by noding + even-odd
    re-polygonization (see :func:`_make_valid_geom`)."""
    return _map_geometry(obj, _make_valid_geom, geometry_col)


# ------------------------------------------------------------ union & holes


def apply_func_to_polygon_parts(shape, func):
    """Apply ``func`` to each polygon part of a (Multi)Polygon in the
    engine's representation (list-of-polygons, each a list of rings)
    and return the MultiPolygon of results (ref: repair.py:386-394)."""
    parts = ensure_multi(shape)
    if not parts:
        raise TypeError(
            "Can only apply a function to a Polygon or MultiPolygon"
        )
    out = []
    for poly in parts:
        r = func(poly)
        out.extend(ensure_multi(r))
    return out


def _decode_all(table: pa.Table, geometry_col="geometry"):
    return [decode_polygons(b.as_py()) for b in table[geometry_col]]


def union_all_table(table: pa.Table, geometry_col="geometry"):
    """Union of every geometry in a table (ref: union_all usage at
    repair.py:84,266,294). Local arrangement union; the distributed
    variant tree-reduces per cell (scale layer)."""
    return boolean.union_all(_decode_all(table, geometry_col))


def holes_of_union(table: pa.Table, geometry_col="geometry") -> pa.Table:
    """Holes of union_all as a table (gap_id, geometry, area)
    (ref: repair.py:74-87)."""
    hs = boolean.holes_of_union(_decode_all(table, geometry_col))
    return pa.table(
        {
            "gap_id": pa.array(range(len(hs)), type=pa.int64()),
            "geometry": pa.array(
                [encode_multipolygon([h]) for h in hs], type=pa.binary()
            ),
            "area": pa.array([poly_area([h]) for h in hs]),
        }
    )


def count_holes(table: pa.Table, geometry_col="geometry") -> int:
    """Holes of the individual geometries (ref: repair.py:378-383)."""
    n = 0
    for g in _decode_all(table, geometry_col):
        for poly in ensure_multi(g):
            n += len(poly) - 1
    return n


# ------------------------------------------------------------ crop / expand


def crop_to(source: pa.Table, target: pa.Table, geometry_col="geometry"):
    """Intersect each source with union(target) (ref: repair.py:261-280).
    Returns (table, n_zero_area) — the count backs the reference's
    AreaCroppingWarning."""
    from ..crs import check_same_crs

    check_same_crs(source, target)  # ref: repair.py:261 @require_same_crs
    tu = boolean.union_all(_decode_all(target, geometry_col))
    out, zero = [], 0
    for g in _decode_all(source, geometry_col):
        c = boolean.intersection(g, tu)
        if poly_area(c) == 0:
            zero += 1
        out.append(encode_multipolygon(c))
    i = source.column_names.index(geometry_col)
    return (
        source.set_column(i, geometry_col, pa.array(out, type=pa.binary())),
        zero,
    )


def expand_to(source: pa.Table, target: pa.Table, geometry_col="geometry"):
    """Absorb target−union(source) leftovers into sources by shared
    perimeter (ref: repair.py:283-308)."""
    from ..crs import check_same_crs

    check_same_crs(source, target)  # ref: repair.py:283 @require_same_crs
    src_geoms = _decode_all(source, geometry_col)
    su = boolean.union_all(src_geoms)
    leftovers = []
    for g in _decode_all(target, geometry_col):
        d = boolean.difference(g, su)
        for poly in ensure_multi(d):  # explode parts
            if poly_area([poly]) > 0:
                leftovers.append([poly])
    if not leftovers:
        return source
    left_tbl = pa.table(
        {
            "source_id": pa.array(range(len(leftovers)), type=pa.int64()),
            "geometry": pa.array(
                [encode_multipolygon(g) for g in leftovers], type=pa.binary()
            ),
        }
    )
    return absorb_by_shared_perimeter(
        left_tbl, source, relative_threshold=None, geometry_col=geometry_col
    )


# ------------------------------------------------------------------ absorb


def absorb_by_shared_perimeter(
    sources: pa.Table,
    targets: pa.Table,
    relative_threshold: float | None = None,
    geometry_col: str = "geometry",
):
    """ref: repair.py:463-510 (@require_same_crs at :462). sources =
    pieces to merge away (gaps / overlaps / leftovers); targets = real
    geometries (any id column + geometry). Each source is unioned into
    the target sharing the
    greatest boundary length (grouped argmax, tie → first sorted
    target); optional threshold skips sources bigger than
    relative_threshold × target area."""
    from ..crs import check_same_crs

    check_same_crs(sources, targets)
    if sources.num_rows == 0:
        return targets
    if targets.num_rows == 0:
        raise IndexError("targets must be nonempty")
    from .intersections import intersections

    tgt_id_col = [c for c in targets.column_names if c != geometry_col][0]
    src_named = sources.select(["source_id", "geometry"]) if (
        "source_id" in sources.column_names
    ) else pa.table(
        {
            "source_id": pa.array(range(sources.num_rows), type=pa.int64()),
            "geometry": sources[geometry_col],
        }
    )
    pieces = intersections(
        src_named,
        targets,
        include_geometry=False,
        targets_id_col=tgt_id_col,
        target_id_col="__tgt",
    )
    if pieces.num_rows == 0:
        return targets
    # grouped argmax on shared length, tie → first (source,target)-sorted
    df = pieces.to_pandas().sort_values(["source_id", "__tgt"], kind="stable")
    best = df.loc[df.groupby("source_id")["length"].idxmax()]
    src_geoms = {
        i: decode_polygons(b.as_py())
        for i, b in zip(
            src_named["source_id"].to_pylist(), src_named["geometry"]
        )
    }
    tgt_geoms = [decode_polygons(b.as_py()) for b in targets[geometry_col]]
    tgt_ids = targets[tgt_id_col].to_pylist()
    tid_to_pos = {t: k for k, t in enumerate(tgt_ids)}
    tgt_areas = [poly_area(g) for g in tgt_geoms]
    to_absorb: dict[int, list] = {}
    for sid, tid in zip(best["source_id"], best["__tgt"]):
        pos = tid_to_pos[tid]
        if relative_threshold is not None:
            if not (
                poly_area(src_geoms[sid]) / tgt_areas[pos]
                < relative_threshold
            ):
                continue
        to_absorb.setdefault(pos, []).append(src_geoms[sid])
    out = []
    for k, g in enumerate(tgt_geoms):
        if k in to_absorb:
            merged = boolean.union_all([g] + to_absorb[k])
            out.append(encode_multipolygon(merged))
        else:
            out.append(encode_multipolygon(g))
    i = targets.column_names.index(geometry_col)
    return targets.set_column(i, geometry_col, pa.array(out, type=pa.binary()))


# ------------------------------------------------------- gaps & overlaps


def close_gaps(
    table: pa.Table,
    relative_threshold: float | None = 0.1,
    geometry_col: str = "geometry",
):
    """ref: repair.py:106-127."""
    gaps = holes_of_union(table, geometry_col)
    if gaps.num_rows == 0:
        return table
    gaps = gaps.rename_columns(["source_id", "geometry", "area"])
    return absorb_by_shared_perimeter(
        gaps, table, relative_threshold=relative_threshold,
        geometry_col=geometry_col,
    )


def resolve_overlaps(
    table: pa.Table,
    relative_threshold: float | None = 0.1,
    geometry_col: str = "geometry",
):
    """ref: repair.py:130-175: subtract union-of-overlaps from every
    geometry, then re-absorb each overlap by greatest shared perimeter.
    Threshold is two-sided (ref :153-158)."""
    from .adjacencies import adjacencies

    id_col = [c for c in table.column_names if c != geometry_col][0]
    adj = adjacencies(
        table, id_col=id_col, geometry_col=geometry_col,
        adjacency_type="queen", include_geometry=True,
    )
    mask = pa.compute.greater(adj["area"], 0.0)
    overlaps = adj.filter(mask)
    if overlaps.num_rows == 0:
        return table
    geoms = _decode_all(table, geometry_col)
    ids = table[id_col].to_pylist()
    areas = {i: poly_area(g) for i, g in zip(ids, geoms)}
    keep_rows = []
    for k in range(overlaps.num_rows):
        a = overlaps["area"][k].as_py()
        i, j = overlaps["id_i"][k].as_py(), overlaps["id_j"][k].as_py()
        if relative_threshold is None or (
            a / areas[i] < relative_threshold
            and a / areas[j] < relative_threshold
        ):
            keep_rows.append(k)
    if not keep_rows:
        return table
    overlaps = overlaps.take(pa.array(keep_rows, type=pa.int64()))
    overlap_geoms = [
        decode_polygons(b.as_py()) for b in overlaps[geometry_col]
    ]
    ou = boolean.union_all(overlap_geoms)
    # Subtract union-of-overlaps from EVERY geometry like the reference:
    # with triple overlaps under mixed threshold outcomes, a geometry
    # whose own pairwise overlaps were all above threshold can still
    # intersect a kept overlap piece (ADVICE r1 low). Skipping is only
    # safe when bboxes are disjoint (difference is then the identity).
    from ..geom.core import bounds as geom_bounds

    obx = geom_bounds(ou)
    shaved = []
    for g in geoms:
        gb = geom_bounds(g)
        disjoint = (
            gb[2] <= obx[0] or obx[2] <= gb[0]
            or gb[3] <= obx[1] or obx[3] <= gb[1]
        )
        shaved.append(g if disjoint else boolean.difference(g, ou))
    shaved_tbl = pa.table(
        {
            id_col: table[id_col],
            geometry_col: pa.array(
                [encode_multipolygon(g) for g in shaved], type=pa.binary()
            ),
        }
    )
    overlap_tbl = pa.table(
        {
            "source_id": pa.array(
                range(len(overlap_geoms)), type=pa.int64()
            ),
            "geometry": pa.array(
                [encode_multipolygon(g) for g in overlap_geoms],
                type=pa.binary(),
            ),
        }
    )
    return absorb_by_shared_perimeter(
        overlap_tbl, shaved_tbl, relative_threshold=None,
        geometry_col=geometry_col,
    )


def weld_table(
    table: pa.Table,
    geometry_col: str = "geometry",
    preserve_genuine: bool = True,
) -> pa.Table:
    """Common-arrangement weld: rebuild every geometry from shared
    atomic faces so neighboring borders come out coordinate-equal
    (the smart_repair final-weld discipline, applied to a table).

    A multi-covered face that is a snap-grid SLIVER (area ≤
    tol·perimeter — the doctor demotion test) goes to its lowest-index
    owner; with ``preserve_genuine`` (default), a multi-covered face
    of real extent is kept with ALL its owners, so over-threshold
    overlaps that resolve_overlaps deliberately left to the user
    (ref repair.py:153-158 semantics) survive the weld unchanged."""
    geoms = _decode_all(table, geometry_col)
    filled = [i for i, g in enumerate(geoms) if g]
    if len(filled) <= 1:
        return table
    tol = boolean._default_tol([geoms[i] for i in filled])
    faces = boolean.arrangement_faces(
        [geoms[i] for i in filled], tol=tol
    )
    rebuilt: dict[int, list] = {i: [] for i in filled}
    for piece, mem in faces:
        owners = np.flatnonzero(mem)
        if len(owners) == 0:
            continue
        if len(owners) == 1:
            rebuilt[filled[int(owners[0])]].extend(piece)
            continue
        a = poly_area(piece)
        if preserve_genuine and a > tol * perimeter(piece):
            for o in owners:  # genuine overlap: every owner keeps it
                rebuilt[filled[int(o)]].extend(piece)
        else:  # hairline seam: lowest-index owner
            rebuilt[filled[int(owners[0])]].extend(piece)
    out = list(geoms)
    for i in filled:
        parts = rebuilt[i]
        out[i] = (
            boolean.union_all([[p] for p in parts], tol=tol)
            if parts
            else []
        )
    col = table.column_names.index(geometry_col)
    return table.set_column(
        col,
        geometry_col,
        pa.array(
            [encode_multipolygon(g) if g else b"" for g in out],
            type=pa.binary(),
        ),
    )


def quick_repair(
    table: pa.Table,
    relative_threshold: float | None = 0.1,
    geometry_col: str = "geometry",
):
    """remove_repeated_vertices → make_valid → resolve_overlaps →
    close_gaps (ref: repair.py:178-239) → hairline weld.

    The final :func:`weld_table` is beyond-reference: per-pair
    absorption can re-snap a shared boundary differently per side,
    leaving ~tol-width seam overlaps the reference never sees (GEOS
    snaps identically on both sides). The weld rebuilds all outputs
    from ONE common arrangement, so only those seams collapse —
    genuine over-threshold overlaps still pass through untouched."""
    t = make_valid(remove_repeated_vertices(table, geometry_col), geometry_col)
    t = resolve_overlaps(t, relative_threshold, geometry_col)
    t = make_valid(t, geometry_col)
    t = close_gaps(t, relative_threshold, geometry_col)
    return weld_table(make_valid(t, geometry_col), geometry_col)


autorepair = quick_repair


# ------------------------------------------------------------------ doctor


def doctor(
    source: pa.Table,
    target: pa.Table | None = None,
    accept_holes: bool = False,
    geometry_col: str = "geometry",
    extent=None,
    cell_res: int = 8,
    id_col: str = "id",
    silent: bool = True,
) -> dict:
    """Health checks (ref: repair.py:311-365). Returns a dict of named
    booleans plus 'ok' — callers wanting the reference's bool take
    ['ok'].

    Dataset input routes to the Dataset-scale path
    (ops.distributed.doctor_distributed: cell-partitioned overlap
    self-join + tree-reduce union for gaps). ``extent`` sets the cell
    partition for that path (defaults to the synthetic district
    extent); with a ``target``, the reference's union-match check runs
    via the distributed tree-reduce union on each side (ADVICE r2)."""
    if not isinstance(source, pa.Table):
        from .distributed import doctor_distributed, union_all_distributed

        if extent is None:
            from ..synth.districts import EXTENT

            extent = (0.0, 0.0, float(EXTENT))
        checks = doctor_distributed(
            source,
            extent,
            geometry_col=geometry_col,
            accept_holes=accept_holes,
            cell_res=cell_res,
            id_col=id_col,
        )
        if target is not None:
            su = union_all_distributed(
                source, extent, geometry_col=geometry_col
            )
            if isinstance(target, pa.Table):
                tg = _decode_all(target, geometry_col)
                tu = boolean.union_all(tg) if len(tg) > 1 else (
                    tg[0] if tg else []
                )
            else:
                tu = union_all_distributed(
                    target, extent, geometry_col=geometry_col
                )
            sym = boolean.symmetric_difference(su, tu)
            checks["union_matches_target"] = poly_area(sym) == 0.0
            checks["ok"] = bool(
                checks["ok"] and checks["union_matches_target"]
            )
        if not silent:
            _doctor_report(checks)
        return checks
    from .adjacencies import count_overlaps

    # The reference iterates the per-shapefile checks over BOTH source
    # and target when a target is given (repair.py:325-363), and its
    # union-match test is sym_area != 0 EXACT — mirror both (ADVICE r1).
    checks: dict[str, bool | int | float] = {}
    tables = [("", source)] + (
        [("target_", target)] if target is not None else []
    )
    per: dict[str, dict] = {}
    for prefix, tbl in tables:
        geoms = _decode_all(tbl, geometry_col)
        c: dict[str, bool | int] = {}
        c["all_polygonal"] = all(len(ensure_multi(g)) >= 1 for g in geoms)
        c["n_overlaps"] = count_overlaps(tbl, geometry_col=geometry_col)
        # same quantization floor as _pair_rows: a "gap" whose mean
        # width is under ~2 boolean grid cells is a chained-snap sliver,
        # not a real hole
        _tol = boolean._default_tol(geoms) if geoms else 1.0
        c["n_gaps"] = sum(
            1
            for h in boolean.holes_of_union(geoms)
            if poly_area(h) > _tol * perimeter(h)
        )
        c["all_valid"] = all(
            all(
                len(r) >= 3 and np.isfinite(r).all()
                for p in ensure_multi(g)
                for r in p
            )
            for g in geoms
        )
        per[prefix] = c
        for k, v in c.items():
            checks[prefix + k] = v
    if target is not None:
        su = boolean.union_all(_decode_all(source, geometry_col))
        tu = boolean.union_all(_decode_all(target, geometry_col))
        sym = boolean.symmetric_difference(su, tu)
        checks["union_matches_target"] = poly_area(sym) == 0.0
    ok = bool(checks.get("union_matches_target", True))
    for c in per.values():
        ok = (
            ok
            and bool(c["all_polygonal"])
            and c["n_overlaps"] == 0
            and (accept_holes or c["n_gaps"] == 0)
            and bool(c["all_valid"])
        )
    checks["ok"] = ok
    if not silent:
        _doctor_report(checks)
    return checks


def _doctor_report(checks: dict) -> None:
    """The reference's printed per-check diagnosis (ref:
    repair.py:331-363), emitted when ``doctor(..., silent=False)``:
    same line shapes, driven by the computed checks dict (which stays
    the return value — richer for pipelines)."""
    if checks.get("union_matches_target") is False:
        print("The unions of target and source differ!")
    for prefix in ("", "target_"):
        if (
            prefix + "n_overlaps" not in checks
            and prefix + "all_polygonal" not in checks
        ):
            continue
        if checks.get(prefix + "all_polygonal") is False:
            print("Some rows do not have geometries.")
        n = checks.get(prefix + "n_overlaps", 0)
        if n:
            print(f"There are {n} overlaps.")
        n = checks.get(prefix + "n_gaps", 0)
        if n:
            print(f"There are {n} holes.")
        if checks.get(prefix + "all_valid") is False:
            print("There are some invalid geometries.")
