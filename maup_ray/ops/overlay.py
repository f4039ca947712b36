"""Overlay-difference (erase) — the geopandas ``overlay(...,
how="difference")`` staple: subtract a mask layer from every geometry
in a distributed table.

Together with ``ops/intersections`` (overlay-intersection) and
``ops/dissolve`` (grouped union) this completes the classic overlay
family. Reference connection: the maup repair pipeline erases overlap
pieces from their losing owners (reference smart_repair's
reassignment step); here it is the standalone user-facing form.

Scale shape: the mask is a SMALL layer (a study-area boundary, a
water/exclusion mask) — it broadcasts once via ``ray.put`` and the
geometry stream maps through one stateless pass; nothing shuffles.
Per row a cheap bbox test skips the kernel entirely when the mask
cannot intersect (the common case for a localized mask); only
bbox-hitting rows run the exact snapped boolean difference
(geom/boolean discipline). A corpus-sized mask belongs to a
co-shuffled intersections+anti plan instead — out of scope here and
guarded by ``broadcast_limit``.

Exactness: same snapped-arrangement kernel as dissolve; with integer
or dyadic inputs the difference vertices, shoelace areas and part
counts are exact and deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["erase"]


def _mask_geoms(mask_wkbs):
    from ..geom.wkb import decode_polygons

    return [decode_polygons(b) for b in mask_wkbs]


def _bounds(geom):
    xs = [r[:, 0] for poly in geom for r in poly[:1]]
    ys = [r[:, 1] for poly in geom for r in poly[:1]]
    return (
        min(float(x.min()) for x in xs),
        min(float(y.min()) for y in ys),
        max(float(x.max()) for x in xs),
        max(float(y.max()) for y in ys),
    )


def erase(
    ds,
    mask: pa.Table,
    id_col: str = "id",
    geom_col: str = "geometry",
    mask_geom_col: str = "geometry",
    tol: float | None = None,
    broadcast_limit: int = 100_000,
) -> "pa.Table | object":
    """Per input row: geometry minus the union of the mask layer.
    Returns (id, geometry WKB, area, n_polys) — rows whose geometry is
    fully erased survive with area 0 and empty parts (the geopandas
    difference convention keeps the row out; callers can filter
    ``n_polys > 0``, and the query layer does)."""
    import ray

    if mask.num_rows > broadcast_limit:
        raise ValueError(
            f"erase: mask layer has {mask.num_rows} rows "
            f"(> broadcast_limit={broadcast_limit}); a corpus-sized "
            "mask needs the co-shuffled overlay plan, not a broadcast"
        )
    mask_ref = ray.put(
        [b.as_py() for b in mask[mask_geom_col]]
    )

    def f(batch: pa.Table) -> pa.Table:
        from ..geom.boolean import difference, union_all
        from ..geom.core import area as parea
        from ..geom.core import ensure_multi
        from ..geom.wkb import decode_polygons, encode_multipolygon

        mg = _mask_geoms(ray.get(mask_ref))
        mask_geom = union_all(mg, tol) if len(mg) > 1 else (
            mg[0] if mg else []
        )
        if mask_geom:
            mb = _bounds(mask_geom)
        ids, wkbs, areas, nparts = [], [], [], []
        for i in range(batch.num_rows):
            g = decode_polygons(batch[geom_col][i].as_py())
            if not mask_geom:
                out = g
            else:
                gb = _bounds(g)
                hit = not (
                    gb[2] < mb[0] or mb[2] < gb[0]
                    or gb[3] < mb[1] or mb[3] < gb[1]
                )
                out = difference(g, mask_geom, tol) if hit else g
            multi = ensure_multi(out)
            ids.append(batch[id_col][i].as_py())
            wkbs.append(encode_multipolygon(multi))
            areas.append(parea(out))
            nparts.append(len(multi))
        return pa.table(
            {
                id_col: pa.array(ids, type=batch.schema.field(
                    id_col).type),
                "geometry": pa.array(wkbs, type=pa.binary()),
                "area": pa.array(areas, type=pa.float64()),
                "n_polys": pa.array(nparts, type=pa.int64()),
            }
        )

    if isinstance(ds, pa.Table):
        return f(ds)
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
