"""small_rook_to_queen (op 21; ref: smart_repair.py:1920-2155).

Converts short rook adjacencies (shared boundary length below
``min_rook_length``) into queen (point) adjacencies:

for each short shared chain between polygons A and B — whose endpoints
are junctions with other polygons (or the exterior) — carve a disk
(N-gon, radius 0.6 × chain length, ref :1965-1978) centred at the
chain midpoint out of every polygon it touches, then give each polygon
back the WEDGES of the disk matching its sector ownership, with radial
cuts meeting at the centre. Because the disk spans the junctions, A's
and B's wedges are separated by the junction polygons' wedges (or by a
carved exterior sector) and meet only at the centre — the rook edge
becomes a queen point.

Critical detail: ownership is sampled per SECTOR of the same N-gon
used for the carve, and wedges reuse the exact N-gon vertices, so the
returned wedges tile the carved boundary with zero slivers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import boolean
from ..geom.core import normalize_polygon
from ..geom.wkb import decode, decode_polygons, encode_multipolygon

__all__ = ["small_rook_to_queen"]

_N_GON = 64


def small_rook_to_queen(
    table: pa.Table,
    min_rook_length: float,
    geometry_col: str = "geometry",
) -> pa.Table:
    from ..geom.pip import points_in_multipolygon
    from .adjacencies import adjacencies

    id_col = [c for c in table.column_names if c != geometry_col][0]
    ids = table[id_col].to_pylist()
    geoms = {
        i: decode_polygons(b.as_py())
        for i, b in zip(ids, table[geometry_col])
    }
    adj = adjacencies(
        table, id_col=id_col, geometry_col=geometry_col,
        adjacency_type="rook", include_geometry=True,
    )
    shorts = []
    for k in range(adj.num_rows):
        ln = adj["length"][k].as_py()
        if 0 < ln < min_rook_length and adj["dim"][k].as_py() == 1:
            parts = decode(adj["geometry"][k].as_py())
            shorts.append((parts.lines, ln))

    ang = np.arange(_N_GON + 1) * (2 * np.pi / _N_GON)
    for lines, ln in shorts:
        allpts = np.vstack(lines)
        cx, cy = allpts.mean(axis=0)
        r = max(0.6 * ln, 1e-9)
        vx = cx + r * np.cos(ang)
        vy = cy + r * np.sin(ang)
        circle = [
            [np.column_stack([vx[:_N_GON], vy[:_N_GON]])]
        ]
        # per-sector ownership against the CURRENT geometries, sampled
        # at sector-midpoint, slightly inside the polygonal boundary
        mid_ang = (ang[:-1] + ang[1:]) * 0.5
        sample = np.column_stack(
            [cx + 0.95 * r * np.cos(mid_ang), cy + 0.95 * r * np.sin(mid_ang)]
        )
        owner = np.full(_N_GON, -1, dtype=np.int64)
        order = list(geoms)
        for pos, gid in enumerate(order):
            g = geoms[gid]
            if not g:
                continue
            unclaimed = owner == -1
            if not unclaimed.any():
                break
            hit = points_in_multipolygon(
                sample[unclaimed], g, include_boundary=False
            )
            owner[np.nonzero(unclaimed)[0][hit]] = pos
        touched = sorted(set(owner[owner >= 0].tolist()))
        for pos in touched:
            gid = order[pos]
            geoms[gid] = boolean.difference(geoms[gid], circle)
        for pos, k0, k1 in _sector_runs(owner):
            if pos < 0:
                continue  # exterior sector stays carved
            gid = order[pos]
            # wedge = centre + exact circle vertices k0 .. k1+1
            if k1 + 1 <= _N_GON:
                arc = np.column_stack([vx[k0 : k1 + 2], vy[k0 : k1 + 2]])
            else:  # wrapped run split upstream — never happens here
                arc = np.column_stack([vx[k0:], vy[k0:]])
            pts = np.vstack([[[cx, cy]], arc])
            poly = normalize_polygon([pts])
            if poly:
                geoms[gid] = boolean.union(geoms[gid], [poly])

    out = [encode_multipolygon(geoms[i]) if geoms[i] else b"" for i in ids]
    pos = table.column_names.index(geometry_col)
    return table.set_column(
        pos, geometry_col, pa.array(out, type=pa.binary())
    )


def _sector_runs(owner: np.ndarray):
    """Maximal circular runs of equal owner: (owner, k0, k1) with k1
    inclusive; wrapped runs are split at sector 0."""
    n = len(owner)
    if (owner == owner[0]).all():
        return [(int(owner[0]), 0, n - 1)]
    runs = []
    start = 0
    for k in range(1, n):
        if owner[k] != owner[start]:
            runs.append((int(owner[start]), start, k - 1))
            start = k
    runs.append((int(owner[start]), start, n - 1))
    # merge the wrap-around pair only if same owner — instead keep
    # split (two wedges sharing the sector-0 radial edge; union heals)
    return runs
