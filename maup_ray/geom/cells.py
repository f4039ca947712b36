"""Hierarchical square cell index (quadkey / Morton) — the H3/S2 stand-in.

A cell id is a uint64 packing ``(resolution, morton(x_cell, y_cell))``
over a configurable square extent. Used as the spatial partition key for
shuffles (self-joins, hierarchical union, per-region repair) and for
resumable output partitioning (SURVEY.md §4). True hex H3 is not
available offline and not semantically required (SURVEY.md §7.1).

Layout: bits 58..63 = resolution (0..28), bits 0..57 = Morton code.
All functions are vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "CellGrid",
    "morton_encode",
    "morton_decode",
]

_RES_SHIFT = 58
MAX_RES = 28


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread bits of a 29-bit int into even positions (Morton helper)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def morton_encode(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return _part1by1(cx) | (_part1by1(cy) << np.uint64(1))


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return _compact1by1(code), _compact1by1(code >> np.uint64(1))


class CellGrid:
    """Square hierarchical grid over extent [x0,x0+size) × [y0,y0+size)."""

    def __init__(self, x0: float, y0: float, size: float):
        self.x0 = float(x0)
        self.y0 = float(y0)
        self.size = float(size)

    def cell_of_points(
        self, x: np.ndarray, y: np.ndarray, res: int
    ) -> np.ndarray:
        n = 1 << res
        cx = np.clip(
            ((np.asarray(x) - self.x0) / self.size * n).astype(np.int64), 0, n - 1
        )
        cy = np.clip(
            ((np.asarray(y) - self.y0) / self.size * n).astype(np.int64), 0, n - 1
        )
        return self.pack(cx, cy, res)

    def pack(self, cx, cy, res: int) -> np.ndarray:
        return (
            (np.uint64(res) << np.uint64(_RES_SHIFT))
            | morton_encode(np.asarray(cx), np.asarray(cy))
        ).astype(np.uint64)

    @staticmethod
    def res_of(cell: np.ndarray) -> np.ndarray:
        return (np.asarray(cell, dtype=np.uint64) >> np.uint64(_RES_SHIFT)).astype(
            np.int64
        )

    @staticmethod
    def unpack(cell: np.ndarray):
        cell = np.asarray(cell, dtype=np.uint64)
        res = (cell >> np.uint64(_RES_SHIFT)).astype(np.int64)
        code = cell & ((np.uint64(1) << np.uint64(_RES_SHIFT)) - np.uint64(1))
        cx, cy = morton_decode(code)
        return cx.astype(np.int64), cy.astype(np.int64), res

    def parent(self, cell: np.ndarray, steps: int = 1) -> np.ndarray:
        cx, cy, res = self.unpack(cell)
        new_res = np.maximum(res - steps, 0)
        shift = (res - new_res).astype(np.uint64)
        code = morton_encode(
            cx.astype(np.uint64) >> shift, cy.astype(np.uint64) >> shift
        )
        return (code | (new_res.astype(np.uint64) << np.uint64(_RES_SHIFT))).astype(
            np.uint64
        )

    def cell_bbox(self, cell: np.ndarray):
        cx, cy, res = self.unpack(cell)
        w = self.size / (1 << res) if np.ndim(res) == 0 else self.size / (
            np.uint64(1) << res.astype(np.uint64)
        ).astype(np.float64)
        minx = self.x0 + cx * w
        miny = self.y0 + cy * w
        return minx, miny, minx + w, miny + w

    def cells_for_bbox(
        self, minx: float, miny: float, maxx: float, maxy: float, res: int
    ) -> np.ndarray:
        """All res-level cells overlapping a bbox (small side: polygon
        bboxes cover few cells at sane resolutions)."""
        n = 1 << res
        w = self.size / n
        cx0 = int(np.clip((minx - self.x0) // w, 0, n - 1))
        cy0 = int(np.clip((miny - self.y0) // w, 0, n - 1))
        cx1 = int(np.clip((maxx - self.x0) // w, 0, n - 1))
        cy1 = int(np.clip((maxy - self.y0) // w, 0, n - 1))
        cxs, cys = np.meshgrid(
            np.arange(cx0, cx1 + 1), np.arange(cy0, cy1 + 1)
        )
        return self.pack(cxs.ravel(), cys.ravel(), res)

    def pick_resolution(self, typical_extent: float) -> int:
        """Resolution whose cell is ~2× the typical object extent."""
        if typical_extent <= 0:
            return 10
        r = int(np.log2(max(self.size / (typical_extent * 2.0), 1.0)))
        return int(np.clip(r, 0, MAX_RES))


def children(cell: np.ndarray) -> np.ndarray:
    """The 4 child cells (next-finer resolution) of each input cell →
    shape (n, 4). Morton property: child codes are 4·code + {0,1,2,3}."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(_RES_SHIFT)).astype(np.int64)
    if np.any(res >= MAX_RES):
        raise ValueError("children: cell already at MAX_RES")
    code = cell & ((np.uint64(1) << np.uint64(_RES_SHIFT)) - np.uint64(1))
    base = (code << np.uint64(2)) | (
        (res + 1).astype(np.uint64) << np.uint64(_RES_SHIFT)
    )
    return base[:, None] + np.arange(4, dtype=np.uint64)[None, :]


def compact_cells(cells: np.ndarray, min_res: int = 0) -> np.ndarray:
    """H3-style ``compact``: a set of SAME-resolution cells → the
    minimal set of ancestors (resolutions ``min_res..R``) whose
    disjoint union covers exactly the input set.

    Pure-numpy log-depth loop: cells sort by packed id (= Morton
    order), the 4 children of a parent are CONTIGUOUS in that order
    (child codes are 4p..4p+3), so complete sibling groups are
    run-length-4 runs of equal parent code — one diff/repeat pass per
    level, no hashing, no python loops. Promotion stops at
    ``min_res`` (the distributed op's anchor resolution; survivors at
    ``min_res`` mean "this whole subtree is covered").
    """
    cells = np.unique(np.asarray(cells, dtype=np.uint64))
    if len(cells) == 0:
        return cells
    res = (cells >> np.uint64(_RES_SHIFT)).astype(np.int64)
    r = int(res[0])
    if np.any(res != r):
        raise ValueError("compact_cells: input must be single-resolution")
    out = []
    cur = cells
    while r > min_res and len(cur):
        code = cur & ((np.uint64(1) << np.uint64(_RES_SHIFT)) - np.uint64(1))
        pcode = code >> np.uint64(2)
        n = len(cur)
        change = np.ones(n, dtype=bool)
        change[1:] = pcode[1:] != pcode[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, n))
        full = counts == 4
        member_full = np.repeat(full, counts)
        out.append(cur[~member_full])
        cur = (
            pcode[starts[full]]
            | (np.uint64(r - 1) << np.uint64(_RES_SHIFT))
        )
        r -= 1
    out.append(cur)
    return np.concatenate(out) if out else cur


def cells_covering_rects(
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    res: int,
    extent: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Bulk closed-rect → covering cells at ``res`` over the integer
    grid ``[0, extent)²``, clamped-then-divided so the arithmetic is
    non-negative truncating division (mirrorable 1:1 in SQL, where
    ``//`` on negatives would diverge from floor).

    Inputs are integer corner arrays (one rect per row). Returns
    ``(row_index, cell_id)`` — a flat emission, one output per
    (rect × covered cell), fully vectorized (repeat + cumsum
    de-interleave, no per-row loop)."""
    w = extent >> res
    n_side = 1 << res
    cx0 = np.minimum(np.maximum(x0, 0) // w, n_side - 1)
    cy0 = np.minimum(np.maximum(y0, 0) // w, n_side - 1)
    cx1 = np.minimum(np.maximum(x1, 0) // w, n_side - 1)
    cy1 = np.minimum(np.maximum(y1, 0) // w, n_side - 1)
    nx = (cx1 - cx0 + 1).astype(np.int64)
    ny = (cy1 - cy0 + 1).astype(np.int64)
    cnt = nx * ny
    total = int(cnt.sum())
    row = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    offs = np.cumsum(cnt) - cnt
    idx = np.arange(total, dtype=np.int64) - offs[row]
    dx = idx // ny[row]
    dy = idx - dx * ny[row]
    code = morton_encode(
        (cx0[row] + dx).astype(np.uint64), (cy0[row] + dy).astype(np.uint64)
    )
    cells = code | (np.uint64(res) << np.uint64(_RES_SHIFT))
    return row, cells
