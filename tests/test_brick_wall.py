"""Corpus-scale brick-wall gate queries (q_adjacencies_xl /
q_doctor_xl) — brute O(n²) rect-algebra oracle on a small wall,
independent of both the engine kernels and the DuckDB SQL mirror."""

import numpy as np
import pyarrow as pa


def _brute_rook(x0, y0, x1, y1):
    """All rook pairs (i<j) + shared boundary length by rect algebra."""
    n = len(x0)
    out = {}
    for i in range(n):
        for j in range(i + 1, n):
            xo = min(x1[i], x1[j]) - max(x0[i], x0[j])
            yo = min(y1[i], y1[j]) - max(y0[i], y0[j])
            if xo == 0 and yo > 0:
                out[(i, j)] = yo
            elif yo == 0 and xo > 0:
                out[(i, j)] = xo
    return out


class TestBrickWall:
    def test_adjacencies_xl_vs_brute(self, ray_session):
        from maup_ray.ops.adjacencies import adjacencies
        from maup_ray.pipelines import (
            _brick_field,
            _brick_geometry_table,
            _brick_rects,
        )

        n = 700  # ~11 rows of 64 — jittered cuts, partial last row
        k = np.arange(n, dtype=np.int64)
        x0, y0, x1, y1 = _brick_rects(k)
        want = _brute_rook(x0, y0, x1, y1)

        import ray.data

        extent, cell_res = _brick_field(n)
        ds = ray.data.from_arrow(
            pa.table({"event_id": pa.array(k)})
        ).repartition(4).map_batches(
            _brick_geometry_table, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        got_tbl = adjacencies(
            ds, id_col="event_id", adjacency_type="rook",
            include_geometry=False, cell_res=cell_res, extent=extent,
        ).to_pandas()
        got = {
            (i, j): ln
            for i, j, ln in zip(got_tbl["id_i"], got_tbl["id_j"],
                                got_tbl["length"])
        }
        assert got == want

    def test_doctor_xl_counts_vs_brute(self, ray_session):
        """Planted grow/shrink defects: brute overlap pairs (positive
        rect-intersection area) and the closed-form hole count."""
        from maup_ray.ops.repair import doctor
        from maup_ray.geom.wkb import encode_rings_bulk
        from maup_ray.pipelines import (
            BRICK_C,
            _brick_field,
            _brick_rects,
        )

        n = 1500  # ~23 rows — several planted defects of each kind
        k = np.arange(n, dtype=np.int64)
        R = (n + BRICK_C - 1) // BRICK_C
        x0, y0, x1, y1 = _brick_rects(k)
        row = k // BRICK_C
        col = k % BRICK_C
        grown = k % 101 == 5
        shrunk = (k % 103 == 7) & (row % 2 == 1) & (row <= R - 3) & ~grown
        x1p = x1 + 2.0 * grown - 2.0 * shrunk

        # brute overlaps: pairs with positive intersection AREA
        n_overlaps = 0
        for i in range(n):
            for j in range(i + 1, min(i + 2 * BRICK_C, n)):
                xo = min(x1p[i], x1p[j]) - max(x0[i], x0[j])
                yo = min(y1[i], y1[j]) - max(y0[i], y0[j])
                if xo > 0 and yo > 0:
                    n_overlaps += 1
        # closed-form holes: every interior-odd-row shrink with a
        # right neighbour opens exactly one 2×8 hole, none merge
        n_gaps = int(np.sum(shrunk & (col < BRICK_C - 1)))
        assert n_overlaps > 0 and n_gaps > 0  # the plant is live

        import ray.data

        extent, cell_res = _brick_field(n)
        m = len(k)
        P = np.empty((m, 4, 2), dtype=np.float64)
        P[:, 0, 0] = x0
        P[:, 0, 1] = y0
        P[:, 1, 0] = x1p
        P[:, 1, 1] = y0
        P[:, 2, 0] = x1p
        P[:, 2, 1] = y1
        P[:, 3, 0] = x0
        P[:, 3, 1] = y1
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "id": pa.array(k),
                    "geometry": encode_rings_bulk(
                        P, np.full(m, 4, dtype=np.int64)
                    ),
                }
            )
        ).repartition(4)
        checks = doctor(ds, extent=extent, cell_res=cell_res)
        assert checks["n_overlaps"] == n_overlaps
        assert checks["n_gaps"] == n_gaps
        assert not checks["ok"]
