"""Multi-resolution tile-pyramid aggregation — the slippy-map /
COG-overview build step: point weights rolled up into every zoom
level's tile grid in ONE streaming pass.

Scale shape (the pyramid trick): each batch aggregates its points
ONCE at the finest zoom (per-batch Arrow group_by — at most
4^max_zoom partial rows), then derives every coarser level by integer
halving of those PARTIALS (≤ 4^z rows each, driver-free, no second
pass over the points). Only tile partials move; the point stream
never shuffles. The final merge is a driver (or keyed) sum over
Σ_z 4^z ≤ (4/3)·4^max_zoom keys — dimension-sized by construction
(max_zoom caps it; a deep-zoom pyramid at web scale would swap the
driver merge for the bytes-aware keyed exchange, same partials).

Exactness: tile index = (xi · 2^z) // extent on exact int64
(coordinates are integer-lattice + 0.5 by corpus construction; floor
strips the half), counts are exact integer sums — the SQL oracle is
the same // arithmetic per zoom, UNION ALL'd.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["tile_pyramid"]


def _empty() -> pa.Table:
    return pa.table(
        {
            "zoom": pa.array([], type=pa.int64()),
            "tx": pa.array([], type=pa.int64()),
            "ty": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
        }
    )


def tile_pyramid(
    ds,
    x_col: str = "x",
    y_col: str = "y",
    extent: int = 1 << 20,
    max_zoom: int = 4,
) -> pa.Table:
    """Counts per tile for every zoom 0..max_zoom (tile grid at zoom z
    is 2^z × 2^z over [0, extent)²). Returns (zoom, tx, ty, n) sorted
    by (zoom, tx, ty)."""
    from .agg import grouped_sum_count

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty()
        xi = np.floor(
            batch[x_col].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        yi = np.floor(
            batch[y_col].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        # fine-level tiles once per point...
        fz = 1 << max_zoom
        tx = (xi * fz) // extent
        ty = (yi * fz) // extent
        fine = (
            pa.table(
                {
                    "tx": pa.array(tx),
                    "ty": pa.array(ty),
                }
            )
            .group_by(["tx", "ty"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        ftx = fine["tx"].to_numpy(zero_copy_only=False)
        fty = fine["ty"].to_numpy(zero_copy_only=False)
        fn = fine["count_all"].to_numpy(zero_copy_only=False)
        # ...then roll the PARTIALS up the pyramid by integer halving
        outs = []
        for z in range(max_zoom, -1, -1):
            sh = max_zoom - z
            t = (
                pa.table(
                    {
                        "zoom": pa.array(
                            np.full(len(ftx), z, dtype=np.int64)
                        ),
                        "tx": pa.array(ftx >> sh),
                        "ty": pa.array(fty >> sh),
                        "n": pa.array(fn.astype(np.int64)),
                    }
                )
                .group_by(["zoom", "tx", "ty"], use_threads=False)
                .aggregate([("n", "sum")])
                .rename_columns(["zoom", "tx", "ty", "n"])
            )
            outs.append(t)
        return pa.concat_tables(outs)

    if isinstance(ds, pa.Table):
        partials = partial(ds)
        merged = (
            partials.group_by(["zoom", "tx", "ty"], use_threads=False)
            .aggregate([("n", "sum")])
            .rename_columns(["zoom", "tx", "ty", "n"])
        )
        return merged.sort_by(
            [("zoom", "ascending"), ("tx", "ascending"),
             ("ty", "ascending")]
        )
    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = grouped_sum_count(
        partials, ["zoom", "tx", "ty"], sum_cols=["n"], final="driver"
    )
    return out.sort_by(
        [("zoom", "ascending"), ("tx", "ascending"), ("ty", "ascending")]
    )
