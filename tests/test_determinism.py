"""Dual-parallelism determinism (SURVEY §5): identical results
regardless of block structure / parallelism — plus bulk-encode parity."""

import numpy as np
import pyarrow as pa


def test_bulk_quad_encode_matches_scalar():
    from maup_ray.geom import decode_polygons
    from maup_ray.geom.wkb import encode_polygon, encode_quads_bulk

    rng = np.random.RandomState(0)
    qx = rng.uniform(0, 100, (50, 4))
    qy = rng.uniform(0, 100, (50, 4))
    bulk = encode_quads_bulk(qx, qy)
    for k in range(50):
        ring = np.column_stack([qx[k], qy[k]])
        want = decode_polygons(encode_polygon([ring]))
        got = decode_polygons(bulk[k].as_py())
        assert all(
            np.array_equal(a, b)
            for pa_, pb in zip(got, want)
            for a, b in zip(pa_, pb)
        )


def test_assign_invariant_to_block_structure(ray_session, four_square_grid):
    import ray
    import ray.data

    from maup_ray import assign

    n = 500
    rng = np.random.RandomState(7)
    src = pa.table(
        {
            "source_id": pa.array(np.arange(n), type=pa.int64()),
            "x": pa.array(rng.uniform(0, 2, n)),
            "y": pa.array(rng.uniform(0, 2, n)),
        }
    )
    results = []
    for blocks in (1, 7, 32):
        ds = ray.data.from_arrow(src).repartition(blocks)
        out = (
            assign(ds, four_square_grid)
            .to_pandas()
            .sort_values("source_id", ignore_index=True)
        )
        results.append(out)
    assert results[0].equals(results[1])
    assert results[0].equals(results[2])
