"""adjacencies self-join tests (ref: tests/test_adjacencies.py:9-27)."""

import numpy as np
import pyarrow as pa

from maup_ray.ops.adjacencies import adjacencies, count_overlaps, islands


def pairs(tbl: pa.Table):
    d = tbl.to_pydict()
    return {
        (i, j): (ln, ar, dim)
        for i, j, ln, ar, dim in zip(
            d["id_i"], d["id_j"], d["length"], d["area"], d["dim"]
        )
    }


def test_rook_grid(four_square_grid):
    tbl = four_square_grid.rename_columns(["id", "geometry"])
    adj = adjacencies(tbl, adjacency_type="rook")
    p = pairs(adj)
    # rook: 4 shared edges of length 1; no corner pairs
    assert set(p) == {("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")}
    assert all(v[0] == 1.0 and v[2] == 1 for v in p.values())


def test_queen_grid(four_square_grid):
    tbl = four_square_grid.rename_columns(["id", "geometry"])
    adj = adjacencies(tbl, adjacency_type="queen")
    p = pairs(adj)
    assert set(p) == {
        ("a", "b"),
        ("a", "c"),
        ("b", "d"),
        ("c", "d"),
        ("a", "d"),
        ("b", "c"),
    }
    assert p[("a", "d")] == (0.0, 0.0, 0)  # corner point touch


def test_overlap_detection():
    from maup_ray.geom import encode_polygon

    def sq(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)

    tbl = pa.table(
        {
            "id": ["p", "q"],
            "geometry": [
                encode_polygon([sq(0, 0, 3, 3)]),
                encode_polygon([sq(2, 0, 5, 3)]),
            ],
        }
    )
    adj = adjacencies(tbl, adjacency_type="queen")
    p = pairs(adj)
    # 1-wide overlap strip: area 3, perimeter 8, dim 2
    assert p[("p", "q")] == (8.0, 3.0, 2)
    assert count_overlaps(tbl) == 1


def test_islands(four_square_grid):
    from maup_ray.geom import encode_polygon

    far = pa.table(
        {
            "id": ["far"],
            "geometry": [
                encode_polygon(
                    [np.array([[100.0, 100], [101, 100], [101, 101], [100, 101]])]
                )
            ],
        }
    )
    tbl = pa.concat_tables(
        [four_square_grid.rename_columns(["id", "geometry"]), far]
    )
    isl = islands(tbl)
    assert isl["id"].to_pylist() == ["far"]


def test_islands_dataset_matches_local(ray_session, four_square_grid):
    # VERDICT r1 #7: the Dataset path (collect distinct pair ids,
    # broadcast, anti-join in map_batches) must match the local path on
    # the four-square-grid + far-island fixture.
    import ray.data

    from maup_ray.geom import encode_polygon

    far = pa.table(
        {
            "id": ["far"],
            "geometry": [
                encode_polygon(
                    [np.array([[100.0, 100], [101, 100], [101, 101], [100, 101]])]
                )
            ],
        }
    )
    tbl = pa.concat_tables(
        [four_square_grid.rename_columns(["id", "geometry"]), far]
    )
    ds = ray.data.from_arrow(tbl)
    out = islands(
        ds, extent=(0.0, 0.0, 128.0), cell_res=3
    ).to_pandas()
    assert out["id"].tolist() == ["far"]


def test_partitioned_matches_local(ray_session, four_square_grid):
    import ray
    import ray.data

    tbl = four_square_grid.rename_columns(["id", "geometry"])
    local = pairs(adjacencies(tbl, adjacency_type="queen"))
    ds = ray.data.from_arrow(tbl)
    out = adjacencies(
        ds, adjacency_type="queen", cell_res=3, extent=(0.0, 0.0, 4.0)
    )
    got = pa.concat_tables(
        [ray.get(r) for r in out.to_arrow_refs()],
        promote_options="permissive",
    )
    assert pairs(got) == local


def test_hairline_overlap_detected_on_both_paths(ray_session):
    # a genuine overlap THINNER than the snap grid collapses to a
    # boundary contact in the snapped booleans; the exact-rational
    # evidence (geom/exactpred) must recover it on the LOCAL path and
    # on the cell-partitioned Dataset path alike, while a cleanly
    # shared border stays dim-1
    import ray.data

    from maup_ray.geom import encode_polygon
    from maup_ray.ops.adjacencies import adjacencies, count_overlaps

    def rect(x0, y0, x1, y1):
        return encode_polygon(
            [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])]
        )

    eps = 1e-9  # ~2^-30 of the 1000-unit extent: inside one snap cell
    tbl = pa.table(
        {
            "id": pa.array([0, 1, 2], type=pa.int64()),
            "geometry": pa.array(
                [
                    rect(0.0, 0.0, 500.0, 1000.0),
                    rect(500.0 - eps, 0.0, 1000.0, 1000.0),  # hairline
                    rect(1000.0, 0.0, 1500.0, 1000.0),  # clean touch
                ],
                type=pa.binary(),
            ),
        }
    )
    assert count_overlaps(tbl, id_col="id") == 1
    ds = ray.data.from_arrow(tbl)
    out = (
        adjacencies(
            ds,
            id_col="id",
            include_geometry=False,
            adjacency_type="queen",
            extent=(0.0, 0.0, 2048.0),
            cell_res=2,
        )
        .to_pandas()
        .sort_values(["id_i", "id_j"])
    )
    overlaps = out[out["area"] > 0]
    assert list(zip(overlaps["id_i"], overlaps["id_j"])) == [(0, 1)]
    touches = out[(out["area"] == 0) & (out["length"] > 0)]
    assert list(zip(touches["id_i"], touches["id_j"])) == [(1, 2)]
