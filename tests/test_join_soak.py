"""GRAFT_SLOW scale soaks for the corpus×corpus join paths: 2M-row
FULL OUTER join and bloom semi/anti verified value-exact against
DuckDB over the identical derived inputs."""

import os

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GRAFT_SLOW"),
    reason="join scale soaks (set GRAFT_SLOW=1)",
)

NL, NR = 2_000_000, 1_500_000
KEYS = 600_000  # duplicate keys on both sides + keys unique to each


def _sides():
    import ray.data

    def gen_left(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy()
        return pa.table(
            {
                # affine spread so key order ≠ id order; ~1/3 of the
                # key domain never appears on the right
                "k": pa.array((i * 48271 + 11) % KEYS),
                "lv": pa.array(i),
            }
        )

    def gen_right(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy()
        return pa.table(
            {
                "k": pa.array(((i * 69621 + 23) % KEYS) + KEYS // 3),
                "rv": pa.array(i + 10_000_000),
            }
        )

    left = ray.data.range(NL).map_batches(
        gen_left, batch_format="pyarrow", zero_copy_batch=True
    )
    right = ray.data.range(NR).map_batches(
        gen_right, batch_format="pyarrow", zero_copy_batch=True
    )
    return left, right


def _duck_tables():
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""
        CREATE TABLE l AS
          SELECT (i * 48271 + 11) % {KEYS} AS k, i AS lv
          FROM (SELECT unnest(range({NL})) AS i);
        CREATE TABLE r AS
          SELECT ((i * 69621 + 23) % {KEYS}) + {KEYS // 3} AS k,
                 i + 10000000 AS rv
          FROM (SELECT unnest(range({NR})) AS i);
        """
    )
    return con


def _digest_outer(df):
    """Order-insensitive exact digest of (k, lv, rv) with nulls."""
    import hashlib

    a = df.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    return (
        len(a),
        hashlib.sha256(
            a.to_csv(index=False, float_format="%.17g").encode()
        ).hexdigest(),
    )


class TestOuterJoinSoak:
    def test_2m_full_outer_matches_duckdb(self, ray_session):
        from maup_ray.ops.join import outer_join

        left, right = _sides()
        got = outer_join(left, right, "k",
                         how="full_outer").to_pandas()
        con = _duck_tables()
        want = con.execute(
            """
            SELECT COALESCE(l.k, r.k) AS k, lv, rv
            FROM l FULL OUTER JOIN r ON l.k = r.k
            """
        ).df()
        g = _digest_outer(got.astype("float64"))
        w = _digest_outer(want.astype("float64"))
        assert g == w


class TestBloomSemiSoak:
    @pytest.mark.parametrize("anti", [False, True])
    def test_2m_bloom_matches_duckdb(self, ray_session, anti):
        from maup_ray.ops.join import anti_join, semi_join

        left, right = _sides()
        fn = anti_join if anti else semi_join
        got = fn(
            left, right.map_batches(
                lambda b: b.select(["k"]), batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "k", plan="bloom",
        ).to_pandas()
        con = _duck_tables()
        op = "NOT IN" if anti else "IN"
        want = con.execute(
            f"SELECT k, lv FROM l WHERE k {op} (SELECT k FROM r)"
        ).df()
        assert len(got) == len(want)
        assert int(got["lv"].sum()) == int(want["lv"].sum())
        assert int(got["k"].sum()) == int(want["k"].sum())
