"""Public ``maup_ray.assign_to_max`` (ref assign.py:49-54) — pandas
idxmax parity on a (source, target)-sorted weights relation, Table and
Dataset paths, vs a brute pandas oracle mirroring the reference's exact
call shape (``weights.groupby(level="source").idxmax()``)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _pandas_oracle(s, t, w):
    ser = pd.Series(
        w, index=pd.MultiIndex.from_arrays([s, t],
                                           names=["source", "target"])
    ).sort_index()
    ser = ser[ser > 0]
    got = ser.groupby(level="source").idxmax().apply(lambda ix: ix[1])
    return dict(got.items())


class TestAssignToMax:
    def _weights(self):
        rng = np.random.RandomState(7)
        n = 600
        s = rng.randint(0, 80, n).astype(np.int64)
        t = rng.randint(0, 12, n).astype(np.int64)
        w = rng.randint(0, 5, n).astype(np.float64)  # ties + zeros
        # dedup (source,target) pairs — a weights relation is keyed —
        # keeping the max weight per pair
        df = (
            pd.DataFrame({"s": s, "t": t, "w": w})
            .groupby(["s", "t"], as_index=False)["w"].max()
        )
        return (df["s"].to_numpy(), df["t"].to_numpy(),
                df["w"].to_numpy())

    def test_table_path_idxmax_parity(self, ray_session):
        import maup_ray

        s, t, w = self._weights()
        out = maup_ray.assign_to_max(
            pa.table({"source": pa.array(s), "target": pa.array(t),
                      "weight": pa.array(w)})
        )
        got = dict(zip(out["source"].to_pylist(),
                       out["target_id"].to_pylist()))
        assert got == _pandas_oracle(s, t, w)

    def test_dataset_path_matches_table(self, ray_session):
        import ray.data

        import maup_ray

        s, t, w = self._weights()
        tbl = pa.table({"source": pa.array(s), "target": pa.array(t),
                        "weight": pa.array(w)})
        ds_out = maup_ray.assign_to_max(
            ray.data.from_arrow(tbl).repartition(5)
        ).to_pandas()
        got = dict(zip(ds_out["source"], ds_out["target_id"]))
        assert got == _pandas_oracle(s, t, w)

    def test_zero_and_null_weights_never_win(self, ray_session):
        import maup_ray

        tbl = pa.table(
            {
                "source": pa.array([1, 1, 2, 3], type=pa.int64()),
                "target": pa.array([10, 11, 12, 13], type=pa.int64()),
                "weight": pa.array([0.0, 2.0, 0.0, None],
                                   type=pa.float64()),
            }
        )
        out = maup_ray.assign_to_max(tbl)
        got = dict(zip(out["source"].to_pylist(),
                       out["target_id"].to_pylist()))
        # source 2 (all-zero) and 3 (null) get NO row — reference
        # parity: idxmax over an all-dropped group is absent
        assert got == {1: 11}

    def test_tie_smallest_target(self, ray_session):
        import maup_ray

        tbl = pa.table(
            {
                "source": pa.array([5, 5, 5], type=pa.int64()),
                "target": pa.array([9, 3, 7], type=pa.int64()),
                "weight": pa.array([4.0, 4.0, 4.0]),
            }
        )
        out = maup_ray.assign_to_max(tbl)
        assert out["target_id"].to_pylist() == [3]
