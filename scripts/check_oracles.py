"""Local replica of the driver's correctness gate: run every
queries() entry and its oracle_sql() via DuckDB on the same parquet,
compare row count + schema + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def to_arrow(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    if isinstance(obj, pd.DataFrame):
        return pa.Table.from_pandas(obj, preserve_index=False)
    import ray  # ray Dataset

    tabs = [ray.get(r) for r in obj.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    return pa.concat_tables(tabs, promote_options="default")


def arrow_schema_match(name: str, got: pa.Table, want: pa.Table) -> bool:
    """Field-by-field physical-type compare (sorted by name) — catches
    e.g. timestamp[s] vs timestamp[us], which pandas washes out but the
    driver's value hash does not (VERDICT r1 events_hourly lesson)."""
    g = {f.name: f.type for f in got.schema}
    w = {f.name: f.type for f in want.schema}
    ok = True
    for col in sorted(set(g) | set(w)):
        gt, wt = g.get(col), w.get(col)
        if gt is None or wt is None or gt != wt:
            # large_string vs string etc. hash the same value bytes
            if gt is not None and wt is not None and (
                pa.types.is_string(gt) and pa.types.is_string(wt)
                or pa.types.is_large_string(gt) and pa.types.is_string(wt)
                or pa.types.is_string(gt) and pa.types.is_large_string(wt)
            ):
                continue
            print(f"  [{name}] ARROW TYPE MISMATCH col {col}: {gt} vs {wt}")
            ok = False
    return ok


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    ok = True
    if sorted(got.columns) != sorted(want.columns):
        print(f"  [{name}] SCHEMA MISMATCH: {sorted(got.columns)} vs {sorted(want.columns)}")
        return False
    if len(got) != len(want):
        print(f"  [{name}] ROWCOUNT MISMATCH: {len(got)} vs {len(want)}")
        ok = False
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c].to_numpy(), w[c].to_numpy()
            if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                eq = np.array_equal(
                    gv.astype(np.float64), wv.astype(np.float64),
                    equal_nan=True,
                )
                if not eq:
                    close = np.allclose(
                        gv.astype(np.float64), wv.astype(np.float64),
                        rtol=1e-12, atol=1e-12, equal_nan=True,
                    )
                    print(
                        f"  [{name}] col {c}: exact={eq} close={close} "
                        f"maxdiff={np.abs(gv.astype(float)-wv.astype(float)).max()}"
                    )
                    ok = ok and close
            else:
                if not (gv == wv).all():
                    bad = int((gv != wv).sum())
                    print(f"  [{name}] col {c}: {bad} mismatched values")
                    ok = False
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        import os

        # default to the DRIVER's config (32): the r2 islands red was a
        # num_cpus-dependent Ray agg crash that num_cpus=8 hid
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got_t = to_arrow(fn(sf_dir))
        got = got_t.to_pandas()
        if name not in oracles:
            print(f"[{name}] rows-only: {len(got)} rows")
            continue
        want_t = con.sql(oracles[name]).arrow()
        want = want_t.to_pandas()
        if arrow_schema_match(name, got_t, want_t) & compare(name, got, want):
            print(f"[{name}] OK ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"[{name}] FAIL")
            n_fail += 1
    print(f"passed={n_pass} failed={n_fail}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
