"""Resumable partitioned output + per-partition lineage/metrics.

North-rule requirements (BASELINE.json): streaming execution resumable
from per-partition checkpoints, with lineage + metrics recorded per
cell range.

Layout: ``<root>/part=<key>/data.parquet`` written atomically
(temp file + rename) with a ``_SUCCESS`` marker per partition. A rerun
lists completed partitions first and filters them out of the input —
only missing partitions recompute. ``manifest(root)`` returns the
lineage table (partition, rows, bytes, path).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "write_partitioned",
    "completed_partitions",
    "manifest",
    "read_partitioned",
]


def completed_partitions(root: str) -> set[str]:
    if not os.path.isdir(root):
        return set()
    out = set()
    for d in os.listdir(root):
        if d.startswith("part=") and os.path.exists(
            os.path.join(root, d, "_SUCCESS")
        ):
            out.add(d[len("part=") :])
    return out


def write_partitioned(
    ds,
    root: str,
    partition_col: str,
    resume: bool = True,
):
    """Write a Dataset partitioned by ``partition_col``; returns the
    lineage table. Each partition is written inside the groupby task
    (atomic temp+rename + _SUCCESS marker) — a failed run reruns only
    partitions without markers."""
    os.makedirs(root, exist_ok=True)
    done = completed_partitions(root) if resume else set()

    if done:
        ds = ds.filter(
            lambda r, done=done: str(r[partition_col]) not in done
        )

    def write_group(df):
        import pandas as pd

        key = str(df[partition_col].iloc[0])
        pdir = os.path.join(root, f"part={key}")
        os.makedirs(pdir, exist_ok=True)
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        out = os.path.join(pdir, "data.parquet")
        pq.write_table(tbl, tmp)
        os.replace(tmp, out)  # atomic on POSIX
        meta = {
            "partition": key,
            "rows": int(tbl.num_rows),
            "bytes": int(os.path.getsize(out)),
            "written_at": time.time(),
        }
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            json.dump(meta, f)
        return pd.DataFrame(
            {
                "partition": [key],
                "rows": [meta["rows"]],
                "bytes": [meta["bytes"]],
                "path": [out],
            }
        )

    lineage = ds.groupby(partition_col).map_groups(write_group)
    # consume to force the writes; lineage is small (one row/partition)
    df = lineage.to_pandas()
    if "rows" not in df.columns:
        # fully-resumed run: every partition was skipped upstream and
        # map_groups yields a column-less empty frame
        import pandas as pd

        df = pd.DataFrame(
            {"partition": [], "rows": [], "bytes": [], "path": []}
        ).astype({"rows": "int64", "bytes": "int64"})
    return df


def manifest(root: str) -> pa.Table:
    """Lineage table of completed partitions from _SUCCESS markers."""
    rows = []
    for d in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        marker = os.path.join(root, d, "_SUCCESS")
        if d.startswith("part=") and os.path.exists(marker):
            with open(marker) as f:
                rows.append(json.load(f))
    if not rows:
        return pa.table(
            {"partition": pa.array([], type=pa.string()),
             "rows": pa.array([], type=pa.int64()),
             "bytes": pa.array([], type=pa.int64())}
        )
    return pa.table(
        {
            "partition": [r["partition"] for r in rows],
            "rows": pa.array([r["rows"] for r in rows], type=pa.int64()),
            "bytes": pa.array([r["bytes"] for r in rows], type=pa.int64()),
        }
    )


def read_partitioned(root: str, **kw):
    import ray.data

    paths = []
    for d in sorted(os.listdir(root)):
        p = os.path.join(root, d, "data.parquet")
        if d.startswith("part=") and os.path.exists(
            os.path.join(root, d, "_SUCCESS")
        ):
            paths.append(p)
    return ray.data.read_parquet(paths, **kw)
