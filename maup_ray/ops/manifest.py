"""Shard manifest — WebDataset-style byte-budget packing of an
ordered corpus into fixed-capacity output shards, as one exact global
cumulative-byte scan.

``shard_id = (running_bytes_before_row) // cap`` over the corpus in
key order — the streaming writer's "start a new .tar once cap bytes
are in" rule, made deterministic and resumable (a failed run recomputes
the SAME shard for every row, so finished shards can be skipped; the
north rule's resumable-output requirement for the image corpus).

Scale shape (the ``global_row_number`` offset trick, ops/window.py):
rows never move. One pass computes per-BLOCK byte sums (one int per
block to the driver), the driver prefix-sums those (n_blocks ints),
then each block stamps its rows with ``offset + in-block cumsum`` and
REDUCES to per-shard partials (shard_id, n, bytes, min/max id) before
anything leaves the task — the exchange is O(shards), not O(rows).
A shard can span blocks; the driver-side merge re-aggregates the
partials (sum/sum/min/max — all order-independent, all exact ints).

Order note: Ray Data's streaming executor does NOT preserve block
order by default (preserve_order is off), so "the input is already
ordered" is not a property a Dataset can carry through map_batches —
the op always runs the range-partitioned sort on the PRUNED (id,
length) stream first (24 B/row all-to-all; the payload bytes never
move). Callers must prune payload columns before calling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["shard_manifest"]


def _block_partial(
    tbl: pa.Table, offset: int, cap: int, id_col: str, length_col: str
) -> pa.Table:
    if tbl.num_rows == 0:
        # a fully-empty sorted dataset can hand back a SCHEMA-LESS
        # block (the empty-filtered-block lesson, ROUND_NOTES) — fall
        # back to string ids rather than reaching into a missing field
        id_type = (
            tbl.schema.field(id_col).type
            if id_col in tbl.column_names
            else pa.string()
        )
        return pa.schema(
            [
                ("shard_id", pa.int64()),
                ("n_rows", pa.int64()),
                ("shard_bytes", pa.int64()),
                ("first_id", id_type),
                ("last_id", id_type),
            ]
        ).empty_table()
    ids = tbl[id_col]
    ln = tbl[length_col].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(ln) + np.int64(offset)
    shard = (cum - ln) // np.int64(cap)
    # per-shard partial inside the block: shards are CONTIGUOUS runs
    # (cum is nondecreasing), so run boundaries are a diff, no sort
    starts = np.flatnonzero(np.diff(shard, prepend=shard[0] - 1))
    counts = np.diff(np.append(starts, len(shard)))
    sums = np.add.reduceat(ln, starts)
    ends = starts + counts - 1
    idx_first = pa.array(starts)
    idx_last = pa.array(ends)
    return pa.table(
        {
            "shard_id": pa.array(shard[starts]),
            "n_rows": pa.array(counts.astype(np.int64)),
            "shard_bytes": pa.array(sums),
            "first_id": ids.take(idx_first),
            "last_id": ids.take(idx_last),
        }
    )


def _block_sum(tbl: pa.Table, length_col: str) -> int:
    import pyarrow.compute as pc

    if tbl.num_rows == 0 or length_col not in tbl.column_names:
        return 0
    v = pc.sum(tbl[length_col]).as_py()
    return int(v or 0)


def shard_manifest(
    ds,
    id_col: str,
    length_col: str,
    cap: int,
) -> pa.Table:
    """Ordered dataset with an int byte-length column → per-shard
    manifest table ``(shard_id, n_rows, shard_bytes, first_id,
    last_id)`` sorted by shard_id.

    The manifest itself returns driver-side: it is O(total_bytes/cap)
    rows by construction (100 TB at 1 GiB caps = 10^5 rows), never
    O(corpus).
    """
    import ray
    import ray.data  # noqa: F401

    mat = ds.sort(key=[id_col]).materialize()
    refs = mat.to_arrow_refs()
    bsum = ray.remote(_block_sum)
    sums = ray.get([bsum.remote(r, length_col) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(sums, dtype=np.int64)[:-1]))
    part = ray.remote(_block_partial)
    parts = ray.get(
        [
            part.remote(r, int(off), int(cap), id_col, length_col)
            for r, off in zip(refs, offsets)
        ]
    )
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.schema(
            [
                ("shard_id", pa.int64()),
                ("n_rows", pa.int64()),
                ("shard_bytes", pa.int64()),
                ("first_id", pa.string()),
                ("last_id", pa.string()),
            ]
        ).empty_table()
    merged = pa.concat_tables(parts)
    out = merged.group_by(["shard_id"], use_threads=False).aggregate(
        [
            ("n_rows", "sum"),
            ("shard_bytes", "sum"),
            ("first_id", "min"),
            ("last_id", "max"),
        ]
    )
    # name-matching rename: Arrow group_by suffixes aggregates and a
    # dict rename_columns is a silent no-op on pyarrow 16
    strip = {
        "n_rows_sum": "n_rows",
        "shard_bytes_sum": "shard_bytes",
        "first_id_min": "first_id",
        "last_id_max": "last_id",
    }
    out = out.rename_columns(
        [strip.get(c, c) for c in out.column_names]
    )
    out = out.select(
        ["shard_id", "n_rows", "shard_bytes", "first_id", "last_id"]
    )
    return out.sort_by([("shard_id", "ascending")])
