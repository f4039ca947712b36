"""Raw-task hash shuffle + grouped apply — the scale path for
high-cardinality grouped computation.

Ray Data's ``groupby()`` physical plan is a sort-based all-to-all with
a multi-second fixed cost per execution, and ``map_groups`` adds
per-group UDF dispatch (one pandas DataFrame construction per group —
dominant when groups are small and numerous: a 200k-group/800k-row
input did not finish inside 10 minutes in a single-block microbench,
while the same work vectorized per partition takes well under a
second). Operators that need *vectorized* access to whole key groups
(LSH buckets, cell-partitioned spatial self-joins, kNN cells) use this
module instead: the classic two-stage hash shuffle expressed with raw
Ray tasks — the documented "(c) raw tasks as a last resort" case,
because the Dataset API cannot express a per-partition (rather than
per-group) grouped apply.

  stage 1 (map): each input block is hash-partitioned on the key
  columns into P sub-tables (one task per block).
  stage 2 (reduce): partition p concatenates its sub-tables from every
  block, lexsorts by the keys, and calls ``fn(tbl, starts)`` ONCE with
  the whole partition — ``starts`` marks group starts, and rows of one
  group are contiguous (sorted by any ``sort_cols`` within the group).

PARTITIONING ASSUMPTIONS (the custom-operator contract):
* every row of one key lands in one partition (guaranteed by the
  hash); the largest partition must fit one worker's heap, so the
  default P scales with BOTH the cluster (2 × cluster CPUs, keeps all
  reducers busy on small inputs) and the DATA
  (input_bytes / TARGET_PARTITION_BYTES — at 100 TB, P keyed to cores
  alone would hand each reducer a multi-TB partition; see
  ``_choose_partitions``). Pathological single-key skew is the
  caller's to handle (``salt_keys`` below, or cap group size as LSH's
  max_bucket does).
* key columns are integer-valued (hashed with a splitmix64-style mix);
  the shuffle payload should be a pruned projection, never wide rows.
* ``fn`` must return a correctly-typed (possibly empty) Arrow table
  even for an empty input partition — output schema cannot be inferred.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["hash_group_apply", "group_starts", "salt_keys"]

_MIX = np.uint64(0x9E3779B97F4A7C15)

# Reduce partitions are sized so one partition (plus the ~2× working
# set of the concat+sort in _apply_partition) fits comfortably in a
# worker heap regardless of cluster size.
TARGET_PARTITION_BYTES = 128 * 2**20


def _choose_partitions(input_bytes: int | None, cpus: float) -> int:
    """Default reduce-partition count: max of the parallelism floor
    (2 × cluster CPUs) and the memory ceiling (input_bytes /
    TARGET_PARTITION_BYTES). Keyed to data volume, not cores: on a
    fixed-size cluster P must keep growing with the input or stage-2
    partitions outgrow worker heaps."""
    p = max(2, int(cpus) * 2)
    if input_bytes:
        p = max(p, -(-int(input_bytes) // TARGET_PARTITION_BYTES))
    return p


def salt_keys(ds, keys, buckets: int, salt_col: str = "_salt"):
    """Append a deterministic salt column for skewed-key shuffles.

    A single hot key otherwise lands its whole group in one reduce
    partition (the documented skew caveat above). Callers whose
    per-group fn is a combinable partial (sum/count/top-k partials…)
    can shuffle on ``keys + [salt_col]`` instead — the hot group is
    spread over ``buckets`` partitions — then merge the per-salt
    partials with a second, tiny ``hash_group_apply`` on ``keys``
    alone. The salt is a splitmix avalanche of the row's key hash
    mixed with a row counter, so it is deterministic per run but
    uncorrelated with the partition hash (which re-mixes per column).
    """
    keys = list(keys)

    def add(batch: pa.Table) -> pa.Table:
        n = len(batch)
        h = _hash_keys(batch, keys)
        r = np.arange(n, dtype=np.uint64)
        x = (h + r * _MIX) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(31)
        return batch.append_column(
            salt_col, pa.array((x % np.uint64(buckets)).astype(np.int64))
        )

    if isinstance(ds, pa.Table):
        return add(ds)
    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _hash_keys(tbl: pa.Table, keys: list[str]) -> np.ndarray:
    h = np.zeros(len(tbl), dtype=np.uint64)
    for k in keys:
        col = tbl[k]
        typ = col.type
        if pa.types.is_integer(typ) or pa.types.is_unsigned_integer(typ):
            if col.null_count:
                # null keys: to_numpy yields NaN (float) whose int64
                # cast is UB-ish and warns per worker task; pin them
                # to 0 — the partition landing spot is arbitrary as
                # long as it is deterministic, and group identity is
                # decided by the reduce-side sorted-value comparison,
                # never by the hash
                import pyarrow.compute as pc

                col = pc.fill_null(col, 0)
            v = col.to_numpy(zero_copy_only=False).astype(np.int64).view(
                np.uint64
            )
        else:
            # string/binary keys: polars' vectorized xxhash (fixed
            # seed → identical across worker processes of one run)
            import polars as pl

            v = (
                pl.from_arrow(col.combine_chunks() if isinstance(
                    col, pa.ChunkedArray) else col)
                .hash(seed=0)
                .to_numpy()
                .astype(np.uint64)
            )
        # splitmix-style avalanche per column, xor-combined
        x = (v + _MIX) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        h = (h ^ x) * _MIX
    return h


def _split_block(tbl: pa.Table, keys: list[str], P: int):
    """One map task: hash-partition a block into P sub-tables."""
    if tbl.num_rows == 0:
        return [tbl] * P if P > 1 else tbl
    pid = (_hash_keys(tbl, keys) % np.uint64(P)).astype(np.int64)
    order = np.argsort(pid, kind="stable")
    sorted_pid = pid[order]
    bounds = np.searchsorted(sorted_pid, np.arange(P + 1))
    t = tbl.take(pa.array(order))
    out = [t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(P)]
    return out if P > 1 else out[0]


def group_starts(tbl: pa.Table, keys: list[str]) -> np.ndarray:
    """Start offsets of key groups in a table already sorted by keys."""
    n = len(tbl)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        v = tbl[k].to_numpy(zero_copy_only=False)
        change[1:] |= v[1:] != v[:-1]
    return np.flatnonzero(change)


def _apply_partition(fn, keys, sort_cols, *tabs):
    # Ray's join/filter operators can emit schema-less empty blocks
    # (zero columns); they carry no type information and poison the
    # typed-empty contract below — drop them before selection.
    tabs = [t for t in tabs if t.num_columns]
    nonempty = [t for t in tabs if t.num_rows]
    if not nonempty:
        # pass a TYPED empty table when available so fn can derive
        # input-dependent output types; None only when ds had no blocks
        return fn(tabs[0] if tabs else None, np.empty(0, dtype=np.int64))
    tbl = nonempty[0] if len(nonempty) == 1 else pa.concat_tables(nonempty)
    cols = list(keys) + list(sort_cols)
    # Arrow C++ sort: handles string keys and beats np.lexsort
    tbl = tbl.combine_chunks().sort_by([(c, "ascending") for c in cols])
    return fn(tbl, group_starts(tbl, list(keys)))


def hash_group_apply(
    ds,
    keys,
    fn,
    *,
    num_partitions: int | None = None,
    sort_cols=(),
    return_refs: bool = False,
):
    """Group ``ds`` by integer ``keys`` and apply ``fn(tbl, starts)``
    once per hash partition (see module docstring for the contract).

    ``ds`` may be a Dataset or a pa.Table. Returns a Dataset whose
    blocks are the per-partition outputs of ``fn`` — or, with
    ``return_refs=True``, the raw list of per-partition ObjectRefs
    (for callers that post-process partitions with their own tasks
    without spinning up another Dataset job).
    """
    import ray
    import ray.data

    keys = list(keys)
    if isinstance(ds, pa.Table):
        blocks = [ray.put(ds)]
        input_bytes = ds.nbytes
    else:
        mat = ds.materialize()
        blocks = mat.to_arrow_refs()
        input_bytes = mat.size_bytes()
    if num_partitions is None:
        num_partitions = _choose_partitions(
            input_bytes, ray.cluster_resources().get("CPU", 8)
        )
    P = int(num_partitions)
    split = ray.remote(num_returns=P)(_split_block) if P > 1 else (
        ray.remote(_split_block)
    )
    parts = [split.remote(b, keys, P) for b in blocks]
    if P == 1:
        parts = [[p] for p in parts]
    apply = ray.remote(_apply_partition)
    outs = [
        apply.remote(fn, keys, tuple(sort_cols), *[p[i] for p in parts])
        for i in range(P)
    ]
    if return_refs:
        return outs
    return ray.data.from_arrow_refs(outs)
