"""Table reconciliation (diff) — which rows were added, removed, or
changed between two snapshots of a keyed table. The data-migration /
pipeline-regression staple: after a rewrite or a backfill, prove the
new snapshot equals the old one except for an expected delta.

Scale shape: both sides prune to (id, value_cols) and co-locate
through ONE id-hash exchange with a side tag (the islands flag-sum
discipline, but carrying the compared values); each partition sorts
by (id, side) once and classifies every id with vectorized
adjacent-row comparisons — ids are unique per side, so groups have
size 1 (added/removed) or 2 (same/changed). Values are compared
EXACTLY (Arrow equality), never by hash, so a collision can never
mask a change; the price is shipping the compared columns once,
which is the honest cost of a value-level diff (hash-only precheck
is a caller optimization: diff the hashes first, then re-diff the
mismatching partitions with values).

Output: one row per NON-identical id — (id, status ∈ {added,
removed, changed}) — so the result is bounded by the delta, not the
corpus. ``summary=True`` reduces further to (status, n, id_sum)
per partition before the driver merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["table_diff", "merge_upsert"]


def table_diff(
    left,
    right,
    id_col: str,
    value_cols,
    summary: bool = False,
) -> pa.Table:
    """Diff two keyed tables/Datasets. ``status``: 'added' = id only
    in right, 'removed' = only in left, 'changed' = in both with any
    value column differing. Identical ids are dropped."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from .shuffle import hash_group_apply

    value_cols = list(value_cols)
    cols = [id_col, *value_cols]

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            t = b.select(cols)
            return t.append_column(
                "_side", pa.array(np.full(len(t), side, dtype=np.int8))
            )
        return f

    def to_ds(x, side):
        if isinstance(x, pa.Table):
            x = ray.data.from_arrow(x)
        return x.map_batches(
            tag(side), batch_format="pyarrow", zero_copy_batch=True
        )

    u = to_ds(left, 0).union(to_ds(right, 1))

    def part(tbl, starts):
        schema = pa.schema(
            [
                (id_col, pa.int64() if tbl is None
                 else tbl.schema.field(id_col).type),
                ("status", pa.string()),
            ]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        n = tbl.num_rows
        sizes = np.diff(np.append(starts, n))
        if sizes.max(initial=0) > 2:
            raise ValueError(
                f"table_diff: duplicate '{id_col}' within one side"
            )
        side = tbl["_side"].to_numpy(zero_copy_only=False)
        singles = starts[sizes == 1]
        pair_s = starts[sizes == 2]
        out_idx, out_status = [], []
        if len(singles):
            out_idx.append(singles)
            out_status.append(
                np.where(side[singles] == 1, "added", "removed")
            )
        if len(pair_s):
            same = np.ones(len(pair_s), dtype=bool)
            for c in value_cols:
                arr = tbl[c]
                a = arr.take(pa.array(pair_s))
                b = arr.take(pa.array(pair_s + 1))
                eq = pc.fill_null(pc.equal(a, b), False)
                both_null = pc.and_(pc.is_null(a), pc.is_null(b))
                same &= pc.or_(eq, both_null).to_numpy(
                    zero_copy_only=False
                )
            changed = pair_s[~same]
            if len(changed):
                out_idx.append(changed)
                out_status.append(np.full(len(changed), "changed"))
        if not out_idx:
            return schema.empty_table()
        idx = np.concatenate(out_idx)
        st = np.concatenate(out_status)
        order = np.argsort(idx, kind="stable")
        return pa.table(
            {
                id_col: tbl[id_col].take(pa.array(idx[order])),
                "status": pa.array(st[order], type=pa.string()),
            }
        )

    refs = hash_group_apply(
        u, [id_col], part, sort_cols=("_side",), return_refs=True
    )
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        out = part(None, np.array([], dtype=np.int64))
    else:
        out = pa.concat_tables(tabs).combine_chunks().sort_by(id_col)
    if not summary:
        return out
    if out.num_rows == 0:
        return pa.table(
            {
                "status": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "id_sum": pa.array([], type=pa.int64()),
            }
        )
    g = out.group_by("status", use_threads=False).aggregate(
        [([], "count_all"), (id_col, "sum")]
    )
    # Arrow group_by column order is not keys-first: map by NAME
    return pa.table(
        {
            "status": g["status"],
            "n": pc.cast(g["count_all"], pa.int64()),
            "id_sum": pc.cast(g[f"{id_col}_sum"], pa.int64()),
        }
    ).sort_by("status")


def merge_upsert(
    base,
    changes,
    id_col: str,
    value_cols,
    delete_col: str | None = None,
):
    """SQL ``MERGE INTO`` / lakehouse CDC apply: produce the snapshot
    that results from applying a keyed changeset to ``base`` —
    matching ids take the change row (update), new ids insert, and
    rows whose ``delete_col`` flag is true are removed.

    Scale shape (same exchange as ``table_diff``): both sides prune to
    (id, value_cols[, delete flag]) + a side tag and co-locate through
    ONE id-hash exchange; each partition sorts by (id, side) once and
    emits the LAST row of every id group (the change row wins when
    present) minus deletes — one vectorized take per partition, output
    streamed as a Dataset. Ids must be unique within each side (the
    SQL MERGE cardinality rule: a second change row for one id is
    nondeterministic, so it raises).

    ``delete_col`` (bool, on the changes side) marks deletions; base
    rows never carry it. Insert-of-a-delete (a delete for an id not in
    base) is a no-op, matching ``WHEN NOT MATCHED THEN INSERT`` +
    ``WHEN MATCHED AND flag THEN DELETE`` semantics."""
    import ray.data

    from .shuffle import hash_group_apply

    value_cols = list(value_cols)
    cols = [id_col, *value_cols]

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            t = b.select(cols)
            if delete_col is not None:
                if side == 1 and delete_col in b.column_names:
                    d = b[delete_col]
                else:
                    d = pa.nulls(len(t), pa.bool_())
                t = t.append_column(delete_col, d)
            return t.append_column(
                "_side", pa.array(np.full(len(t), side, dtype=np.int8))
            )

        return f

    def to_ds(x, side):
        if isinstance(x, pa.Table):
            x = ray.data.from_arrow(x)
        return x.map_batches(
            tag(side), batch_format="pyarrow", zero_copy_batch=True
        )

    u = to_ds(base, 0).union(to_ds(changes, 1))

    def part(tbl: pa.Table | None, starts) -> pa.Table:
        schema = pa.schema(
            [
                (c, pa.int64() if tbl is None
                 else tbl.schema.field(c).type)
                for c in cols
            ]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        starts = np.asarray(starts, dtype=np.int64)
        n = tbl.num_rows
        sizes = np.diff(np.append(starts, n))
        side = tbl["_side"].to_numpy(zero_copy_only=False)
        ps = starts[sizes == 2]  # size-2 groups: must be one per side
        if sizes.max(initial=0) > 2 or np.any(
            (side[ps] != 0) | (side[ps + 1] != 1)
        ):
            raise ValueError(
                f"merge_upsert: duplicate '{id_col}' within one side "
                "(MERGE cardinality violation)"
            )
        last = starts + sizes - 1  # change row wins when present
        if delete_col is not None:
            import pyarrow.compute as pc

            del_flag = pc.fill_null(
                tbl[delete_col].take(pa.array(last)), False
            ).to_numpy(zero_copy_only=False)
            last = last[~np.asarray(del_flag, dtype=bool)]
        return tbl.select(cols).take(pa.array(last))

    return hash_group_apply(u, [id_col], part, sort_cols=("_side",))
