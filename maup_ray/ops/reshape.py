"""Wide↔long reshape operators.

``unpivot`` (pandas ``melt`` / SQL ``UNPIVOT``) turns K value columns
into K stacked rows per input row — the standard normalization step
before metric-generic aggregation, plotting, or a long-format sink.
The inverse (pivot) already ships as the grouped conditional-sum
family (pipelines ``event_pivot``).

Scale shape: stateless, row-independent, one streaming ``map_batches``
pass — each batch emits its own K-fold stack (one zero-copy column
select + one small concat per batch), nothing shuffles, output blocks
stay proportional to input blocks. The metric-name column is a
dictionary-friendly constant per slice.

Exactness: pure reshape — values are carried bit-identical in their
source Arrow type (all value columns must share one type; the caller
casts first if they don't, so no silent unification happens here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["unpivot"]


def unpivot_batch(
    batch: pa.Table,
    id_cols,
    value_cols,
    var_name: str = "metric",
    value_name: str = "value",
) -> pa.Table:
    """One batch → K stacked slices (K = len(value_cols)), each the id
    columns plus (constant metric name, that column's values)."""
    id_cols = list(id_cols)
    value_cols = list(value_cols)
    vt = {batch.schema.field(c).type for c in value_cols}
    if len(vt) != 1:
        raise ValueError(
            f"unpivot value columns must share one Arrow type, got "
            f"{sorted(map(str, vt))}; cast before unpivoting"
        )
    slices = []
    zeros = pa.array(np.zeros(batch.num_rows, dtype=np.int32))
    for c in value_cols:
        cols = {k: batch[k] for k in id_cols}
        # vectorized constant replication (no per-row python objects)
        cols[var_name] = pc.take(
            pa.array([c], type=pa.string()), zeros
        )
        cols[value_name] = batch[c]
        slices.append(pa.table(cols))
    return pa.concat_tables(slices)


def unpivot(
    ds,
    id_cols,
    value_cols,
    var_name: str = "metric",
    value_name: str = "value",
):
    """Melt ``value_cols`` into (``var_name``, ``value_name``) long
    format, keeping ``id_cols``. Table in → Table out; Dataset in →
    streaming Dataset out."""
    if isinstance(ds, pa.Table):
        return unpivot_batch(ds, id_cols, value_cols, var_name,
                             value_name)
    return ds.map_batches(
        lambda b: unpivot_batch(b, id_cols, value_cols, var_name,
                                value_name),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
