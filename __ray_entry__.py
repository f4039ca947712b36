"""Driver contract for the graft builder (Ray Data target).

The driver calls ``entry()`` as a smoke check (Ray already initialised),
runs each ``queries()[name](sf_dir)`` at sf=0.01 and compares against
``oracle_sql()[name]`` via DuckDB. No ray.init()/shutdown() here —
see module docstring history; Ray Data auto-attaches to the driver's
session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: synthetic image+caption table (sized from the
    sf0.001 documents table) → phash-derived coordinates → district
    assign (broadcast-index actor pool) → per-district aggregate."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Count

    from maup_ray.ops.assign import assign
    from maup_ray.synth.districts import district_table
    from maup_ray.synth.images import image_dataset, phash_xy

    n_docs = pq.read_metadata(f"{SF0001}/documents.parquet").num_rows
    images = image_dataset(n=16 * n_docs)

    def derive(batch: pa.Table) -> pa.Table:
        x, y = phash_xy(batch["phash"].to_numpy())
        return pa.table(
            {
                "image_id": batch["image_id"],
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    pts = images.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    assigned = assign(
        pts,
        district_table(64),
        source_id_col="image_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        concurrency=8,
    )
    return assigned.groupby("district_id").aggregate(Count(alias_name="n_images"))


def queries() -> dict[str, Callable[[str], Any]]:
    # single source of truth: maup_ray.pipelines.query_registry — the
    # same mapping drives `python -m maup_ray run <query>` (job CLI)
    from maup_ray import pipelines as p

    return p.query_registry()


def oracle_sql() -> dict[str, str]:
    from maup_ray import pipelines as p

    return p.oracle_queries()
