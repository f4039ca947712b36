"""``ray job submit`` entry point for the flagship pipeline.

On a real cluster:
    ray job submit --working-dir . -- python scripts/job_entry.py \
        --rows 100000000 --out /mnt/output/assign_run1

In this sandbox it attaches to (or starts) a local session — the same
code path, one node. The pipeline is the BASELINE.json headline:
synthetic image+caption table → phash-derived coordinates → district
assign (broadcast index) → resumable cell-partitioned parquet output
with per-partition lineage + metrics (maup_ray.io manifest). Re-running
with the same --out resumes: completed partitions are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root importable when invoked as `python scripts/job_entry.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/maup_ray_job_out")
    ap.add_argument("--districts", type=int, default=64)
    ap.add_argument("--cell-res", type=int, default=3)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import numpy as np
    import pyarrow as pa

    from maup_ray.geom.cells import CellGrid
    from maup_ray.io import manifest, write_partitioned
    from maup_ray.ops.assign import assign
    from maup_ray.synth.districts import EXTENT, district_table
    from maup_ray.synth.images import image_dataset, phash_xy

    t0 = time.perf_counter()
    images = image_dataset(args.rows)
    grid = CellGrid(0, 0, EXTENT)
    res = args.cell_res

    def derive(batch: pa.Table) -> pa.Table:
        x, y = phash_xy(batch["phash"].to_numpy())
        cells = grid.cell_of_points(x, y, res)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "x": pa.array(x),
                "y": pa.array(y),
                "cell": pa.array(cells.astype(np.int64)),
            }
        )

    pts = images.map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
    assigned = assign(
        pts,
        district_table(args.districts),
        source_id_col="image_id",
        target_id_col="district_id",
        targets_id_col="district_id",
        keep_cols=("cell",),
    )
    lineage = write_partitioned(assigned, args.out, "cell")
    dt = time.perf_counter() - t0
    m = manifest(args.out)
    print(
        json.dumps(
            {
                "rows": args.rows,
                "sec": round(dt, 2),
                "rows_per_sec": round(args.rows / dt, 1),
                "partitions_written_this_run": len(lineage),
                "partitions_total": m.num_rows,
                "rows_on_disk": int(
                    pa.compute.sum(m["rows"]).as_py() or 0
                ),
                "out": args.out,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
