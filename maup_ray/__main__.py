"""Job CLI — the ``ray job submit`` entrypoint shape (north rule:
pipelines run as submitted jobs on a fixed-size cluster, resumable
from per-partition checkpoints):

    ray job submit --working-dir . -- \
        python -m maup_ray run <query> --sf-dir /data/sf1 \
            --out /data/out/<query> --partition-col <col>

Locally (this sandbox) the same command runs against
``address="local"``. Subcommands:

    list                     print every query name (one per line)
    run <query>              execute one pipeline; optional resumable
                             partitioned-parquet output + lineage
    manifest <out-root>      print the lineage table of a previous run

``run`` prints ONE JSON line (query, rows, secs, out, partitions) so
schedulers can scrape results. This module OWNS a Ray session (guarded
``ray.init``) — the library itself never calls ray.init (driver
contract, __ray_entry__ docstring).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False,
                  logging_level="ERROR")
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)
    return ray


def cmd_list(_args) -> int:
    from .pipelines import oracle_queries, query_registry

    oracled = set(oracle_queries())
    for name in query_registry():
        tag = "sql-oracled" if name in oracled else "rows-only"
        print(f"{name}\t{tag}")
    return 0


def cmd_run(args) -> int:
    from .pipelines import query_registry

    reg = query_registry()
    if args.query not in reg:
        print(
            f"unknown query '{args.query}' — see `python -m maup_ray "
            "list`",
            file=sys.stderr,
        )
        return 2
    ray = _init_ray(args.num_cpus)
    t0 = time.perf_counter()
    res = reg[args.query](args.sf_dir)

    summary = {"query": args.query, "sf_dir": args.sf_dir}
    is_ds = hasattr(res, "map_batches")  # ray.data.Dataset
    if args.out and is_ds and args.partition_col:
        from .io import completed_partitions, write_partitioned

        skipped = (
            len(completed_partitions(args.out))
            if not args.no_resume
            else 0
        )
        lineage = write_partitioned(
            res, args.out, args.partition_col,
            resume=not args.no_resume,
        )
        summary["rows"] = int(lineage["rows"].sum())
        summary["partitions"] = int(len(lineage))
        summary["skipped_partitions"] = skipped
        summary["out"] = args.out
    elif args.out:
        # driver-small result (Table/DataFrame) or unpartitioned
        # Dataset → single parquet file / dataset dir
        import pyarrow as pa
        import pyarrow.parquet as pq

        if is_ds:
            os.makedirs(args.out, exist_ok=True)
            res.write_parquet(args.out)
            summary["rows"] = int(
                ray.data.read_parquet(args.out).count()
            )
        else:
            tbl = (
                res
                if isinstance(res, pa.Table)
                else pa.Table.from_pandas(res, preserve_index=False)
            )
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            pq.write_table(tbl, args.out)
            summary["rows"] = tbl.num_rows
        summary["out"] = args.out
    else:
        if is_ds:
            summary["rows"] = res.count()
        else:
            summary["rows"] = len(res)
    summary["secs"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_manifest(args) -> int:
    from .io import manifest

    print(manifest(args.root).to_pandas().to_string(index=False))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m maup_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    runp = sub.add_parser("run")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--out", default=None)
    runp.add_argument(
        "--partition-col",
        default=None,
        help="write resumable partitioned parquet keyed by this column",
    )
    runp.add_argument("--no-resume", action="store_true")
    runp.add_argument("--num-cpus", type=int, default=None)
    manp = sub.add_parser("manifest")
    manp.add_argument("root")
    args = ap.parse_args(argv)
    return {"list": cmd_list, "run": cmd_run, "manifest": cmd_manifest}[
        args.cmd
    ](args)


if __name__ == "__main__":
    sys.exit(main())
