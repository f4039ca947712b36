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
    from maup_ray import pipelines as p

    return {
        # maup spatial family (SQL-oracled, value-exact by construction)
        "assign_points": p.q_assign_points,
        "assign_blocks": p.q_assign_blocks,
        "pieces": p.q_pieces,
        "assign_by_area": p.q_assign_by_area,
        "normalize": p.q_normalize,
        "prorate": p.q_prorate,
        "adjacencies": p.q_adjacencies,
        "islands": p.q_islands,
        "count_overlaps": p.q_count_overlaps,
        "cell_tiles": p.q_cell_tiles,
        "events_hourly": p.q_events_hourly,
        "knn": p.q_knn,
        "rasterize": p.q_rasterize,
        "sessions": p.q_sessions,
        "rolling_window": p.q_rolling_window,
        "asof_join": p.q_asof_join,
        "range_join": p.q_range_join,
        # training-data family
        "order_totals": p.q_order_totals,
        "sample": p.q_sample,
        "stratified_sample": p.q_stratified_sample,
        "topk_user": p.q_topk_user,
        "percentiles": p.q_percentiles,
        "distinct_users": p.q_distinct_users,
        "token_count": p.q_token_count,
        "token_bpe": p.q_token_bpe,
        "quality": p.q_quality,
        "dedup_exact": p.q_dedup_exact,
        "decontaminate": p.q_decontaminate,
        "curation": p.q_curation,
        "ngrams": p.q_ngrams,
        "profile": p.q_profile,
        "near_dup": p.q_near_dup,
        "ann_topk": p.q_ann_topk,
        "embed_dedup": p.q_embed_dedup,
        "redact": p.q_redact,
        "chunks": p.q_chunks,
        "pack": p.q_pack,
        "bm25": p.q_bm25,
        "bm25_multi": p.q_bm25_multi,
        # rows-only (non-SQL-expressible: hash/LSH/model-ish ops)
        "lang_id": p.q_lang_id,
        "fingerprint": p.q_fingerprint,
        "minhash_pairs": p.q_minhash_pairs,
        "simhash_pairs": p.q_simhash_pairs,
        "ann_lsh": p.q_ann_lsh,
        "ann_ivf": p.q_ann_ivf,
        "approx_distinct": p.q_approx_distinct,
        "embed_cluster": p.q_embed_cluster,
        "embed_prune": p.q_embed_prune,
        "bpe_train": p.q_bpe_train,
        "image_phash": p.q_image_phash,
        "image_dedup": p.q_image_dedup,
        "video_frames": p.q_video_frames,
        "video_dedup": p.q_video_dedup,
        # repair family (rows-only; pytest brute-force oracles)
        "quick_repair": p.q_quick_repair,
        "smart_repair": p.q_smart_repair,
        "doctor": p.q_doctor,
    }


def oracle_sql() -> dict[str, str]:
    from maup_ray import pipelines as p

    return p.oracle_queries()
