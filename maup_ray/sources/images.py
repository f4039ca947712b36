"""Image+caption table ingestion — the engine's canonical input shape
(BASELINE.json input_hint): columns

    image_id:string, bytes:binary, w:int32, h:int32,
    fmt:string, caption:string, phash:int64

``read_image_table`` is the single entry point: it dispatches on the
on-disk format — Lance (``ray.data.read_lance``, the production path;
gated behind an import-try because this container ships no ``lance``
wheel and no network) or parquet (directories or single files — the
offline/test path) — then enforces the schema CONTRACT above with
explicit casts, so every downstream stage (decode, phash, dedup,
assign-by-phash) sees one physical schema regardless of source.

Why a contract cast instead of trusting the reader: Lance and parquet
writers disagree on widths (int64 vs int32 dims, large_binary vs
binary) and Ray unions blocks by physical type — a mixed-width column
poisons the first downstream concat (the empty-filtered-block lesson,
ROUND_NOTES). The cast is zero-copy when types already match.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["IMAGE_SCHEMA", "conform_image_batch", "read_image_table"]

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def conform_image_batch(batch: pa.Table) -> pa.Table:
    """Project + cast one batch to IMAGE_SCHEMA (order included).
    Raises KeyError on a missing required column, ArrowInvalid on an
    uncastable one — loudly, at the first block, not deep in a join."""
    cols = []
    for field in IMAGE_SCHEMA:
        if field.name not in batch.column_names:
            raise KeyError(
                f"image table is missing required column "
                f"'{field.name}' (have {batch.column_names}); the "
                "input_hint contract is "
                + str([f.name for f in IMAGE_SCHEMA])
            )
        col = batch[field.name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.type != field.type:
            col = col.cast(field.type)
        cols.append(col)
    return pa.table(dict(zip(IMAGE_SCHEMA.names, cols)))


def read_image_table(path: str, *, columns=None, **kw):
    """path → ray.data.Dataset conforming to IMAGE_SCHEMA.

    - ``*.lance`` / a Lance dataset dir: ``ray.data.read_lance`` (needs
      the ``lance`` wheel — absent offline; raises ImportError with
      that exact explanation rather than guessing).
    - otherwise: ``ray.data.read_parquet`` (file or directory).

    ``columns`` prunes AT THE READ (projection pushdown — never load
    image bytes for a caption-only pipeline); the contract cast then
    applies to just those columns.
    """
    import ray.data

    schema = IMAGE_SCHEMA
    if columns is not None:
        schema = pa.schema([IMAGE_SCHEMA.field(c) for c in columns])

    if path.rstrip("/").endswith(".lance"):
        try:
            import lance  # noqa: F401  (presence check only)
        except ImportError as e:
            raise ImportError(
                "reading a Lance dataset needs the 'lance' package, "
                "which this offline container does not ship; convert "
                "to parquet or install lance on the cluster image"
            ) from e
        ds = ray.data.read_lance(path, columns=columns, **kw)
    else:
        ds = ray.data.read_parquet(path, columns=columns, **kw)

    def conform(batch: pa.Table) -> pa.Table:
        cols = []
        for field in schema:
            if field.name not in batch.column_names:
                raise KeyError(
                    f"image table is missing required column "
                    f"'{field.name}' (have {batch.column_names})"
                )
            col = batch[field.name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        return pa.table(dict(zip(schema.names, cols)))

    return ds.map_batches(
        conform, batch_format="pyarrow", zero_copy_batch=True
    )
