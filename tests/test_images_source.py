"""read_image_table: the input_hint-shaped ingestion entry point."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from maup_ray.sources import (
    IMAGE_SCHEMA,
    conform_image_batch,
    read_image_table,
)
from maup_ray.synth.images import image_table


def _write_widened(tmpdir: str, n: int = 32) -> str:
    """Parquet with the writer-divergent physical types the contract
    must normalize: int64 dims, large_binary payloads, large_string
    captions."""
    t = image_table(n)
    widened = pa.table(
        {
            "image_id": t["image_id"].cast(pa.large_string()),
            "bytes": t["bytes"].cast(pa.large_binary()),
            "w": t["w"].cast(pa.int64()),
            "h": t["h"].cast(pa.int64()),
            "fmt": t["fmt"],
            "caption": t["caption"].cast(pa.large_string()),
            "phash": t["phash"],
        }
    )
    path = os.path.join(tmpdir, "images.parquet")
    pq.write_table(widened, path)
    return path


def test_conform_casts_and_orders(tmp_path):
    t = image_table(8)
    shuffled = t.select(
        ["phash", "caption", "bytes", "w", "fmt", "h", "image_id"]
    )
    out = conform_image_batch(shuffled)
    assert out.schema == IMAGE_SCHEMA
    assert out.equals(t.select(IMAGE_SCHEMA.names))


def test_conform_missing_column_raises():
    t = image_table(4).drop_columns(["phash"])
    with pytest.raises(KeyError, match="phash"):
        conform_image_batch(t)


def test_read_parquet_normalizes_physical_types(
    ray_session, tmp_path
):
    path = _write_widened(str(tmp_path))
    ds = read_image_table(path)
    key = lambda r: r["image_id"]  # noqa: E731 — block order is free
    got = sorted(ds.take_all(), key=key)
    ref = sorted(image_table(32).to_pylist(), key=key)
    assert got == ref
    # schema contract holds block-wise, not just row-values-wise
    sch = ds.schema()
    assert dict(zip(sch.names, sch.types)) == {
        f.name: f.type for f in IMAGE_SCHEMA
    }


def test_read_with_column_pruning(ray_session, tmp_path):
    path = _write_widened(str(tmp_path))
    ds = read_image_table(path, columns=["image_id", "caption"])
    sch = ds.schema()
    assert sch.names == ["image_id", "caption"]
    assert dict(zip(sch.names, sch.types))["caption"] == pa.string()
    assert ds.count() == 32


def test_lance_path_raises_clear_importerror(ray_session):
    with pytest.raises(ImportError, match="lance"):
        read_image_table("/tmp/does_not_exist.lance")
