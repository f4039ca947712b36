"""JSONL / JSONL.gz source + sink → Arrow / Ray Data (stdlib only).

Newline-delimited JSON is the de-facto interchange format of web-text
corpora (Common-Crawl derivatives, dataset dumps); each shard is one
``.jsonl`` or ``.jsonl.gz`` file of one object per line. This module
ingests such corpora distributed: one file decompresses+parses in one
task over ``ray.data.read_binary_files`` (gzip is a stream format —
a shard can only be decoded start-to-end, so the parallel unit is the
file, which is exactly how these corpora are sharded), and the sink
writes one content-addressed shard per input block (resumable
many-small-files layout, same discipline as the GeoJSON sink).

Type mapping is by first-observed value per key (int64 / float64 /
bool / string; nested objects and arrays re-serialize to JSON
strings), with nulls for missing keys — the pragmatic reading of
schema-free shards. ``columns=`` prunes at parse time so unused keys
never materialize.
"""

from __future__ import annotations

import gzip
import json

import pyarrow as pa

__all__ = ["read_jsonl", "jsonl_dataset", "write_jsonl"]


def _decode_bytes(buf: bytes) -> str:
    if buf[:2] == b"\x1f\x8b":  # gzip magic
        buf = gzip.decompress(buf)
    return buf.decode("utf-8")


def read_jsonl(buf: bytes, columns=None) -> pa.Table:
    """One shard (bytes, optionally gzip) → Arrow table."""
    rows = []
    for line in _decode_bytes(buf).splitlines():
        line = line.strip()
        if not line:
            continue
        obj = json.loads(line)
        if columns is not None:
            obj = {k: obj.get(k) for k in columns}
        rows.append(obj)
    if not rows:
        return pa.table({})
    keys = columns if columns is not None else list(
        dict.fromkeys(k for r in rows for k in r)
    )
    cols = {}
    for k in keys:
        vals = [r.get(k) for r in rows]
        vals = [
            json.dumps(v, sort_keys=True)
            if isinstance(v, (dict, list))
            else v
            for v in vals
        ]
        # bools are ints in python: test bool FIRST
        first = next((v for v in vals if v is not None), None)
        if isinstance(first, bool):
            typ = pa.bool_()
        elif isinstance(first, int):
            # ints upgrade to float64 when the shard mixes (JSON has
            # one number type; 1 and 1.5 in one column are common)
            typ = (
                pa.float64()
                if any(isinstance(v, float) for v in vals)
                else pa.int64()
            )
        elif isinstance(first, float):
            typ = pa.float64()
        else:
            typ = pa.string()
        if typ == pa.float64():
            try:
                vals = [
                    float(v) if v is not None else None for v in vals
                ]
            except (TypeError, ValueError):
                typ = pa.string()
        try:
            cols[k] = pa.array(vals, type=typ)
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
            # real-world schema-free shards mix types in one key (int
            # and string is common); degrade the column to string
            # instead of failing the shard (ADVICE r3) — non-strings
            # render as their JSON literal
            cols[k] = pa.array(
                [
                    None
                    if v is None
                    else (v if isinstance(v, str) else json.dumps(v))
                    for v in vals
                ],
                type=pa.string(),
            )
    return pa.table(cols)


def jsonl_dataset(paths, columns=None, **read_kwargs):
    """Distributed ingestion of many .jsonl/.jsonl.gz shards: each
    file decompresses and parses in its own task."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        tabs = [
            read_jsonl(b.as_py(), columns) for b in batch["bytes"]
        ]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            # schema-LESS empty block: unifies with whatever types the
            # non-empty shards carry (a hardcoded all-string schema
            # conflicted with typed blocks downstream — ADVICE r3)
            return pa.table({})
        return pa.concat_tables(tabs, promote_options="default")

    return ray.data.read_binary_files(paths, **read_kwargs).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def write_jsonl(ds, out_dir: str, compress: bool = True):
    """Write a Dataset as one .jsonl(.gz) shard per block —
    content-addressed filenames, atomic rename (the resumable
    many-small-files sink discipline)."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        lines = "\n".join(
            json.dumps(r, sort_keys=True, default=str)
            for r in batch.to_pylist()
        ) + "\n"
        payload = lines.encode()
        if compress:
            payload = gzip.compress(payload, 6)
        name = hashlib.sha256(payload).hexdigest()[:16]
        ext = ".jsonl.gz" if compress else ".jsonl"
        path = os.path.join(out_dir, name + ext)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path]),
                "rows": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    return ds.map_batches(
        dump, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
