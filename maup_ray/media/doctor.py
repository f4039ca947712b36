"""Image-table doctor — `maup.doctor`'s role (one call that says
whether the corpus is internally consistent before you build on it),
re-aimed at the engine's canonical multimodal input (sources/images
IMAGE_SCHEMA): every check a training-data ingest actually needs
before 100 TB of downstream decode work, in ONE streaming pass.

Per block the stage emits a fixed ~12-row integer partial (check,
value); the driver merge is exact integer sum/min/max — so the report
is partition-invariant and pinnable, the repair-family discipline.

Checks:
  n_rows           total rows seen
  fmt_raw/png/jpeg rows per declared format
  fmt_other        rows whose fmt no shipped codec decodes
  decode_fail      rows whose payload THROWS in its codec
  dims_mismatch    decoded (h, w) disagrees with the h/w columns
  raw_len_mismatch raw rows where len(bytes) != w*h*3 (checked before
                   decode; such rows also count decode_fail if they
                   cannot reshape)
  phash_null       phash column nulls. (The doctor does NOT assert
                   stored phash == phash64(pixels): the schema's
                   phash is application-defined metadata — the synth
                   corpus stores an id-derived geotag hash that
                   drives cell assignment, not the pixel hash.
                   Content-hash verification lives in the PhashStage
                   pipeline + its cross-format pytest equality.)
  caption_null     caption is null
  caption_empty    caption == ""
  w_min/w_max/h_min/h_max  dimension envelope (declared columns)

The decode loop is per row by nature (variable-size payloads through
Python codecs — the PhashStage/ImageStatsStage pattern); everything
else is vectorized. Corrupt rows are COUNTED, never raised: a doctor
that dies on the first bad row can't report how many there are.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["image_doctor"]

_SUM_CHECKS = [
    "n_rows",
    "fmt_raw",
    "fmt_png",
    "fmt_jpeg",
    "fmt_other",
    "decode_fail",
    "dims_mismatch",
    "raw_len_mismatch",
    "phash_null",
    "caption_null",
    "caption_empty",
]


def _doctor_partial(batch: pa.Table) -> dict:
    from .jpeg import decode_jpeg
    from .png import decode_png

    n = batch.num_rows
    c = dict.fromkeys(_SUM_CHECKS, 0)
    c["n_rows"] = n
    fmt = batch["fmt"].to_pylist()
    cap = batch["caption"]
    c["caption_null"] = int(cap.null_count)
    if n:
        c["caption_empty"] = int(
            pa.compute.sum(
                pa.compute.equal(cap, "").cast(pa.int64())
            ).as_py()
            or 0
        )
    c["phash_null"] = int(batch["phash"].null_count)
    w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    blobs = batch["bytes"]
    for i in range(n):
        f = fmt[i]
        blob = blobs[i].as_py()
        img = None
        try:
            if f == "raw":
                c["fmt_raw"] += 1
                if blob is None or len(blob) != w[i] * h[i] * 3:
                    c["raw_len_mismatch"] += 1
                img = np.frombuffer(blob, dtype=np.uint8).reshape(
                    h[i], w[i], 3
                )
            elif f == "png":
                c["fmt_png"] += 1
                img = decode_png(blob)
            elif f in ("jpeg", "jpg"):
                c["fmt_jpeg"] += 1
                img = decode_jpeg(blob)
            else:
                c["fmt_other"] += 1
        except Exception:
            c["decode_fail"] += 1
            img = None
        if img is None:
            continue
        if img.shape[0] != h[i] or img.shape[1] != w[i]:
            c["dims_mismatch"] += 1
    return {
        **c,
        "w_min": int(w.min()) if n else None,
        "w_max": int(w.max()) if n else None,
        "h_min": int(h.min()) if n else None,
        "h_max": int(h.max()) if n else None,
    }


def image_doctor(ds) -> pa.Table:
    """→ (check, value) int64 report table, one streaming pass."""

    def partial(batch: pa.Table) -> pa.Table:
        d = _doctor_partial(batch)
        return pa.table(
            {
                "check": pa.array(list(d.keys()), type=pa.string()),
                "value": pa.array(list(d.values()), type=pa.int64()),
            }
        )

    if isinstance(ds, pa.Table):
        rows = partial(ds).to_pylist()
    else:
        rows = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    agg: dict = {}
    for r in rows:
        k, v = r["check"], r["value"]
        if v is None:
            continue
        if k in ("w_min", "h_min"):
            agg[k] = v if k not in agg else min(agg[k], v)
        elif k in ("w_max", "h_max"):
            agg[k] = v if k not in agg else max(agg[k], v)
        else:
            agg[k] = agg.get(k, 0) + v
    order = _SUM_CHECKS + ["w_min", "w_max", "h_min", "h_max"]
    keys = [k for k in order if k in agg]
    return pa.table(
        {
            "check": pa.array(keys, type=pa.string()),
            "value": pa.array(
                [agg[k] for k in keys], type=pa.int64()
            ),
        }
    )
