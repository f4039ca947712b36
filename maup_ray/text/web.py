"""Web-corpus URL curation: canonicalization + per-host aggregation —
the domain-level filtering shape of C4/RefinedWeb-style pipelines
(domain blocklists, per-domain quotas, host reputation stats all key
off the canonical host).

Canonicalization here is the deterministic, oracle-mirrorable core:
lowercase the host, strip one leading ``www.``, drop the query/fragment
from the path. Both engines run RE2 (pyarrow and DuckDB), so the
regex extractions are byte-identical (the redact precedent).

Scale shape: extraction is stateless vectorized ``map_batches``; each
batch pre-combines to distinct ``(host, path)`` pairs with counts, so
the ONE host-hash exchange moves host×path-bounded partials, never the
URL stream. A viral host is partition-skew — the reducer only holds
that host's distinct paths, and a path-hash salt (ops/shuffle.salt_keys
on the pair stage) is the documented escape hatch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["canonical_urls_batch", "host_stats"]

_HOST_RE = r"^[a-zA-Z]+://(?P<h>[^/?#]+)"
_PATH_RE = r"^[a-zA-Z]+://[^/?#]+(?P<p>/[^?#]*)"


def canonical_urls_batch(
    batch: pa.Table, url_col: str = "url", id_col: str = "doc_id"
) -> pa.Table:
    """Per-row canonical (host, path) extraction: host lowercased with
    one leading ``www.`` stripped; path truncated at ``?``/``#`` and
    defaulting to ``/``. Mirrors DuckDB
    ``regexp_replace(lower(regexp_extract(url, ...)), '^www\\.', '')``
    exactly (RE2 on both sides)."""
    u = batch[url_col]
    host = pc.extract_regex(u, _HOST_RE)
    host = pc.struct_field(host, "h")
    host = pc.utf8_lower(host)
    host = pc.replace_substring_regex(
        host, r"^www\.", "", max_replacements=1
    )
    path = pc.struct_field(pc.extract_regex(u, _PATH_RE), "p")
    path = pc.fill_null(path, "/")
    return pa.table(
        {id_col: batch[id_col], "host": host, "path": path}
    )


def host_stats(
    ds, url_col: str = "url", id_col: str = "doc_id"
) -> "pa.Table":
    """Per-canonical-host corpus stats: ``n_urls`` (rows) and
    ``n_paths`` (distinct canonical paths) — returns a Dataset of
    per-partition outputs (each host wholly in one partition)."""

    def pairs(b: pa.Table) -> pa.Table:
        c = canonical_urls_batch(b, url_col=url_col, id_col=id_col)
        t = (
            pa.table({"host": c["host"], "path": c["path"]})
            .group_by(["host", "path"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return t.rename_columns(["host", "path", "c"])

    pruned = (
        pairs(ds)
        if isinstance(ds, pa.Table)
        else ds.map_batches(
            pairs, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "host": pa.array([], type=pa.string()),
                "n_urls": pa.array([], type=pa.int64()),
                "n_paths": pa.array([], type=pa.int64()),
            }
        )
        if tbl is None or tbl.num_rows == 0:
            return empty
        n = tbl.num_rows
        c = tbl["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        first = np.zeros(n, dtype=bool)
        first[starts] = True
        # cross-block repeats of one (host, path) are adjacent after
        # the contract sort (host groups sorted by path)
        path = tbl["path"].to_numpy(zero_copy_only=False)
        keep = first.copy()
        keep[1:] |= path[1:] != path[:-1]
        seg = np.cumsum(keep) - 1
        c = np.bincount(seg, weights=c).astype(np.int64)
        first = first[keep]
        m = len(first)
        g = np.flatnonzero(first)
        host = tbl["host"].combine_chunks()
        if isinstance(host, pa.ChunkedArray):
            host = host.chunk(0) if host.num_chunks else pa.array(
                [], type=pa.string()
            )
        host = host.take(pa.array(np.flatnonzero(keep)))
        return pa.table(
            {
                "host": host.take(pa.array(g)),
                "n_urls": pa.array(np.add.reduceat(c, g)),
                "n_paths": pa.array(
                    np.diff(np.append(g, m)).astype(np.int64)
                ),
            }
        )

    from ..ops.shuffle import group_starts, hash_group_apply

    if isinstance(pruned, pa.Table):
        t = pruned.combine_chunks().sort_by(
            [("host", "ascending"), ("path", "ascending")]
        )
        return part(t, group_starts(t, ["host"]))
    return hash_group_apply(
        pruned, ["host"], part, sort_cols=("path",)
    )
