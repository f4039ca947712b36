"""Minimal WKB (well-known binary) encode/decode — numpy only.

Geometry transport format for Arrow ``binary`` columns (SURVEY.md §1.2).
Supports Point(1) LineString(2) Polygon(3) MultiPoint(4)
MultiLineString(5) MultiPolygon(6) GeometryCollection(7), little-endian
only. Decoded forms match maup_ray.geom.core conventions:

  Point/MultiPoint      -> ("points", np.ndarray (k,2))
  LineString/MultiLine  -> ("lines", list[np.ndarray (k,2)])
  Polygon/MultiPolygon  -> ("polygons", MultiPolygon)  # rings unclosed
  GeometryCollection    -> mix merged into the highest-dim bucket trio

Encode helpers close rings (repeat first vertex) per the WKB spec.
"""

from __future__ import annotations

import struct

import numpy as np

from .core import MultiPolygon, ensure_multi, normalize_polygon

__all__ = [
    "encode_polygon",
    "encode_multipolygon",
    "encode_lines",
    "encode_points",
    "encode_quads_bulk",
    "encode_rings_bulk",
    "decode",
    "decode_polygons",
    "GeomParts",
]

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")


def _ring_bytes(ring: np.ndarray) -> bytes:
    closed = np.vstack([ring, ring[:1]])
    return _U32.pack(len(closed)) + closed.astype("<f8").tobytes()


def encode_polygon(poly) -> bytes:
    out = [_HDR.pack(1, 3), _U32.pack(len(poly))]
    out += [_ring_bytes(np.asarray(r, dtype=np.float64)) for r in poly]
    return b"".join(out)


def encode_multipolygon(geom: MultiPolygon) -> bytes:
    geom = ensure_multi(geom)
    if len(geom) == 1:
        return encode_polygon(geom[0])
    out = [_HDR.pack(1, 6), _U32.pack(len(geom))]
    out += [encode_polygon(p) for p in geom]
    return b"".join(out)


def encode_lines(lines) -> bytes:
    def one(line):
        line = np.asarray(line, dtype=np.float64)
        return (
            _HDR.pack(1, 2)
            + _U32.pack(len(line))
            + line.astype("<f8").tobytes()
        )

    if len(lines) == 1:
        return one(lines[0])
    return (
        _HDR.pack(1, 5)
        + _U32.pack(len(lines))
        + b"".join(one(ln) for ln in lines)
    )


def encode_points(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    if len(pts) == 1:
        return _HDR.pack(1, 1) + pts.astype("<f8").tobytes()
    return (
        _HDR.pack(1, 4)
        + _U32.pack(len(pts))
        + b"".join(
            _HDR.pack(1, 1) + p.astype("<f8").tobytes() for p in pts
        )
    )


def encode_quads_bulk(qx: np.ndarray, qy: np.ndarray) -> "pa.Array":
    """Vectorized WKB encoding of n single-ring quadrilaterals
    (qx, qy: (n, 4) vertex arrays) → Arrow binary array. One numpy
    byte-assembly pass instead of n python struct packs — the bulk
    path for synthetic block generation."""
    import pyarrow as pa

    n = len(qx)
    size = 1 + 4 + 4 + 4 + 5 * 16  # header+type+nrings+npts+5 xy pairs
    buf = np.empty((n, size), dtype=np.uint8)
    header = np.frombuffer(
        _HDR.pack(1, 3) + _U32.pack(1) + _U32.pack(5), dtype=np.uint8
    )
    buf[:, : len(header)] = header[None, :]
    coords = np.empty((n, 5, 2), dtype="<f8")
    coords[:, :4, 0] = qx
    coords[:, :4, 1] = qy
    coords[:, 4] = coords[:, 0]  # close the ring
    buf[:, len(header) :] = coords.reshape(n, -1).view(np.uint8)
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(size), n, [None, pa.py_buffer(buf.tobytes())]
    ).cast(pa.binary())


_QUAD_SIZE = 1 + 4 + 4 + 4 + 5 * 16
_QUAD_HEADER = _HDR.pack(1, 3) + _U32.pack(1) + _U32.pack(5)


def decode_quads_bulk(arr) -> np.ndarray | None:
    """Fast path for Arrow binary columns holding uniform single-ring
    quad WKBs (the encode_quads_bulk layout): returns (n, 4, 2) CCW
    float64 vertex arrays in ONE numpy pass, or None when the column
    isn't uniform quads (caller falls back to per-row decode)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0 or arr.null_count:
        return None
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    offs = offs[arr.offset : arr.offset + n + 1]
    if not (np.diff(offs) == _QUAD_SIZE).all():
        return None
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    rows = data[offs[0] : offs[-1]].reshape(n, _QUAD_SIZE)
    header = np.frombuffer(_QUAD_HEADER, dtype=np.uint8)
    if not (rows[0, : len(header)] == header).all():
        return None
    if n > 1 and not (rows[:, : len(header)] == header[None, :]).all():
        return None
    coords = (
        rows[:, len(header) :]
        .copy()
        .view("<f8")
        .reshape(n, 5, 2)[:, :4]
    )
    # normalize to CCW (bulk signed area)
    x = coords[:, :, 0]
    y = coords[:, :, 1]
    sa = (
        x[:, 0] * (y[:, 1] - y[:, 3])
        + x[:, 1] * (y[:, 2] - y[:, 0])
        + x[:, 2] * (y[:, 3] - y[:, 1])
        + x[:, 3] * (y[:, 0] - y[:, 2])
    )
    cw = sa < 0
    if cw.any():
        coords[cw] = coords[cw][:, ::-1]
    return coords


class GeomParts:
    """Decoded geometry split by dimension."""

    __slots__ = ("polygons", "lines", "points")

    def __init__(self, polygons=None, lines=None, points=None):
        self.polygons = polygons or []
        self.lines = lines or []
        self.points = (
            points if points is not None else np.empty((0, 2), dtype=np.float64)
        )

    @property
    def dim(self) -> int:
        if self.polygons:
            return 2
        if self.lines:
            return 1
        if len(self.points):
            return 0
        return -1


def decode(buf: bytes) -> GeomParts:
    parts = GeomParts()
    _decode_into(memoryview(buf), 0, parts)
    return parts


def decode_polygons(buf: bytes) -> MultiPolygon:
    """Decode expecting (Multi)Polygon; raises TypeError otherwise
    (mirrors the reference's polygon duck-check, repair.py:77-82)."""
    parts = decode(buf)
    if parts.lines or len(parts.points):
        raise TypeError("expected polygonal WKB geometry")
    return parts.polygons


def _decode_into(mv: memoryview, off: int, parts: GeomParts) -> int:
    byte_order, gtype = _HDR.unpack_from(mv, off)
    if byte_order != 1:
        raise ValueError("big-endian WKB not supported")
    off += _HDR.size
    gtype = gtype & 0xFF  # strip any SRID/dimension flags
    if gtype == 1:  # Point
        pt = np.frombuffer(mv, dtype="<f8", count=2, offset=off).reshape(1, 2)
        parts.points = (
            pt if len(parts.points) == 0 else np.vstack([parts.points, pt])
        )
        return off + 16
    if gtype == 2:  # LineString
        (n,) = _U32.unpack_from(mv, off)
        off += 4
        coords = np.frombuffer(
            mv, dtype="<f8", count=2 * n, offset=off
        ).reshape(n, 2)
        parts.lines.append(coords.copy())
        return off + 16 * n
    if gtype == 3:  # Polygon
        (nrings,) = _U32.unpack_from(mv, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = _U32.unpack_from(mv, off)
            off += 4
            coords = np.frombuffer(
                mv, dtype="<f8", count=2 * n, offset=off
            ).reshape(n, 2)
            off += 16 * n
            rings.append(coords[:-1].copy() if n > 1 else coords.copy())
        poly = normalize_polygon(rings)
        if poly:
            parts.polygons.append(poly)
        return off
    if gtype in (4, 5, 6, 7):  # Multi* / collection
        (n,) = _U32.unpack_from(mv, off)
        off += 4
        for _ in range(n):
            off = _decode_into(mv, off, parts)
        return off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def encode_rings_bulk(P: np.ndarray, cnt: np.ndarray) -> "pa.Array":
    """Vectorized WKB encoding of n single-ring polygons from a PADDED
    vertex array ((n, V, 2) + per-row counts, the geom.clip batch-kernel
    layout) → Arrow binary array. Rows with cnt < 3 encode as empty
    bytes (callers filter). One ragged-gather byte-assembly pass — no
    per-row Python structs (the per-piece encode loop was the last
    per-row cost in geometry-emitting batch clips)."""
    import pyarrow as pa

    n = len(cnt)
    cnt = np.asarray(cnt, dtype=np.int64)
    valid = cnt >= 3
    closed = np.where(valid, cnt + 1, 0)
    sizes = np.where(valid, 13 + closed * 16, 0)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    buf = np.zeros(int(offs[-1]), dtype=np.uint8)
    hdr = np.frombuffer(_HDR.pack(1, 3) + _U32.pack(1), dtype=np.uint8)
    starts = offs[:-1][valid]
    for k in range(9):
        buf[starts + k] = hdr[k]
    npts = closed[valid].astype("<u4").view(np.uint8).reshape(-1, 4)
    for k in range(4):
        buf[starts + 9 + k] = npts[:, k]
    # ragged coordinate gather: row r contributes P[r, 0..cnt-1] + P[r, 0]
    rows_v = np.nonzero(valid)[0]
    closed_v = closed[valid]
    tot = int(closed_v.sum())
    if tot:
        row = np.repeat(rows_v, closed_v)
        ccs = np.zeros(len(rows_v) + 1, dtype=np.int64)
        np.cumsum(closed_v, out=ccs[1:])
        pos = np.arange(tot, dtype=np.int64) - np.repeat(ccs[:-1], closed_v)
        vert = np.where(pos < cnt[row], pos, 0)
        coords = np.ascontiguousarray(
            P[row, vert].astype("<f8")
        ).view(np.uint8).reshape(tot, 16)
        byte_pos = offs[:-1][row] + 13 + pos * 16
        for k in range(16):
            buf[byte_pos + k] = coords[:, k]
    if int(offs[-1]) >= 2**31:
        # pa.binary() carries int32 offsets; a silent wrap would emit
        # corrupt WKB (ADVICE r2). Callers hitting this should shrink
        # batch_size — 2 GiB of WKB in one batch is a sizing bug.
        raise ValueError(
            f"encoded WKB batch is {int(offs[-1])} bytes, over the "
            "2 GiB int32-offset limit of pa.binary(); reduce batch_size"
        )
    offs32 = offs.astype("<i4")
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs32.tobytes()), pa.py_buffer(buf.tobytes())],
    )
