"""Scene-cut detection over opaque AVI payloads — the temporal
complement of the video family (frame sampling, per-video phash
dedup): where does the content CHANGE inside a clip?

Scale shape: payloads decode entirely inside the stateless map stage
(the FrameSampleStage discipline — container parse + per-frame
decode, frames never leave the task); each video reduces to one tiny
stats row, so nothing but (video_id, 4 ints) ever moves. Exact
integer pixel arithmetic end to end: a cut fires when the absolute
inter-frame pixel-difference SUM crosses threshold·n_pixels (integer
cross-multiply — no float mean), so results are bit-stable across
partitioning and cpu counts and the pytest pins them (planted-cut
fixture + the scroll corpus's constant-diff invariant)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["scene_cut_stats"]


def _diff_sums(frames) -> np.ndarray:
    """Σ |frame_{t+1} − frame_t| per consecutive pair, exact int64."""
    out = np.empty(max(len(frames) - 1, 0), dtype=np.int64)
    for t in range(len(frames) - 1):
        a = frames[t].astype(np.int64)
        b = frames[t + 1].astype(np.int64)
        out[t] = int(np.abs(b - a).sum())
    return out


def scene_cut_stats(videos, threshold_per_px: int = 100):
    """Per video: (video_id, n_cuts, max_diff_sum, min_diff_sum,
    total_diff_sum). A pair is a cut when
    ``diff_sum > threshold_per_px · n_pixels`` (integer compare).
    Accepts the synthetic video table schema (video_id, bytes,
    fmt='avi', w, h); MJPG frames decode through the baseline-JPEG
    codec, so lossy noise is part of the measured signal — the
    threshold is calibrated per corpus."""
    from .avi import decode_avi_frame, parse_avi

    def f(batch: pa.Table) -> pa.Table:
        vids, cuts, mx, mn, tot = [], [], [], [], []
        for i in range(batch.num_rows):
            buf = batch["bytes"][i].as_py()
            info = parse_avi(buf)
            frames = [
                decode_avi_frame(buf, info, t)
                for t in range(info.n_frames)
            ]
            d = _diff_sums(frames)
            npx = (
                int(frames[0].size) if frames else 0
            )
            thr = threshold_per_px * npx
            vids.append(batch["video_id"][i].as_py())
            cuts.append(int((d > thr).sum()) if len(d) else 0)
            mx.append(int(d.max()) if len(d) else 0)
            mn.append(int(d.min()) if len(d) else 0)
            tot.append(int(d.sum()) if len(d) else 0)
        return pa.table(
            {
                "video_id": pa.array(vids, type=pa.string()),
                "n_cuts": pa.array(cuts, type=pa.int64()),
                "max_diff_sum": pa.array(mx, type=pa.int64()),
                "min_diff_sum": pa.array(mn, type=pa.int64()),
                "total_diff_sum": pa.array(tot, type=pa.int64()),
            }
        )

    if isinstance(videos, pa.Table):
        return f(videos)
    return videos.map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )
