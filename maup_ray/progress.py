"""``with maup.progress():`` parity (ref: progress_bar.py:4-27).

The reference wraps generators in tqdm when enabled. Here the engine's
work runs inside Ray Data, whose streaming executor already renders
per-operator progress bars — so the toggle maps onto
``DataContext.enable_progress_bars`` (and the less chatty
``enable_operator_progress_bars``), restoring the previous setting on
exit. Callable form passes an iterable through unchanged (tqdm isn't a
dependency; driver-side loops are not where this engine spends time).
"""

from __future__ import annotations

__all__ = ["progress", "ProgressBar"]


class ProgressBar:
    def __init__(self):
        self.enabled = False
        self._stack: list[tuple[bool, bool, bool]] = []

    def _ctx(self):
        from ray.data.context import DataContext

        return DataContext.get_current()

    def __call__(self, generator=None, total=None):
        """ref parity: ``progress()`` returns the toggle itself;
        ``progress(gen)`` returns the iterable (Ray renders operator
        bars when enabled — nothing to wrap driver-side)."""
        if generator is None:
            return self
        return generator

    def __enter__(self):
        ctx = self._ctx()
        self._stack.append(
            (
                self.enabled,
                ctx.enable_progress_bars,
                getattr(ctx, "enable_operator_progress_bars", True),
            )
        )
        self.enabled = True
        ctx.enable_progress_bars = True
        if hasattr(ctx, "enable_operator_progress_bars"):
            ctx.enable_operator_progress_bars = True
        return self

    def __exit__(self, *args):
        prev_enabled, prev_bars, prev_op = self._stack.pop()
        self.enabled = prev_enabled
        ctx = self._ctx()
        ctx.enable_progress_bars = prev_bars
        if hasattr(ctx, "enable_operator_progress_bars"):
            ctx.enable_operator_progress_bars = prev_op


progress = ProgressBar()
