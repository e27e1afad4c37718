"""Profiling / tracing utilities (SURVEY §5: the reference has none; the
rebuild's observability story).

``trace(logdir)`` wraps a block in a jax.profiler trace viewable in
TensorBoard/Perfetto; ``RayRateMeter`` tracks the north-star rays/sec
metric with true device syncs (block_until_ready returns early on the
tunneled axon backend — sync via scalar readback).
"""

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/spurfies_trace"):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class RayRateMeter:
    """Accumulates (rays, seconds) across windows; call .sync_fn between
    windows to get honest timings."""

    def __init__(self, sync_fn):
        self.sync_fn = sync_fn
        self.rays = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_rays: int):
        self.sync_fn()
        t0 = time.perf_counter()
        yield
        self.sync_fn()
        self.seconds += time.perf_counter() - t0
        self.rays += n_rays

    @property
    def rays_per_sec(self) -> float:
        return self.rays / self.seconds if self.seconds > 0 else 0.0
