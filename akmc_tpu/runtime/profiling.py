"""Tracing / profiling utilities.

The reference instruments with manual MPI_Wtime brackets written into the
output buffer, rocm-smi VRAM polling via popen, and CG iteration prints
(SURVEY.md §5). TPU-native replacements:

  * ``phase``: wall-clock phase timers accumulated into a dict (feeds
    metrics.jsonl and the reference-format "Z - calculation time" lines);
  * ``trace``: jax.profiler trace capture (view with TensorBoard/XProf);
  * ``device_memory_stats``: live HBM accounting (replaces rocm-smi popen).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class PhaseTimers:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.last: Dict[str, float] = {}
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.last[name] = dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "total_s": self.totals[k],
                "mean_s": self.totals[k] / max(1, self.counts[k]),
                "count": self.counts[k],
            }
            for k in self.totals
        }


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace for this block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Optional[dict]:
    """Per-device memory accounting (the reference shells out to rocm-smi,
    kmc_main.cpp:42-53)."""
    import jax

    try:
        d = jax.devices()[0]
        stats = d.memory_stats()
        if stats is None:
            return None
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    except Exception:
        return None


def pull_sync(out):
    """Force completion of a dispatched computation by pulling ONE scalar.

    ``jax.block_until_ready`` returns EARLY on this machine's remote
    (tunneled-TPU) buffers — timing brackets must pull a scalar per call to
    actually synchronize (PERF_NOTES). Pulls the smallest array leaf of
    ``out`` (cheapest transfer); returns ``out`` unchanged.
    """
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "size")]
    sync = min(leaves, key=lambda l: l.size, default=None)
    if sync is not None:
        float(jnp.sum(sync))
    return out
