"""Profiling / tracing utilities.

The reference's only instrumentation is wall-clock timing around rollout and
update (src/alg/ppo.py:79, 126-140) surfaced as fps / rollout_time /
learn_time. This module keeps that steps/s accounting honest
(``block_until_ready`` around timed sections) and adds what the reference
lacks: on-demand XLA profiler traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def xla_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed block.

    Usage:
        with xla_trace("/tmp/trace"):
            learner.learn(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside an XLA trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Accumulating wall-clock section timer with device-sync semantics.

    ``tick(name, sync=tree)`` blocks on ``tree`` (when given) so the recorded
    duration covers actual device work, then charges the elapsed time since
    the previous tick to ``name``.
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._last = time.perf_counter()

    def tick(self, name: str, sync: Optional[object] = None) -> float:
        if sync is not None:
            # Scalar fetch, not block_until_ready: the latter can return
            # before the producing program finishes on the axon tunnel
            # backend (CLAUDE.md "Measurement notes"), which would charge
            # this section's device work to the NEXT tick. Fetching one
            # element of one output leaf awaits the whole program.
            leaves = [x for x in jax.tree.leaves(sync) if hasattr(x, "ndim")]
            if leaves:
                x = leaves[0]
                jax.device_get(x if x.ndim == 0 else x.ravel()[0])
            else:
                jax.block_until_ready(sync)
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return dt

    def reset_clock(self) -> None:
        self._last = time.perf_counter()

    def summary(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(1, self.counts[name])
            for name in self.totals
        }
