"""Profiling + throughput observability.

The reference's only observability is timestamped progress prints
(SURVEY.md section 5). Here:

* ``StageTimer`` -- lightweight per-stage wall/byte counters for host
  pipelines (chips/s, bytes/s per stage);
* ``trace`` -- context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device + host activity;
* ``duty_cycle`` -- measure device busy fraction for a step function
  against an input iterator (the BASELINE >95% metric).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Iterator


class StageTimer:
    """Accumulates wall time + item/byte counts per named stage."""

    def __init__(self):
        self.seconds: Dict[str, float] = defaultdict(float)
        self.items: Dict[str, int] = defaultdict(int)
        self.bytes: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 1, nbytes: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            self.items[name] += items
            self.bytes[name] += nbytes

    def report(self) -> str:
        lines = []
        for name in sorted(self.seconds):
            s = self.seconds[name]
            line = f"{name:24s} {s:8.3f}s"
            if self.items[name]:
                line += f"  {self.items[name] / max(s, 1e-9):10.1f} items/s"
            if self.bytes[name]:
                line += f"  {self.bytes[name] / max(s, 1e-9) / 1e6:8.1f} MB/s"
            lines.append(line)
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (open the logdir in TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def duty_cycle(step_fn: Callable, batches: Iterator, n_steps: int,
               device_only_batch=None) -> Dict[str, float]:
    """Measure end-to-end step rate and the device-busy fraction.

    Runs ``n_steps`` with the real input feed (async dispatch, one sync
    at the end), then re-runs the same count on a resident batch whose
    content is rolled per step -- identical repeated dispatches would
    be content-memoized by the axon relay (CLAUDE.md: never trust
    repeated-identical-input timings), reporting near-zero device time.
    duty = device_time / e2e_time. On a tunneled setup both windows
    include the per-dispatch relay overhead; for the clean h/s
    decomposition use tpu_evidence.py's K-vs-2K method instead."""
    import jax
    import jax.numpy as jnp

    first = next(batches)
    out = step_fn(*first)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        batch = next(batches)
        out = step_fn(*batch)
    jax.block_until_ready(out)
    e2e = time.perf_counter() - t0

    # the "device-only" window must actually be device-resident: the
    # default batch comes from the (host numpy) feed, and leaving it on
    # the host would re-upload images AND labels inside the timed
    # window every step, inflating device_seconds and the duty ratio
    resident = device_only_batch if device_only_batch is not None else first
    resident = jax.device_put(tuple(resident))
    jax.block_until_ready(resident)
    rest = tuple(resident[1:])
    t0 = time.perf_counter()
    for i in range(n_steps):
        # roll the flattened batch by a per-step amount: distinct
        # dispatch content each step (dtype/shape preserved, one cheap
        # device op) so relay memoization cannot fake the timing
        imgs = jnp.roll(resident[0], i + 1, axis=None)
        out = step_fn(imgs, *rest)
    jax.block_until_ready(out)
    dev = time.perf_counter() - t0

    return {"e2e_seconds": e2e, "device_seconds": dev,
            "steps_per_sec": n_steps / e2e,
            "duty_cycle": min(dev / e2e, 1.0)}
