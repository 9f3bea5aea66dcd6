"""Tracing / profiling / throughput counters (SURVEY §5: the reference has
no tracing or timing code at all; these are the TPU-native equivalents).

- `trace(dir)`: context manager around `jax.profiler` for perfetto/xprof
  traces of harness runs.
- `Timer` / `throughput`: wall-clock counters with honest completion
  barriers (a real-scalar readback; `block_until_ready` is not a reliable
  barrier on remote TPU runtimes — see ops/boundary.py).
- `no_implicit_transfers()`: jax transfer-guard context that turns any
  accidental host<->device transfer inside a hot section into an error —
  the sanitizer analog SURVEY §5 prescribes (the reference needs none
  because everything is host NumPy; here a stray un-jitted op silently
  round-trips through the remote tunnel instead).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def no_implicit_transfers(level: str = "disallow"):
    """Fail loudly on implicit host<->device transfers in the enclosed block.

    Wrap steady-state serving/benchmark loops with this to guarantee the
    data path stays on-device: 'disallow' errors on implicit transfers
    (a stray un-jitted numpy op pulling a device array to host) while
    explicit `jax.device_put` / `np.asarray` readbacks remain legal."""
    with jax.transfer_guard(level):
        yield


def force_completion(tree) -> float:
    """Readback barrier: reduce every real leaf to a host scalar and return
    the sum (complex leaves must already be packed)."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += float(jnp.sum(jnp.abs(leaf)))
    return total


@dataclass
class Timer:
    """Named wall-clock sections with per-section totals."""
    sections: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def section(self, name: str, barrier_tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if barrier_tree is not None:
                force_completion(barrier_tree)
            dt = time.perf_counter() - t0
            self.sections[name] = self.sections.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"{k}: {v:.3f}s ({self.counts[k]}x)"
                 for k, v in sorted(self.sections.items(),
                                    key=lambda kv: -kv[1])]
        return "\n".join(lines)


def throughput(fn, inputs: List, unit_count: int, warmup: int = 1) -> float:
    """units/sec for fn over a list of inputs, with readback barriers."""
    for _ in range(warmup):
        force_completion(fn(inputs[0]))
    t0 = time.perf_counter()
    for x in inputs:
        force_completion(fn(x))
    dt = time.perf_counter() - t0
    return unit_count * len(inputs) / dt
