"""Wall-clock phase timers + compile warmup.

Equivalent of the reference's timer helpers
(/root/reference/src/common/timer.h:27-41) and its GPU warmup kernel
(src/kernels/warmup.cpp:34-108) — on TPU the analogue of absorbing CUDA
init cost is triggering compilation + device init before timing.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp


class PhaseTimer:
    """Accumulating named phase timer; ``report()`` mirrors the
    ``printTimings`` layout (src/patchgrid.cpp:334-345)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block: bool = True):
        start = time.perf_counter()
        yield
        if block:
            # device timing needs completion, like cudaDeviceSynchronize
            jax.effects_barrier()
        self.totals[name] += (time.perf_counter() - start) * 1000.0
        self.counts[name] += 1

    def report(self) -> str:
        lines = ["=============== Timings (ms) ==============="]
        for name, total in self.totals.items():
            lines.append(f"[{name:<12}] {total:10.3f}  (n={self.counts[name]})")
        lines.append("============================================")
        return "\n".join(lines)


def warmup(device=None) -> None:
    """Absorb device-init cost before timing (cu::warmup analogue)."""
    x = jnp.ones((8, 128), jnp.float32)
    jax.block_until_ready(jnp.dot(x, x.T))


def time_fn(fn, *args, iters: int = 10, warmup_iters: int = 2) -> float:
    """Median wall time (ms) of ``fn(*args)`` with block_until_ready."""
    for _ in range(warmup_iters):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    return times[len(times) // 2]
