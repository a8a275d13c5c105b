"""In-framework profiling: throughput counters + XLA trace capture.

The reference's only observability is a stderr scanline counter
(main.cpp:201). Here rendering/training entry points report structured
throughput (rays/s, paths/s, wall-clock) through ``Meter``, and
``trace()`` wraps any region in a ``jax.profiler`` trace whose xplane can
be inspected with tools/profile_xplane.py.

Axon caveat (measured): ``block_until_ready`` returns before server-side
execution, so ``Meter.stop`` forces a scalar device_get via ``sync()``
when given a device value — timings without a forced sync are fiction on
this backend.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def sync(value=None) -> None:
    """Force true completion: a scalar device_get over a leaf of ``value``."""
    if value is None:
        return
    leaves = jax.tree.leaves(value)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))


@dataclass
class Meter:
    """Accumulating throughput meter for render/train loops.

    >>> m = Meter("render")
    >>> with m.step(paths=131072, bounces=4) as s: out = fn(); s.value = out
    >>> print(m.report())
    """

    name: str
    paths: int = 0
    rays: int = 0
    seconds: float = 0.0
    steps: int = 0
    _t0: float = field(default=0.0, repr=False)

    @contextlib.contextmanager
    def step(self, paths: int, bounces: int = 1):
        class _S:
            value = None

        s = _S()
        t0 = time.time()
        yield s
        sync(s.value)
        self.seconds += time.time() - t0
        self.paths += paths
        self.rays += paths * bounces
        self.steps += 1

    @property
    def mrays_per_s(self) -> float:
        return self.rays / max(self.seconds, 1e-9) / 1e6

    @property
    def mpaths_per_s(self) -> float:
        return self.paths / max(self.seconds, 1e-9) / 1e6

    def report(self) -> str:
        return json.dumps(
            {
                "meter": self.name,
                "steps": self.steps,
                "seconds": round(self.seconds, 3),
                "mpaths_per_s": round(self.mpaths_per_s, 3),
                "mrays_per_s": round(self.mrays_per_s, 3),
            }
        )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/srt_trace"):
    """Capture a jax.profiler trace for the wrapped region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
