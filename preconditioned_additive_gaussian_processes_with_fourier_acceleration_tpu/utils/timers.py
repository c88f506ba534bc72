"""Per-stage timers and profiling hooks.

The reference accumulates wall time inside each preconditioner struct
(_tset/_titt/_tits/_tlogdet/_tdvp, ref fsai.h:28-32, nys.c:168-170) and
prints ad-hoc stage lines.  The TPU-native equivalents:

- StageTimers: host-side accumulation around jitted calls (block_until_ready
  so device time is captured)
- trace(): context manager around jax.profiler for on-device traces
"""

import contextlib
import time
from collections import defaultdict

import jax


class StageTimers:
    """Accumulating wall timers keyed by stage name.

    >>> timers = StageTimers()
    >>> with timers("precond_setup"):
    ...     pre = jax.block_until_ready(setup(params))
    >>> timers.summary()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["stage                | total (s) | calls | per-call (ms)"]
        for name in sorted(self.totals):
            tot = self.totals[name]
            cnt = self.counts[name]
            lines.append(f"{name:20s} | {tot:9.3f} | {cnt:5d} | {1e3 * tot / cnt:10.2f}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(logdir: str = "/tmp/nfft4gp_tpu_trace"):
    """On-device profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed_block_until_ready(fn, *args, **kwargs):
    """Run fn, block on its outputs, return (result, elapsed_seconds)."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    return out, time.perf_counter() - t0
