"""Per-phase wall-clock instrumentation (SURVEY.md section 5.1).

The reference keeps global work counters (NFunCall/NEigenQ/NPMatUVRoot,
printed at src/codeml.c:770) and a start/print timer (src/tools.c:1086).
Here: a nestable phase timer plus optional XLA profiler capture.

    with phase("optimize"):
        ...
    report()              # prints per-phase totals and counts

    with xla_trace("/tmp/trace"):   # open in TensorBoard / xprof
        step(x)
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_TOTALS: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TOTALS[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


def report(out=None) -> dict:
    """Per-phase totals; prints a table when `out` is a stream."""
    rows = {k: dict(seconds=round(_TOTALS[k], 3), calls=_COUNTS[k])
            for k in sorted(_TOTALS)}
    if out is not None:
        out.write(f"{'phase':<24s} {'seconds':>10s} {'calls':>8s}\n")
        for k, v in rows.items():
            out.write(f"{k:<24s} {v['seconds']:>10.3f} {v['calls']:>8d}\n")
    return rows


def reset() -> None:
    _TOTALS.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace around the block (view with xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
