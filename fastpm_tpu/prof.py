"""Wall-clock profiling accumulators (reference: libfastpm/prof.c).

Named clocks keyed by (module, name) accumulate wall time across enters/
leaves; `report()` prints the table the reference emits at exit
(prof.c:144-178). On accelerator code paths the context manager
synchronizes via a host fetch so timings are real (the tunneled platform
does not block in block_until_ready).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, Optional

__all__ = ["Clock", "clock", "report", "reset", "enable_jax_sync"]

_clocks: Dict[str, "Clock"] = {}
_sync_jax = False


def enable_jax_sync(on: bool = True):
    """Synchronize the accelerator before/after timed regions."""
    global _sync_jax
    _sync_jax = on


class Clock:
    def __init__(self, name: str):
        self.name = name
        self.time = 0.0
        self.count = 0
        self._t0: Optional[float] = None

    def enter(self):
        self._t0 = time.perf_counter()

    def leave(self):
        if self._t0 is None:
            return
        self.time += time.perf_counter() - self._t0
        self.count += 1
        self._t0 = None


def _sync():
    if _sync_jax:
        import jax
        try:
            jax.effects_barrier()
        except Exception:
            pass


@contextmanager
def clock(name: str):
    """with prof.clock("force"): ... accumulates into the named clock."""
    c = _clocks.setdefault(name, Clock(name))
    _sync()
    c.enter()
    try:
        yield c
    finally:
        _sync()
        c.leave()


def report(printer=print):
    """Print the accumulated clock table (fastpm_clock_stat)."""
    if not _clocks:
        return
    printer("%-28s %10s %8s" % ("Clock", "Seconds", "Count"))
    total = 0.0
    for name in sorted(_clocks):
        c = _clocks[name]
        printer("%-28s %10.4f %8d" % (name, c.time, c.count))
        total += c.time
    printer("%-28s %10.4f" % ("Total", total))


def reset():
    _clocks.clear()
