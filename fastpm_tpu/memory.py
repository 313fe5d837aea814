"""Memory accounting and reporting.

The reference owns allocation outright (libfastpm/memory.c: a two-sided
bump arena with tagged blocks, a peak callback, and an OOM dump;
report_memory at src/fastpm.c:1604-1646 prints the cross-rank peak
after every transition, and the -m CLI flag turns runaway allocation
into a clean abort).  On TPU, XLA owns allocation, so the equivalents
here are observational: device memory_stats() (TPU backends expose
bytes_in_use/peak_bytes_in_use), host RSS, a peak tracker that only
logs when the peak moves (matching report_memory's dedup), and a
configurable bound that raises instead of letting the process die in
an unhelpful place.
"""

from __future__ import annotations

import resource
from typing import Optional

import jax

__all__ = ["device_memory_stats", "host_peak_rss_bytes",
           "MemoryMonitor", "MemoryBoundExceeded"]


class MemoryBoundExceeded(RuntimeError):
    """Raised when usage exceeds the bound set via -m (param.c:52-54)."""


def device_memory_stats(device=None) -> dict:
    """Per-device allocator statistics. Returns {} on backends that do
    not expose them (CPU)."""
    if device is None:
        device = jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    return dict(stats) if stats else {}


def host_peak_rss_bytes() -> int:
    """Peak resident set size of this process (ru_maxrss is KiB on
    Linux)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


class MemoryMonitor:
    """Tracks the peak and reports only when it moves
    (report_memory, src/fastpm.c:1613-1646)."""

    def __init__(self, bound_bytes: Optional[int] = None):
        self.bound_bytes = bound_bytes
        self._old_device_peak = -1
        self._old_host_peak = -1

    def snapshot(self) -> dict:
        dstats = device_memory_stats()
        return {
            "device_bytes_in_use": int(dstats.get("bytes_in_use", 0)),
            "device_peak_bytes": int(
                dstats.get("peak_bytes_in_use",
                           dstats.get("bytes_in_use", 0))),
            "device_bytes_limit": int(dstats.get("bytes_limit", 0)),
            "host_peak_rss": host_peak_rss_bytes(),
        }

    def report(self, log=None) -> Optional[str]:
        """Log 'Peak memory usage' lines when the peak changed since
        the last report; returns the line (or None if unchanged)."""
        s = self.snapshot()
        line = None
        if (s["device_peak_bytes"] != self._old_device_peak
                or s["host_peak_rss"] != self._old_host_peak):
            self._old_device_peak = s["device_peak_bytes"]
            self._old_host_peak = s["host_peak_rss"]
            line = ("Peak memory usage: device %g MB (in use %g MB) "
                    "host rss %g MB"
                    % (s["device_peak_bytes"] / 1024. / 1024,
                       s["device_bytes_in_use"] / 1024. / 1024,
                       s["host_peak_rss"] / 1024. / 1024))
            if log is not None:
                log.info("%s", line)
            else:
                print(line)
        self.check_bound(s)
        return line

    def check_bound(self, snapshot: Optional[dict] = None) -> None:
        if self.bound_bytes is None:
            return
        s = snapshot or self.snapshot()
        used = max(s["device_bytes_in_use"], s["host_peak_rss"])
        if used > self.bound_bytes:
            raise MemoryBoundExceeded(
                "memory usage %g MB exceeds the bound %g MB "
                "(device in use %g MB, host rss %g MB)"
                % (used / 1024. / 1024,
                   self.bound_bytes / 1024. / 1024,
                   s["device_bytes_in_use"] / 1024. / 1024,
                   s["host_peak_rss"] / 1024. / 1024))
