"""Memory accounting (libfastpm/memory.c observability analogs)."""

import pytest

from fastpm_tpu.memory import (MemoryMonitor, MemoryBoundExceeded,
                               host_peak_rss_bytes, device_memory_stats)


def test_host_rss_positive():
    assert host_peak_rss_bytes() > 10 << 20   # >10 MB for a jax process


def test_monitor_reports_only_on_peak_change():
    m = MemoryMonitor()
    first = m.report()
    assert first is not None and "Peak memory usage" in first
    # host peak rss cannot shrink; immediately re-reporting is a no-op
    assert m.report() is None


def test_memory_bound_raises():
    m = MemoryMonitor(bound_bytes=1 << 20)   # 1 MB: always exceeded
    with pytest.raises(MemoryBoundExceeded):
        m.report()


def test_device_stats_dict():
    # CPU backend exposes no stats; must degrade to {} not raise
    assert isinstance(device_memory_stats(), dict)
