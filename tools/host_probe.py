"""Host page-fault latency probe.

The measurement host intermittently enters a state where every fresh
anonymous page fault costs ~500-1000us of kernel time (normal: ~1us),
making any JVM/allocation-heavy workload 10-100x slower while load1 stays
low and user-CPU speed is normal.  Symptom fingerprint: `time java
-version` shows sys >> user; a fixed alloc loop is dominated by stime.

Run this before trusting ANY timing: it faults 8 MB of fresh pages and
reports the per-fault cost.  <5us = quiet host, numbers usable.
>100us = degraded host; bench/isolated readings measure the hypervisor,
not the engine.

Usage: python tools/host_probe.py  ->  one JSON line.
"""

from __future__ import annotations

import json
import os
import time


def probe(size_mb: int = 8) -> dict:
    n = size_mb << 20
    b = bytearray(n)  # faults lazily on write below (bytearray zero-fills
    # via calloc; pages are faulted on first touch)
    t0 = time.time()
    for i in range(0, n, 4096):
        b[i] = 1
    dt = time.time() - t0
    pages = n // 4096
    return {
        "fresh_mb": size_mb,
        "sec": round(dt, 3),
        "us_per_fault": round(dt / pages * 1e6, 2),
        "load1": round(os.getloadavg()[0], 2),
        "quiet": dt / pages * 1e6 < 5.0,
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
