"""Host-load snapshot for benchmark self-adjudication (VERDICT r11
task 3): two consecutive rounds re-litigated driver-row bench rises by
hand because neither bench.py nor the stress tools recorded host
state — this VM shows hypervisor-level load spikes (loadavg up to 12
with zero local processes) that swing walls ±30-50%. Every bench JSON
now carries a snapshot at run start and end, so a rise can be
adjudicated from the artifact itself: elevated load_1m / low
mem_available_kb at either edge marks the row as taken on a noisy
host.
"""

from __future__ import annotations

import time


def host_snapshot() -> dict:
    """One-line host-state record: loadavg (1/5/15 min), uptime secs,
    MemAvailable — everything /proc gives without spawning processes.
    Missing fields (non-Linux) come back as None rather than raising:
    the bench must never fail because adjudication data is absent."""
    snap: dict = {"ts": round(time.time(), 3)}
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
        snap["load_1m"], snap["load_5m"], snap["load_15m"] = (
            float(parts[0]),
            float(parts[1]),
            float(parts[2]),
        )
        snap["runnable"] = parts[3]
    except (OSError, ValueError, IndexError):
        snap["load_1m"] = snap["load_5m"] = snap["load_15m"] = None
    try:
        with open("/proc/uptime") as f:
            snap["uptime_sec"] = float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        snap["uptime_sec"] = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    snap["mem_available_kb"] = int(line.split()[1])
                    break
            else:
                snap["mem_available_kb"] = None
    except (OSError, ValueError, IndexError):
        snap["mem_available_kb"] = None
    return snap
