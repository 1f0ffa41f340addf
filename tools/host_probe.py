"""One-line host-speed probe: times a fixed 2000x2000 float64 matmul.

The round-12 session measured the sandbox host's effective CPU speed
swinging ~10x on a seconds timescale (same fresh-process matmul: 0.044 s
in a fast window, 0.52-0.85 s in slow windows; no /proc/stat steal
visible, no cpufreq sysfs).  Every wall-clock reading taken this round
is therefore bracketed by this probe so before/after comparisons can be
normalized to comparable host windows, and a reading taken in a slow
window is identifiable as such instead of being mistaken for a code
regression (the same discipline as SCALE.md's fresh-JVM adjudications).

Usage: python tools/host_probe.py [reps]   (default 3; prints min)
"""

from __future__ import annotations

import sys
import time


def probe(reps: int = 3) -> float:
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((2000, 2000))
    b = rng.random((2000, 2000))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        a @ b
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    print(f"{probe(reps) * 1000:.1f} ms")
