"""Cold-page-touch canary shared by every stress/bench tool.

On this virtualized host, first-touch page faults can degrade 100-300x
when the hypervisor is memory-overcommitted (measured 7 MB/s vs 2000+
MB/s warm), dominating every allocation-heavy stage.  Printing the
canary with EVERY stress table row is what makes cross-round wall-clock
comparisons honest (BASELINE.md convention; r2 verdict #9)."""
import time

import numpy as np


def cold_touch_mb_s() -> float:
    """First-touch bandwidth (MB/s) on a fresh 256 MB buffer."""
    t0 = time.time()
    np.ones(32_000_000, dtype=np.float64)
    return round(256 / (time.time() - t0), 1)


def print_canary() -> float:
    v = cold_touch_mb_s()
    print(f"cold_touch_mb_s={v}", flush=True)
    return v
