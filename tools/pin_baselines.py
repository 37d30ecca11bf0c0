"""Pin per-config single-core baselines into BASELINE_PINNED.json.

Each bench config does different work (D8 pipeline, epsilon-fill + flat
resolution, D-infinity accumulation + TWI, Quinn MFD accumulation), so
each ``vs_baseline`` must divide by a native C++ engine run doing the
SAME work (richdem_tpu/native/core.cpp — heap Priority-Flood +
topological-queue accumulation, the reference's own design per
SURVEY.md §2.2).

Contention correction: the committed pipeline pin (5.5 Mcells/s,
steady-state, VERDICT r2 weak #5) stays the anchor.  This host is noisy
(±30%), so the other configs are pinned as

    pin[config] = PIPELINE_PIN * measured[config] / measured[pipeline]

with all four measured back-to-back in one process — the RATIO between
configs is stable under uniform host contention even when the absolute
figures are not.

Usage: python tools/pin_baselines.py [n]   (default n=1024)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from richdem_tpu import native, synth  # noqa: E402

PIPELINE_PIN = 5.5e6  # committed steady-state anchor (BASELINE_PINNED.json r3)


def _best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    assert native.available(), "native engine required to pin baselines"
    dem = np.asarray(synth.perlin_dem(n, seed=11, dtype=np.float64))

    def pipeline():
        acc = native.accum_d8(native.d8_flowdirs(native.fill(dem)))
        assert acc.sum() > 0

    def fill_flats():
        filled = native.fill(dem, eps=1e-3)
        fd = native.d8_flowdirs(filled)
        native.resolve_flats(filled, fd)

    def dinf_twi():
        filled = native.fill(dem, eps=1e-2)
        ang = native.dinf_flowdirs(filled)
        acc = native.accum_props(native.dinf_props(ang))
        native.twi(acc, native.slope_radians(filled))

    def quinn_mfd():
        filled = native.fill(dem, eps=1e-2)
        native.accum_props(native.mfd_props(filled, exponent=1.0))

    raw = {}
    for name, fn in [("pipeline", pipeline), ("fill_flats", fill_flats),
                     ("dinf_twi", dinf_twi), ("quinn_mfd", quinn_mfd)]:
        secs = _best_of(fn)
        raw[name] = n * n / secs
        print(f"{name:11s} {secs:7.3f} s  {raw[name] / 1e6:6.2f} Mcells/s")

    scale = PIPELINE_PIN / raw["pipeline"]
    configs = {k: round(v * scale, 1) for k, v in raw.items()}
    print("contention scale:", round(scale, 3))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_PINNED.json")
    out = {
        "cells_per_s": PIPELINE_PIN,  # legacy key = pipeline config
        "what": ("native C++ per-config throughput, anchored to the "
                 "5.5 Mcells/s steady-state pipeline pin; ratios "
                 f"measured back-to-back at {n}^2 (tools/pin_baselines.py)"),
        "configs": configs,
        "raw_measured_cells_per_s": {k: round(v, 1) for k, v in raw.items()},
        "measured_n": n,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
