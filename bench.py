"""Benchmark driver: grid-points/s for the fill→flowdir→accum pipeline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the speedup over a single-core C++-class CPU
implementation of the same pipeline.  The reference mount was empty
(SURVEY.md provenance), so the baseline constant is the order-of-magnitude
serial pipeline throughput from the Priority-Flood papers' era measurements
(BASELINE.md: ≈1–20 M cells/s per stage ⇒ ≈5 M cells/s for the 3-stage
pipeline on one core).  The >10× target of BASELINE.json therefore
corresponds to vs_baseline > 10.

Env knobs: BENCH_SIZE (grid edge, default 8192 on TPU / 1024 on CPU),
BENCH_REPS (default 5), BENCH_TERRAIN (perlin|cone|depressions).
"""

import json
import os
import sys
import time

import numpy as np

#: Assumed single-core CPU grid-points/s for fill+flowdir+accum (see above).
BASELINE_CPU_PIPELINE = 5.0e6


def main():
    import jax

    platform = jax.devices()[0].platform
    default_size = 8192 if platform != "cpu" else 1024
    size = int(os.environ.get("BENCH_SIZE", default_size))
    reps = int(os.environ.get("BENCH_REPS", 5))
    terrain = os.environ.get("BENCH_TERRAIN", "perlin")

    # Terrain is generated ON DEVICE (synth_jax): the build host's memory
    # bandwidth is pathologically low (~0.1-0.5 GB/s measured), so host-side
    # numpy generation of large rasters takes minutes.
    from richdem_tpu import synth_jax
    from richdem_tpu.pipeline import make_pipeline

    gen = {"perlin": synth_jax.perlin_dem,
           "depressions": synth_jax.depression_dem,
           "cone": synth_jax.cone_dem}[terrain]
    z = jax.block_until_ready(gen(size))
    # Plain fill (the reference's FillDepressions default).  f32 ulp-scale
    # epsilons create a rounding-creep convergence tail — see ops/fill.py.
    eps = 0.0
    step = make_pipeline(z.shape, eps=eps, fill_iters=256)

    # Warmup/compile.
    out = step(z)
    jax.block_until_ready(out)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(step(z))
        times.append(time.perf_counter() - t0)
    best = min(times)
    cells_per_s = size * size / best

    result = {
        "metric": (f"fill+flowdir+accum grid-points/s "
                   f"({size}x{size} {terrain}, {platform})"),
        "value": round(cells_per_s, 1),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_s / BASELINE_CPU_PIPELINE, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
