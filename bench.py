"""Benchmark driver: grid-points/s for the fill→flowdir→accum pipeline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the speedup over a single-core C++ implementation of the
same fill→flowdir→accum pipeline (richdem_tpu/native/core.cpp — the same
heap-based Priority-Flood + topological-queue design as the reference's C++
core), MEASURED on this host at 1024² and extrapolated per-cell.  If the
native engine is unavailable the paper-era constant ≈5 M cells/s is used
(BASELINE.md; the measured value on this host is ≈5-6 M cells/s, so the two
agree).  The >10× target of BASELINE.json corresponds to vs_baseline > 10.

Env knobs: BENCH_SIZE (grid edge, default 8192 on TPU / 1024 on CPU),
BENCH_REPS (default 5), BENCH_TERRAIN (perlin|cone|depressions).
"""

import json
import os
import sys
import time

import numpy as np

#: Fallback single-core CPU grid-points/s for fill+flowdir+accum.
BASELINE_CPU_PIPELINE = 5.0e6


def measure_cpu_baseline(terrain_fn, n=1024):
    """Single-core C++ pipeline throughput (cells/s) on this host."""
    try:
        from richdem_tpu import native
        if not native.available():
            return BASELINE_CPU_PIPELINE
        dem = np.asarray(terrain_fn(n), dtype=np.float64)
        best = float("inf")
        for _ in range(3):  # the host is noisy; best-of-3 is conservative
            t0 = time.perf_counter()
            acc = native.accum_d8(native.d8_flowdirs(native.fill(dem)))
            best = min(best, time.perf_counter() - t0)
        assert acc.sum() > 0
        return n * n / best
    except Exception:
        return BASELINE_CPU_PIPELINE


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
    # BENCH_CONFIG selects the BASELINE.md scenario:
    #   pipeline  (default) — config 3: fill → D8 flowdirs → accumulation
    #   fill_flats          — config 2: epsilon fill + flat resolution
    #   dinf_twi            — config 4: D∞ routing + accumulation + TWI
    config = os.environ.get("BENCH_CONFIG", "pipeline")
    label = "fill+flowdir+accum"

    if config == "pipeline":
        step = make_pipeline(z.shape, eps=eps, fill_iters=256)

        def run_once():
            out = step(z)
            # Force a device->host scalar round-trip: on the axon tunnel
            # backend, block_until_ready() returns before execution
            # finishes, so a materialized value is the only honest fence.
            return float(out["accum"].sum())
    elif config == "fill_flats":
        import jax.numpy as jnp
        from richdem_tpu import ops
        from richdem_tpu.ops.flats import resolve_flats
        from richdem_tpu.ops.fill import auto_epsilon
        label = "epsilon-fill+flat-resolution"
        eps_v = auto_epsilon(np.asarray(z[::64, ::64]))

        @jax.jit
        def step(z):
            filled = ops.fill_depressions(z, eps=eps_v)
            fd = ops.d8_flowdirs(filled)
            return resolve_flats(filled, fd)

        def run_once():
            return float((step(z) != 0).sum())
    elif config == "dinf_twi":
        from richdem_tpu import ops
        from richdem_tpu.methods import twi
        from richdem_tpu.ops.terrain import terrain_attribute
        label = "fill+dinf-accum+TWI"

        @jax.jit
        def step(z):
            filled = ops.fill_depressions(z, eps=1e-2)
            props = ops.flow_proportions(filled, method="Dinf")
            acc = ops.flow_accumulation_from_props(props)
            slope = terrain_attribute(filled, "slope_radians")
            return twi(acc, slope)

        def run_once():
            return abs(float(step(z)[::64, ::64].sum()))
    else:
        raise SystemExit(f"unknown BENCH_CONFIG {config!r}")

    # Warmup/compile.
    checksum = run_once()
    assert checksum > 0, "pipeline produced empty accumulation"

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    cells_per_s = size * size / best

    baseline = measure_cpu_baseline(gen)
    result = {
        "metric": (f"{label} grid-points/s "
                   f"({size}x{size} {terrain}, {platform})"),
        "value": round(cells_per_s, 1),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_s / baseline, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
