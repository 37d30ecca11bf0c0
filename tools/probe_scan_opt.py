"""Scan-kernel optimization probe: depth x unroll sweep on the real chip.

The scan sweeps run well below the HBM roofline (BASELINE.md r3: quinn
28%, dinf-rot4 ~24 ms/rotation at 4096^2 vs a ~4 ms bandwidth bound), so
the cost is per-row work inside the sequential Gauss-Seidel carry loop:
prefix-scan doubling steps (RICHDEM_TPU_SCAN_DEPTH) and loop/addressing
overhead (RICHDEM_TPU_SCAN_UNROLL).  This probe times total
time-to-convergence (rotations included, so the depth<->rotation
trade-off is priced in) for each (metric, depth, unroll) cell.

Usage: python tools/probe_scan_opt.py [n] [metric ...]
  metric in {d8, dinf, quinn}; default all three.
"""
import os
import sys
import time

import jax.numpy as jnp
import numpy as np


def timeit(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    metrics = sys.argv[2:] or ["d8", "dinf", "quinn"]
    from richdem_tpu import ops, synth_jax
    from richdem_tpu.ops import pallas_scan as PS
    from richdem_tpu.ops.flowdirs import dinf_flowdirs, flow_proportions
    from richdem_tpu.ops.pallas_dinf import dinf_two_tap

    z = synth_jax.perlin_dem(n)
    filled = ops.fill_depressions(z)
    fd = ops.d8_flowdirs(filled)
    float(jnp.asarray(fd, jnp.int32).sum())
    sync = timeit(lambda: float(jnp.zeros((8, 128)).sum() + 1.0))
    print(f"n={n} sync={sync*1e3:.1f} ms", flush=True)

    runs = {}
    if "d8" in metrics:
        runs["d8"] = (lambda **kw: PS.d8_accumulation_scan(
            fd, max_rotations=512, return_info=True))
    if "dinf" in metrics:
        ang = dinf_flowdirs(filled)
        code, p = dinf_two_tap(ang)
        runs["dinf"] = (lambda **kw: PS.dinf_accumulation_scan(
            code, p, max_rotations=512, return_info=True))
    if "quinn" in metrics:
        props = flow_proportions(filled, method="Quinn")
        float(jnp.asarray(props).sum())
        runs["quinn"] = (lambda **kw: PS.mfd_accumulation_scan(
            props, max_rotations=512, return_info=True))

    ref = {}
    for name, fn in runs.items():
        os.environ.pop("RICHDEM_TPU_SCAN_DEPTH", None)
        os.environ.pop("RICHDEM_TPU_SCAN_UNROLL", None)
        a, it, _ = fn()
        ref[name] = np.asarray(a)
        t = timeit(lambda: float(jnp.asarray(fn()[0]).sum()))
        print(f"{name:5s} default: {t*1e3:7.1f} ms rot={int(it):3d} "
              f"({(t-sync)/int(it)*1e3:.2f} ms/rot)", flush=True)

    depths = os.environ.get("PROBE_DEPTHS", "8,16,64,256").split(",")
    unrolls = os.environ.get("PROBE_UNROLLS", "1,2,4,8").split(",")
    for depth in depths:
        for unroll in unrolls:
            os.environ["RICHDEM_TPU_SCAN_DEPTH"] = depth
            os.environ["RICHDEM_TPU_SCAN_UNROLL"] = unroll
            for name, fn in runs.items():
                try:
                    a, it, done = fn()
                    if not bool(done):
                        print(f"{name:5s} d{depth:>4s} u{unroll}: "
                              "DID NOT CONVERGE", flush=True)
                        continue
                    t = timeit(lambda: float(jnp.asarray(fn()[0]).sum()))
                    ok = np.allclose(ref[name], np.asarray(a), rtol=1e-4)
                    print(f"{name:5s} d{depth:>4s} u{unroll}: {t*1e3:7.1f} ms "
                          f"rot={int(it):3d} "
                          f"({(t-sync)/max(int(it),1)*1e3:.2f} ms/rot) "
                          f"allclose={ok}", flush=True)
                except Exception as e:  # compile failures are data too
                    print(f"{name:5s} d{depth:>4s} u{unroll}: FAILED "
                          f"{type(e).__name__}: {str(e)[:100]}", flush=True)
    os.environ.pop("RICHDEM_TPU_SCAN_DEPTH", None)
    os.environ.pop("RICHDEM_TPU_SCAN_UNROLL", None)


if __name__ == "__main__":
    main()
