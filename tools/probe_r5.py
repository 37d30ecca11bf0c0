"""Round-5 probe: scan-depth sweep on the BENCH surface (eps=1e-2 fill).

The round-4b probe surface (plain eps=0 fill) and the dinf_twi/quinn_mfd
bench configs (eps=1e-2 fill — their ramps braid flow paths harder) give
different rotation counts (D∞ 4 vs 6, Quinn 11 vs 18), so depth defaults
must be picked on the bench surface.  Times total time-to-convergence
per (metric, depth) plus the D∞ planes route at shallow depths.

Usage: python tools/probe_r5.py [n] [metric ...]
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
    metrics = sys.argv[2:] or ["dinf", "quinn"]
    from richdem_tpu import synth_jax
    from richdem_tpu.ops import pallas_scan as PS
    from richdem_tpu.ops.flowdirs import dinf_flowdirs, flow_proportions
    from richdem_tpu.ops.pallas_dinf import dinf_two_tap
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_pallas

    z = synth_jax.perlin_dem(n)
    filled, _, _ = fill_fixpoint_pallas(z, None, eps=1e-2, max_iters=256)
    float(filled.sum())
    sync = timeit(lambda: float(jnp.zeros((8, 128)).sum() + 1.0))
    print(f"n={n} eps=1e-2 surface, sync={sync*1e3:.1f} ms", flush=True)

    runs = {}
    if "dinf" in metrics:
        ang = dinf_flowdirs(filled)
        code, p = dinf_two_tap(ang)
        runs["dinf"] = (lambda: PS.dinf_accumulation_scan(
            code, p, max_rotations=512, return_info=True))
        runs["dinfP"] = runs["dinf"]  # planes route, toggled below
    if "quinn" in metrics:
        props = flow_proportions(filled, method="Quinn")
        float(jnp.asarray(props).sum())
        runs["quinn"] = (lambda: PS.mfd_accumulation_scan(
            props, max_rotations=512, return_info=True))

    ref = {}
    for name, fn in runs.items():
        os.environ.pop("RICHDEM_TPU_SCAN_DEPTH", None)
        if name == "dinfP":
            os.environ["RICHDEM_TPU_DINF_SCAN_PLANES"] = "1"
        a, it, _ = fn()
        ref[name] = np.asarray(a)
        t = timeit(lambda: float(jnp.asarray(fn()[0]).sum()))
        print(f"{name:5s} default: {t*1e3:7.1f} ms rot={int(it):3d} "
              f"({(t-sync)/int(it)*1e3:.2f} ms/rot)", flush=True)
        os.environ.pop("RICHDEM_TPU_DINF_SCAN_PLANES", None)

    depths = os.environ.get("PROBE_DEPTHS", "1,2,4,8,16").split(",")
    for depth in depths:
        os.environ["RICHDEM_TPU_SCAN_DEPTH"] = depth
        for name, fn in runs.items():
            if name == "dinfP":
                os.environ["RICHDEM_TPU_DINF_SCAN_PLANES"] = "1"
            try:
                a, it, done = fn()
                if not bool(done):
                    print(f"{name:5s} d{depth:>3s}: DID NOT CONVERGE",
                          flush=True)
                    continue
                t = timeit(lambda: float(jnp.asarray(fn()[0]).sum()))
                ok = np.allclose(ref[name], np.asarray(a), rtol=1e-4)
                print(f"{name:5s} d{depth:>3s}: {t*1e3:7.1f} ms "
                      f"rot={int(it):3d} "
                      f"({(t-sync)/max(int(it),1)*1e3:.2f} ms/rot) "
                      f"allclose={ok}", flush=True)
            except Exception as e:
                print(f"{name:5s} d{depth:>3s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
            finally:
                os.environ.pop("RICHDEM_TPU_DINF_SCAN_PLANES", None)
    os.environ.pop("RICHDEM_TPU_SCAN_DEPTH", None)


if __name__ == "__main__":
    main()
