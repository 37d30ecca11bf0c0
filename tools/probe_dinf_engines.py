"""D-infinity accumulation engine triple on the eps=1e-2 bench surface:

  folded two-tap   (current config-4 production path, ~14 rotations)
  scan two-tap     (rot4, depth 64)
  scan planes      (decoded proportions through the MFD kernel — no
                    per-row tap decode; RICHDEM_TPU_DINF_SCAN_PLANES)

Times include the angle->engine-input conversion each path pays inside
the config-4 step.  Usage: python tools/probe_dinf_engines.py [n]
"""
import os
import sys
import time

import jax
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
    from richdem_tpu import synth_jax
    from richdem_tpu.ops import pallas_scan as PS
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import (dinf_accumulation_gs,
                                             dinf_two_tap, two_tap_props)
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_pallas

    z = synth_jax.perlin_dem(n)
    filled, _, _ = fill_fixpoint_pallas(z, None, eps=1e-2, max_iters=256)
    ang = jax.block_until_ready(dinf_flowdirs(filled))
    sync = timeit(lambda: float(jnp.zeros((8, 128)).sum() + 1.0))
    print(f"n={n} sync={sync*1e3:.1f} ms (eps=1e-2 surface)", flush=True)

    @jax.jit
    def run_folded(ang):
        code, p = dinf_two_tap(ang)
        return dinf_accumulation_gs(code, p, return_info=True)

    a_ref, rot, _ = run_folded(ang)
    t = timeit(lambda: float(jnp.asarray(run_folded(ang)[0]).sum()))
    print(f"folded two-tap:      {t*1e3:7.1f} ms rot={int(rot)}",
          flush=True)
    ref = np.asarray(a_ref)

    @jax.jit
    def run_scan_tt(ang):
        code, p = dinf_two_tap(ang)
        return PS.dinf_accumulation_scan(code, p, max_rotations=512,
                                         return_info=True)

    for depth in ("8", "16", "64"):
        os.environ["RICHDEM_TPU_SCAN_DEPTH"] = depth
        os.environ.pop("RICHDEM_TPU_DINF_SCAN_PLANES", None)
        run_scan_tt.clear_cache()
        a, it, _ = run_scan_tt(ang)
        t = timeit(lambda: float(jnp.asarray(run_scan_tt(ang)[0]).sum()))
        ok = np.allclose(ref, np.asarray(a), rtol=1e-4)
        print(f"scan two-tap d{depth:>3s}:   {t*1e3:7.1f} ms "
              f"rot={int(it)} allclose={ok}", flush=True)

    @jax.jit
    def run_scan_planes(ang):
        code, p = dinf_two_tap(ang)
        return PS.mfd_accumulation_scan(two_tap_props(code, p),
                                        max_rotations=512,
                                        return_info=True)

    for depth in ("8", "16", "64"):
        os.environ["RICHDEM_TPU_SCAN_DEPTH"] = depth
        run_scan_planes.clear_cache()
        a, it, _ = run_scan_planes(ang)
        t = timeit(lambda: float(jnp.asarray(
            run_scan_planes(ang)[0]).sum()))
        ok = np.allclose(ref, np.asarray(a), rtol=1e-4)
        print(f"scan planes d{depth:>3s}:    {t*1e3:7.1f} ms "
              f"rot={int(it)} allclose={ok}", flush=True)
    os.environ.pop("RICHDEM_TPU_SCAN_DEPTH", None)


if __name__ == "__main__":
    main()
