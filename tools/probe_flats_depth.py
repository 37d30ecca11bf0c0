"""Flats scan engine: tropical-scan depth sweep.

Flat-resolution distances are short chains (bounded by flat width), so
a truncated scan window should drop most of the lane-level doubling
steps without costing rotations.  Usage: python tools/probe_flats_depth.py [n]
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
    from richdem_tpu import ops, synth_jax
    from richdem_tpu.ops.fill import auto_epsilon
    from richdem_tpu.ops.flats import resolve_flats
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_pallas

    z = synth_jax.perlin_dem(n)
    eps = auto_epsilon(z)
    filled, _, _ = fill_fixpoint_pallas(z, None, eps=eps, max_iters=256)
    fd = jax.block_until_ready(ops.d8_flowdirs(filled))
    sync = timeit(lambda: float(jnp.zeros((8, 128)).sum() + 1.0))
    print(f"n={n} sync={sync*1e3:.1f} ms", flush=True)

    os.environ["RICHDEM_TPU_FLATS_ENGINE"] = "scan"
    ref = None
    for depth in os.environ.get("PROBE_DEPTHS", "0,8,16,64").split(","):
        os.environ["RICHDEM_TPU_SCAN_DEPTH"] = depth
        r, it, done = resolve_flats(filled, fd, return_info=True)
        if ref is None:
            ref = np.asarray(r)
        t = timeit(lambda: float(
            (jnp.asarray(resolve_flats(filled, fd)) != 0).sum()))
        ok = np.array_equal(ref, np.asarray(r))
        print(f"flats scan d{depth:>2s}: {t*1e3:7.1f} ms rot={int(it)} "
              f"done={bool(done)} bitwise={ok}", flush=True)
    os.environ.pop("RICHDEM_TPU_SCAN_DEPTH", None)
    os.environ.pop("RICHDEM_TPU_FLATS_ENGINE", None)


if __name__ == "__main__":
    main()
