"""Config-4 epsilon choice: the fill epsilon shapes the D-infinity
drainage field, and the accumulation's rotation count follows the
field's direction-alternation depth.  bench.py's dinf_twi config fills
with eps=1e-2; this probe measures dinf rotations + total accum time on
surfaces filled with eps in {1e-2, auto_epsilon, 0+flat-resolution}.

Usage: python tools/probe_c4_eps.py [n]
"""
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
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.fill import auto_epsilon
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import (dinf_accumulation_gs,
                                             dinf_two_tap)
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_pallas

    z = synth_jax.perlin_dem(n)
    float(jnp.asarray(z).sum())
    sync = timeit(lambda: float(jnp.zeros((8, 128)).sum() + 1.0))
    eps_auto = float(auto_epsilon(z))
    print(f"n={n} sync={sync*1e3:.1f} ms auto_eps={eps_auto:.2e}",
          flush=True)

    for name, eps in (("1e-2", 1e-2), ("auto", eps_auto),
                      ("1e-5", 1e-5)):
        filled, fi, fdone = fill_fixpoint_pallas(z, None, eps=eps,
                                                 max_iters=256)
        ang = dinf_flowdirs(filled)
        code, p = dinf_two_tap(ang)
        a, rot, done = dinf_accumulation_gs(code, p, return_info=True)
        t = timeit(lambda: float(jnp.asarray(
            dinf_accumulation_gs(code, p)).sum()))
        nf = int((np.asarray(ang) == -1).sum())
        print(f"eps={name}: fill_iters={int(fi)} dinf_rot={int(rot)} "
              f"accum={t*1e3:.1f} ms done={bool(done)} noflow={nf}",
              flush=True)


if __name__ == "__main__":
    main()
