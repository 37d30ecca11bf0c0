"""Config-4 phase breakdown on the bench terrain (4096 perlin).

Times each phase of the dinf_twi bench step separately (batch-of-8
dispatches per fence, the steady-state posture), then A/Bs the D-inf
accumulation engines on the same inputs: folded two-tap (production
default) vs scan rot4 vs scan rot4 depth64.  Decides where config 4's
87 ms goes and whether an engine flip closes the 40x bar at 4096.
"""
import sys
import time

import jax
import jax.numpy as jnp


def timed(fn, batch=8, reps=3):
    fn()  # warm/compile
    float(jnp.asarray(fn()).sum())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(batch - 1):
            fn()
        float(jnp.asarray(fn()).sum())  # fence via scalar round-trip
        best = min(best, (time.perf_counter() - t0) / batch)
    return best * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from richdem_tpu import synth_jax
    from richdem_tpu.methods import twi
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import (dinf_accumulation_gs,
                                             dinf_two_tap, pack_two_tap)
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_pallas
    from richdem_tpu.ops.pallas_scan import _dinf_scan_impl
    from richdem_tpu.ops.terrain import terrain_attribute

    z = jax.block_until_ready(synth_jax.perlin_dem(n))
    print(f"n={n}", flush=True)

    fill = jax.jit(lambda zz: fill_fixpoint_pallas(zz, None, eps=1e-2,
                                                   max_iters=256)[0])
    filled = jax.block_until_ready(fill(z))
    print(f"fill:          {timed(lambda: fill(z)):7.1f} ms", flush=True)

    ang_f = jax.jit(dinf_flowdirs)
    ang = jax.block_until_ready(ang_f(filled))
    print(f"dinf_flowdirs: {timed(lambda: ang_f(filled)):7.1f} ms",
          flush=True)

    tt = jax.jit(dinf_two_tap)
    code, p = tt(ang)
    code, p = jax.block_until_ready(code), jax.block_until_ready(p)
    print(f"two_tap:       {timed(lambda: tt(ang)[1]):7.1f} ms", flush=True)

    w = jnp.ones((n, n), jnp.float32)

    fold = jax.jit(lambda c, pp: dinf_accumulation_gs(c, pp,
                                                      return_info=True))
    accf, itf, _ = fold(code, p)
    print(f"accum folded:  {timed(lambda: fold(code, p)[0]):7.1f} ms "
          f"rot={int(itf)}", flush=True)

    v = jax.block_until_ready(jax.jit(pack_two_tap)(code, p))
    for depth, tag in [(None, "scan rot4"), (64, "scan d64 "),
                       (256, "scan d256")]:
        sc = jax.jit(lambda vv: _dinf_scan_impl(vv, w, 512, rot4=True,
                                                depth=depth))
        accs, its, _ = sc(v)
        ok = bool(jnp.allclose(accs, accf, rtol=1e-4))
        print(f"accum {tag}: {timed(lambda: sc(v)[0]):7.1f} ms "
              f"rot={int(its)} allclose={ok}", flush=True)

    slope_f = jax.jit(lambda f: terrain_attribute(f, "slope_radians"))
    slope = jax.block_until_ready(slope_f(filled))
    print(f"slope:         {timed(lambda: slope_f(filled)):7.1f} ms",
          flush=True)
    twi_f = jax.jit(twi)
    jax.block_until_ready(twi_f(accf, slope))
    print(f"twi:           {timed(lambda: twi_f(accf, slope)):7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
