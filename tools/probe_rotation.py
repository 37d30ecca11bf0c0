"""Per-rotation cost breakdown for the folded accumulation kernels.

What exactly does one GS rotation cost at 4096²/8192², and where does
it go (sweeps vs transpose refolds vs the equality reduce)?  Informs
the round-3 rotation-reduction work (VERDICT r2 item 2/3).
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps=5):
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
    from richdem_tpu.ops import pallas_folded as PF
    from richdem_tpu.ops.pallas_sweeps import _PERM_TRANSPOSE, _pad_to

    z = synth_jax.perlin_dem(n)
    filled = ops.fill_depressions(z)
    fd = ops.d8_flowdirs(filled)
    float(jnp.asarray(fd, jnp.int32).sum())

    sync = timeit(lambda: float(jnp.zeros((8, 128)).sum() + 1.0))
    print(f"sync floor: {sync*1e3:.1f} ms", flush=True)

    # full accumulation with info
    acc, iters, done = PF.d8_accumulation_folded(fd, return_info=True)
    t = timeit(lambda: float(PF.d8_accumulation_folded(fd)[0, 0] + 0.0
                             if False else
                             jnp.asarray(
                                 PF.d8_accumulation_folded(fd)).sum()))
    print(f"accum total: {t*1e3:.1f} ms, rotations={int(iters)}, "
          f"per-rot={(t-sync)/int(iters)*1e3:.2f} ms", flush=True)

    # single pieces, jitted standalone
    f = PF._F
    fd_p = _pad_to(jnp.asarray(fd, jnp.int32).clip(0), 0,
                   mh=PF._FOLD_PAD, mw=PF._FOLD_PAD)
    w_p = _pad_to(jnp.ones_like(filled), 0.0, mh=PF._FOLD_PAD,
                  mw=PF._FOLD_PAD)
    fd_v = PF._fold(fd_p, f)
    w_v = PF._fold(w_p, f)
    acc0 = w_v

    sweep1 = jax.jit(lambda a: PF._accum_sweep(a, w_v, fd_v, f,
                                               False)[0])
    t1 = timeit(lambda: float(sweep1(acc0).sum()))
    print(f"1 sweep (fwd, incl sum-reduce+sync): {t1*1e3:.1f} ms "
          f"-> sweep ~{(t1-sync)*1e3:.1f}", flush=True)

    both = jax.jit(lambda a: PF._accum_sweep(
        PF._accum_sweep(a, w_v, fd_v, f, False)[0], w_v, fd_v, f,
        True)[0])
    t2 = timeit(lambda: float(both(acc0).sum()))
    print(f"2 sweeps: {(t2-sync)*1e3:.1f} ms", flush=True)

    refold = jax.jit(lambda a: PF._refold_T(a, f, f))
    t3 = timeit(lambda: float(refold(acc0).sum()))
    print(f"refold_T: {(t3-sync)*1e3:.1f} ms", flush=True)

    eq = jax.jit(lambda a, b: jnp.all(a == b))
    t4 = timeit(lambda: bool(eq(acc0, acc0)))
    print(f"equality reduce: {(t4-sync)*1e3:.1f} ms", flush=True)

    # D-infinity
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.accum import dinf_accumulation_from_angles
    ang = dinf_flowdirs(filled)
    acc, it2, _ = dinf_accumulation_from_angles(ang, return_info=True)
    td = timeit(lambda: float(jnp.asarray(
        dinf_accumulation_from_angles(ang)).sum()))
    print(f"dinf accum: {td*1e3:.1f} ms, rotations={int(it2)}, "
          f"per-rot={(td-sync)/int(it2)*1e3:.2f} ms", flush=True)

    # Quinn via generic MFD
    from richdem_tpu.ops.flowdirs import flow_proportions
    props = flow_proportions(filled, method="Quinn")
    from richdem_tpu.ops.pallas_mfd import mfd_accumulation_gs
    accq, itq, _ = mfd_accumulation_gs(props, return_info=True)
    tq = timeit(lambda: float(jnp.asarray(
        mfd_accumulation_gs(props)).sum()), reps=2)
    print(f"quinn accum: {tq*1e3:.1f} ms, rotations={int(itq)}, "
          f"per-rot={(tq-sync)/int(itq)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
