"""Config-2 breakdown on the real chip: ε-fill vs flats sweep costs.

Where do config 2's milliseconds go at 4096² (VERDICT r2 item 3:
"profile flats' remaining sweeps")?
"""
import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, reps=4):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import os
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from richdem_tpu import ops, synth_jax
    from richdem_tpu.ops.fill import auto_epsilon
    from richdem_tpu.ops.flats import resolve_flats
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    from richdem_tpu.ops.pallas_scan import fill_fixpoint_scan

    z = synth_jax.perlin_dem(n)
    float(z.sum())
    sync = timeit(lambda: float(jnp.zeros((8, 128)).sum() + 1.0))
    eps_v = auto_epsilon(z)
    print(f"n={n} sync={sync*1e3:.1f} ms eps={float(eps_v):.2e}",
          flush=True)

    filled, fit, fdone = fill_fixpoint_folded(z, eps=eps_v)
    tf = timeit(lambda: float(jnp.asarray(
        fill_fixpoint_folded(z, eps=eps_v)[0]).sum()))
    print(f"eps-fill folded: {tf*1e3:.1f} ms rot={int(fit)} "
          f"({(tf-sync)/max(int(fit),1)*1e3:.2f} ms/rot)", flush=True)

    fs, fits, _ = fill_fixpoint_scan(z, eps=eps_v)
    tfs = timeit(lambda: float(jnp.asarray(
        fill_fixpoint_scan(z, eps=eps_v)[0]).sum()))
    ok = bool(jnp.allclose(fs, filled, rtol=1e-5, atol=1e-3))
    print(f"eps-fill scan:   {tfs*1e3:.1f} ms rot={int(fits)} "
          f"({(tfs-sync)/max(int(fits),1)*1e3:.2f} ms/rot) "
          f"allclose={ok}", flush=True)

    fd = ops.d8_flowdirs(filled)
    td = timeit(lambda: float(jnp.asarray(
        ops.d8_flowdirs(filled), jnp.int32).sum()))
    print(f"d8: {td*1e3:.1f} ms", flush=True)

    trs = {}
    for eng in ("folded", "scan"):
        os.environ["RICHDEM_TPU_FLATS_ENGINE"] = eng
        res, sit, sdone = resolve_flats(filled, fd, return_info=True)
        tr = timeit(lambda: float(jnp.asarray(
            resolve_flats(filled, fd), jnp.int32).sum()))
        trs[eng] = (tr, res)
        print(f"resolve_flats {eng}: {tr*1e3:.1f} ms "
              f"rotations={int(sit)} "
              f"({(tr-sync)/max(int(sit),1)*1e3:.2f} ms/rot) "
              f"converged={bool(sdone)}", flush=True)
    del os.environ["RICHDEM_TPU_FLATS_ENGINE"]
    same = bool(jnp.all(trs["folded"][1] == trs["scan"][1]))
    print(f"flats engines bitwise equal: {same}", flush=True)
    # how many flat cells even exist after the eps fill?
    from richdem_tpu.topology import NO_FLOW
    nf = int((jnp.asarray(fd) == NO_FLOW).sum())
    print(f"NO_FLOW cells after eps-fill: {nf} "
          f"({100.0*nf/(n*n):.3f}%)", flush=True)

    for fill_t, fl, trr in ((tf, "folded", trs["folded"][0]),
                            (tfs, "scan", trs["scan"][0])):
        total = fill_t + td + trr
        print(f"config2 total [{fl} fill+flats] ≈ {total*1e3:.1f} ms -> "
              f"{n*n/total/1e6:.0f} Mcells/s "
              f"({n*n/total/5.5e6:.1f}x pinned baseline)", flush=True)

    # truncated scan depths for the scan fill + scan flats
    for depth in ("64", "256", "1024"):
        os.environ["RICHDEM_TPU_SCAN_DEPTH"] = depth
        fsd, fitd, fdoned = fill_fixpoint_scan(z, eps=eps_v,
                                               max_iters=512)
        tfd = timeit(lambda: float(jnp.asarray(
            fill_fixpoint_scan(z, eps=eps_v, max_iters=512)[0]).sum()))
        ok = bool(jnp.allclose(fsd, filled, rtol=1e-5, atol=1e-3))
        print(f"eps-fill scan depth{depth}: {tfd*1e3:.1f} ms "
              f"rot={int(fitd)} "
              f"({(tfd-sync)/max(int(fitd),1)*1e3:.2f} ms/rot) "
              f"allclose={ok} converged={bool(fdoned)}", flush=True)
        os.environ["RICHDEM_TPU_FLATS_ENGINE"] = "scan"
        resd, sitd, sdoned = resolve_flats(filled, fd, return_info=True)
        trd = timeit(lambda: float(jnp.asarray(
            resolve_flats(filled, fd), jnp.int32).sum()))
        same = bool(jnp.all(resd == trs["folded"][1]))
        print(f"resolve_flats scan depth{depth}: {trd*1e3:.1f} ms "
              f"rotations={int(sitd)} bitwise={same} "
              f"converged={bool(sdoned)}", flush=True)
        del os.environ["RICHDEM_TPU_FLATS_ENGINE"]
    del os.environ["RICHDEM_TPU_SCAN_DEPTH"]


if __name__ == "__main__":
    main()
