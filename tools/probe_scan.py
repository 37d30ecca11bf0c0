"""Scan-GS vs folded kernels on the real chip: time + rotation counts."""
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from richdem_tpu import ops, synth_jax
    from richdem_tpu.ops import pallas_folded as PF
    from richdem_tpu.ops import pallas_scan as PS

    z = synth_jax.perlin_dem(n)
    filled = ops.fill_depressions(z)
    fd = ops.d8_flowdirs(filled)
    float(jnp.asarray(fd, jnp.int32).sum())
    sync = timeit(lambda: float(jnp.zeros((8, 128)).sum() + 1.0))
    print(f"n={n} sync={sync*1e3:.1f} ms", flush=True)

    acc_f, it_f, _ = PF.d8_accumulation_folded(fd, return_info=True)
    tf = timeit(lambda: float(jnp.asarray(
        PF.d8_accumulation_folded(fd)).sum()))
    print(f"folded d8: {tf*1e3:.1f} ms rot={int(it_f)} "
          f"({(tf-sync)/int(it_f)*1e3:.2f} ms/rot)", flush=True)

    acc_s, it_s, _ = PS.d8_accumulation_scan(fd, return_info=True)
    ts = timeit(lambda: float(jnp.asarray(
        PS.d8_accumulation_scan(fd)).sum()))
    print(f"scan d8:   {ts*1e3:.1f} ms rot={int(it_s)} "
          f"({(ts-sync)/int(it_s)*1e3:.2f} ms/rot)", flush=True)
    import numpy as np
    same = np.allclose(np.asarray(acc_f), np.asarray(acc_s), rtol=1e-6)
    print("outputs allclose:", same, flush=True)

    # D-infinity
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import dinf_accumulation_gs, dinf_two_tap
    ang = dinf_flowdirs(filled)
    code, p = dinf_two_tap(ang)
    a1, itd, _ = dinf_accumulation_gs(code, p, return_info=True)
    td = timeit(lambda: float(jnp.asarray(
        dinf_accumulation_gs(code, p)).sum()))
    print(f"folded dinf: {td*1e3:.1f} ms rot={int(itd)} "
          f"({(td-sync)/int(itd)*1e3:.2f} ms/rot)", flush=True)
    import os
    for rot in ("2", "4"):
        os.environ["RICHDEM_TPU_DINF_SCAN_ROT"] = rot
        a2, itd2, _ = PS.dinf_accumulation_scan(code, p,
                                                return_info=True)
        td2 = timeit(lambda: float(jnp.asarray(
            PS.dinf_accumulation_scan(code, p)).sum()))
        print(f"scan dinf rot{rot}: {td2*1e3:.1f} ms rot={int(itd2)} "
              f"({(td2-sync)/int(itd2)*1e3:.2f} ms/rot)", flush=True)
        same = np.allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5)
        print(f"dinf rot{rot} outputs allclose:", same, flush=True)
    del os.environ["RICHDEM_TPU_DINF_SCAN_ROT"]

    # truncated scan depths: fewer doubling steps per sweep vs extra
    # rotations (RICHDEM_TPU_SCAN_DEPTH; rot4 default for dinf)
    for depth in ("64", "256", "1024"):
        os.environ["RICHDEM_TPU_SCAN_DEPTH"] = depth
        a3, it3, _ = PS.d8_accumulation_scan(fd, return_info=True,
                                             max_rotations=512)
        t3 = timeit(lambda: float(jnp.asarray(
            PS.d8_accumulation_scan(fd, max_rotations=512)).sum()))
        ok = np.allclose(np.asarray(acc_f), np.asarray(a3), rtol=1e-5)
        print(f"scan d8 depth{depth}: {t3*1e3:.1f} ms rot={int(it3)} "
              f"({(t3-sync)/int(it3)*1e3:.2f} ms/rot) allclose={ok}",
              flush=True)
        a4, it4, _ = PS.dinf_accumulation_scan(code, p,
                                               return_info=True,
                                               max_rotations=512)
        t4 = timeit(lambda: float(jnp.asarray(
            PS.dinf_accumulation_scan(code, p,
                                      max_rotations=512)).sum()))
        ok = np.allclose(np.asarray(a1), np.asarray(a4), rtol=1e-3)
        print(f"scan dinf depth{depth}: {t4*1e3:.1f} ms rot={int(it4)} "
              f"({(t4-sync)/int(it4)*1e3:.2f} ms/rot) allclose={ok}",
              flush=True)
    del os.environ["RICHDEM_TPU_SCAN_DEPTH"]



def quinn(n):
    import numpy as np
    from richdem_tpu import ops, synth_jax
    from richdem_tpu.ops import pallas_scan as PS
    from richdem_tpu.ops.pallas_mfd import mfd_accumulation_gs
    from richdem_tpu.ops.flowdirs import flow_proportions
    z = synth_jax.perlin_dem(n)
    filled = ops.fill_depressions(z)
    props = flow_proportions(filled, method="Quinn")
    float(jnp.asarray(props).sum())
    sync = timeit(lambda: float(jnp.zeros((8, 128)).sum() + 1.0))
    a2, it2, _ = PS.mfd_accumulation_scan(props, return_info=True)
    t2 = timeit(lambda: float(jnp.asarray(
        PS.mfd_accumulation_scan(props)).sum()), reps=2)
    print(f"scan quinn:   {t2*1e3:.1f} ms rot={int(it2)} "
          f"({(t2-sync)/int(it2)*1e3:.2f} ms/rot)", flush=True)
    a1, it1, _ = mfd_accumulation_gs(props, return_info=True,
                                     engine="folded")
    t1 = timeit(lambda: float(jnp.asarray(
        mfd_accumulation_gs(props, engine="folded")).sum()), reps=2)
    print(f"folded quinn: {t1*1e3:.1f} ms rot={int(it1)} "
          f"({(t1-sync)/int(it1)*1e3:.2f} ms/rot)", flush=True)
    import numpy as np
    print("quinn allclose:",
          np.allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5),
          flush=True)
    import os
    for depth in ("64", "256", "1024"):
        os.environ["RICHDEM_TPU_SCAN_DEPTH"] = depth
        a3, it3, _ = PS.mfd_accumulation_scan(props, return_info=True,
                                              max_rotations=512)
        t3 = timeit(lambda: float(jnp.asarray(
            PS.mfd_accumulation_scan(props,
                                     max_rotations=512)).sum()), reps=2)
        ok = np.allclose(np.asarray(a1), np.asarray(a3), rtol=1e-3)
        print(f"scan quinn depth{depth}: {t3*1e3:.1f} ms "
              f"rot={int(it3)} ({(t3-sync)/int(it3)*1e3:.2f} ms/rot) "
              f"allclose={ok}", flush=True)
    del os.environ["RICHDEM_TPU_SCAN_DEPTH"]


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "quinn":
        quinn(int(sys.argv[1]))
    else:
        main()
