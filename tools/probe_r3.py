"""Round-3 design probes: transfer bandwidth, nonzero/gather costs, and
device consumer building-block timings on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).sum())


def t(fn, reps=3):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = 4096
    print("backend:", jax.default_backend(), flush=True)
    from richdem_tpu import synth_jax
    z = synth_jax.perlin_dem(n)
    sync(z)

    # 1. device->host download of the full tile
    zh = None

    def dl():
        nonlocal zh
        zh = np.asarray(z)
    d = t(dl)
    print(f"device->host 64MB: {d*1e3:.1f} ms  ({64e-3/d:.2f} GB/s)",
          flush=True)

    # 2. host->device upload
    def ul():
        sync(jax.device_put(zh))
    d = t(ul)
    print(f"host->device 64MB: {d*1e3:.1f} ms  ({64e-3/d:.2f} GB/s)",
          flush=True)

    # 3. nonzero at 16M (sparse mask ~ boundary density)
    m = (z - jnp.floor(z * 8) / 8) < 0.01  # ~sparse-ish mask
    cnt = int(m.sum())
    print("mask count:", cnt, flush=True)

    def nz():
        idx = jnp.nonzero(m.reshape(-1), size=cnt)[0]
        sync(idx)
    d = t(nz)
    print(f"nonzero 16M -> {cnt}: {d*1e3:.1f} ms", flush=True)

    # 4. gather cnt elements from 16M
    idx = jnp.nonzero(m.reshape(-1), size=cnt)[0]
    sync(idx)

    def ga():
        sync(z.reshape(-1)[idx])
    d = t(ga)
    print(f"gather {cnt} from 16M: {d*1e3:.1f} ms", flush=True)

    # 5. building blocks: fill, d8, resolve_flats, watersheds at 4096
    from richdem_tpu import ops
    from richdem_tpu.methods import watersheds_from_flowdirs
    from richdem_tpu.ops.flats import resolve_flats

    filled = ops.fill_depressions(z)
    d = t(lambda: sync(ops.fill_depressions(z)))
    print(f"fill 4096^2: {d*1e3:.1f} ms", flush=True)
    fd = ops.d8_flowdirs(filled)
    d = t(lambda: sync(ops.d8_flowdirs(filled).astype(jnp.int32)))
    print(f"d8 4096^2: {d*1e3:.1f} ms", flush=True)
    fdr = resolve_flats(filled, fd)
    d = t(lambda: sync(resolve_flats(filled, fd).astype(jnp.int32)))
    print(f"resolve_flats 4096^2: {d*1e3:.1f} ms", flush=True)
    ws = watersheds_from_flowdirs(fdr)
    d = t(lambda: sync(watersheds_from_flowdirs(fdr)))
    print(f"watersheds(resolve) 4096^2: {d*1e3:.1f} ms", flush=True)
    # label-boundary density on real terrain
    from richdem_tpu.ops.stencil import neighbor
    lb = neighbor(ws, 5, -1)
    bnd = int(((ws != lb) & (lb >= 0)).sum())
    print(f"E-boundary pairs at 4096^2: {bnd}", flush=True)

    # 6. table gather: raise[label] over 16M cells (apply-pass shape)
    table = jnp.arange(70000, dtype=jnp.float32)
    labc = jnp.clip(ws, 0, 69999)

    def tg():
        sync(table[labc])
    d = t(tg)
    print(f"table-gather 16M cells: {d*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
