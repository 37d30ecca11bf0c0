"""Careful transfer-bandwidth probes for the axon tunnel."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    # fresh device arrays each time to defeat the host-copy cache
    for mb in (4, 16, 64):
        n = int(mb * 1e6 / 4)
        x = jnp.arange(n, dtype=jnp.float32) * 1.000001
        float(x.sum())
        t0 = time.perf_counter()
        h = np.asarray(x)
        d = time.perf_counter() - t0
        print(f"download {mb}MB fresh: {d*1e3:.1f} ms "
              f"({mb/1e3/d:.3f} GB/s)", flush=True)

    # uploads: repeat with distinct host buffers; sync via sum
    for mb in (4, 16, 64):
        n = int(mb * 1e6 / 4)
        bufs = [np.random.rand(n).astype(np.float32) for _ in range(3)]
        ts = []
        for b in bufs:
            t0 = time.perf_counter()
            y = jax.device_put(b)
            float(y.sum())
            ts.append(time.perf_counter() - t0)
        print(f"upload {mb}MB: {[f'{t*1e3:.0f}' for t in ts]} ms "
              f"(best {mb/1e3/min(ts):.3f} GB/s)", flush=True)

    # overlapped uploads: dispatch 4 then sync once
    n = int(16e6 / 4)
    bufs = [np.random.rand(n).astype(np.float32) for _ in range(4)]
    t0 = time.perf_counter()
    ys = [jax.device_put(b) for b in bufs]
    s = sum(float(y.sum()) for y in ys)
    d = time.perf_counter() - t0
    print(f"4x16MB overlapped: {d*1e3:.0f} ms ({64/1e3/d:.3f} GB/s) {s>0}",
          flush=True)

    # int8 upload (4x fewer bytes for fd rasters)
    b8 = np.random.randint(0, 8, int(64e6), np.int8)
    t0 = time.perf_counter()
    y = jax.device_put(b8)
    float(jnp.asarray(y, jnp.int32).sum())
    d = time.perf_counter() - t0
    print(f"upload 64MB int8: {d*1e3:.0f} ms ({64e-3/d:.3f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
