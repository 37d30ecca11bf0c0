"""Out-of-core 16k² two-pass fill benchmark (VERDICT r2 missing #1).

Generates a 16384² perlin DEM on device (host synthesis is ~0.3 GB/s),
stages it to disk, then times the [P1] two-pass fill with the DEVICE
consumer vs the round-2 NATIVE consumer, verifying identical output.

Usage: python tools/outofcore_bench.py [size] [tile] [device|native|both]
"""
import json
import os
import sys
import time

import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    which = sys.argv[3] if len(sys.argv) > 3 else "device"

    import jax

    from richdem_tpu import synth_jax
    from richdem_tpu.parallel.outofcore import out_of_core_fill

    work = os.environ.get("OOC_DIR", "/tmp/ooc_bench")
    os.makedirs(work, exist_ok=True)
    dem_path = os.path.join(work, f"dem_{size}.npy")
    if not os.path.exists(dem_path):
        print("staging DEM to disk ...", flush=True)
        t0 = time.perf_counter()
        # stage to .tmp + rename so a crash mid-staging can't leave a
        # partial file that a rerun would mistake for the real DEM
        tmp_path = dem_path + ".tmp"
        mm = np.lib.format.open_memmap(tmp_path, mode="w+",
                                       dtype=np.float32,
                                       shape=(size, size))
        # generate + download strip-wise: bounds host memory AND device
        # temps (a full 16384^2 perlin_dem call OOMs on gather temps)
        strip = 4096
        for r0 in range(0, size, strip):
            zs = synth_jax.perlin_dem_rows(size, size, r0, strip, seed=3)
            mm[r0:r0 + strip] = np.asarray(zs)
        mm.flush()
        del mm
        os.replace(tmp_path, dem_path)
        print(f"staged in {time.perf_counter() - t0:.0f}s", flush=True)

    results = {}
    for consumer in (["device", "native"] if which == "both"
                     else [which]):
        stats = {}
        out_path = os.path.join(work, f"filled_{consumer}.npy")
        t0 = time.perf_counter()
        out_of_core_fill(dem_path, out_path, tile=tile,
                         method="twopass", consumer=consumer,
                         stats=stats, verbose=True)
        dt = time.perf_counter() - t0
        results[consumer] = dt
        print(json.dumps({"consumer": consumer, "seconds": round(dt, 1),
                          "cells_per_s": round(size * size / dt, 0),
                          **{k: v for k, v in stats.items()}}),
              flush=True)
    if which == "both":
        a = np.load(os.path.join(work, "filled_device.npy"),
                    mmap_mode="r")
        b = np.load(os.path.join(work, "filled_native.npy"),
                    mmap_mode="r")
        for r0 in range(0, size, 4096):
            assert np.array_equal(a[r0:r0 + 4096], b[r0:r0 + 4096]), \
                f"mismatch in rows {r0}.."
        print("outputs identical", flush=True)


if __name__ == "__main__":
    main()
