"""Two-process jax.distributed smoke check (SURVEY.md §4c): the multi-HOST
code path (jax.distributed.initialize + a global mesh spanning processes)
exercised on one box with CPU devices — the way the reference tests its
MPI programs with mpirun -n 2 on a single machine.

Run:  python tools/multiprocess_check.py            (spawns 2 workers)
      python tools/multiprocess_check.py worker <i> (internal)

Each process owns 4 virtual CPU devices; the 2x4 global mesh shards an
epsilon-fill + D8 + accumulation pipeline; process 0 gathers the result
and compares against the single-process oracle-checked pipeline.
"""

import os
import subprocess
import sys

PORT = 12355
NPROC = 2
LOCAL_DEVICES = 4
GRID = 64


def worker(idx: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{PORT}", num_processes=NPROC,
                               process_id=idx)
    import numpy as np

    from richdem_tpu import synth
    from richdem_tpu.parallel import make_mesh, sharded_pipeline

    assert len(jax.devices()) == NPROC * LOCAL_DEVICES, jax.devices()
    mesh = make_mesh(jax.devices(), (NPROC, LOCAL_DEVICES))
    dem = synth.depression_dem(GRID, seed=7, dtype=np.float32)
    out = sharded_pipeline(dem, mesh=mesh, eps=1e-3)
    import jax.numpy as jnp

    total = float(jnp.sum(out["accum"]))
    from richdem_tpu import oracle

    if idx == 0:
        filled = oracle.priority_flood_epsilon(dem, eps=1e-3,
                                               dtype=np.float64)
        fd = oracle.d8_flowdirs(filled)
        want = oracle.d8_accumulation(fd).sum()
        ok = abs(total - want) / want < 1e-6
        print(f"MULTIPROCESS_RESULT ok={ok} got={total} want={want}",
              flush=True)

    # ---- [P1]/[P2] two-pass protocols across processes: each process
    # runs the device consumers for ITS OWN shards, the O(perimeter)
    # payloads ride a collective (multihost_exchange), and each process
    # validates its own shards against the serial oracle — the
    # reference's mpirun-equivalence test (SURVEY.md §4 item 2).
    from richdem_tpu.parallel.sharded import (
        sharded_accumulation_d8_twopass, sharded_fill_twopass)
    from richdem_tpu.parallel.twopass import multihost_exchange

    two = sharded_fill_twopass(dem, mesh=mesh,
                               exchange=multihost_exchange)
    want_fill = oracle.priority_flood_fill(dem.astype(np.float64))
    ok_fill = all(
        np.allclose(np.asarray(sh.data, np.float64),
                    want_fill[sh.index], rtol=0, atol=1e-5)
        for sh in two.addressable_shards)
    print(f"TWOPASS_FILL_RESULT ok={ok_fill} p={idx}", flush=True)

    fd_np = oracle.d8_flowdirs(
        oracle.priority_flood_epsilon(dem, eps=1e-3, dtype=np.float64))
    acc2 = sharded_accumulation_d8_twopass(fd_np, mesh=mesh,
                                           exchange=multihost_exchange)
    want_acc = oracle.d8_accumulation(fd_np)
    ok_acc = all(
        np.allclose(np.asarray(sh.data, np.float64), want_acc[sh.index],
                    rtol=1e-6)
        for sh in acc2.addressable_shards)
    print(f"TWOPASS_ACCUM_RESULT ok={ok_acc} p={idx}", flush=True)
    jax.distributed.shutdown()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
        return 0
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(NPROC)]
    ok = False
    fill_ok = accum_ok = 0
    for p in procs:
        out, _ = p.communicate(timeout=600)
        if "MULTIPROCESS_RESULT ok=True" in out:
            ok = True
        fill_ok += out.count("TWOPASS_FILL_RESULT ok=True")
        accum_ok += out.count("TWOPASS_ACCUM_RESULT ok=True")
        if p.returncode != 0:
            print(out[-3000:])
    ok = ok and fill_ok == NPROC and accum_ok == NPROC
    print(f"twopass fill {fill_ok}/{NPROC} accum {accum_ok}/{NPROC}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
