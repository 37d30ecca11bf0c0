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
    if idx == 0:
        from richdem_tpu import oracle

        filled = oracle.priority_flood_epsilon(dem, eps=1e-3,
                                               dtype=np.float64)
        fd = oracle.d8_flowdirs(filled)
        want = oracle.d8_accumulation(fd).sum()
        ok = abs(total - want) / want < 1e-6
        print(f"MULTIPROCESS_RESULT ok={ok} got={total} want={want}",
              flush=True)
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
    for p in procs:
        out, _ = p.communicate(timeout=600)
        if "MULTIPROCESS_RESULT ok=True" in out:
            ok = True
        if p.returncode != 0:
            print(out[-3000:])
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
