"""Benchmark driver: grid-points/s for the fill→flowdir→accum pipeline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``vs_baseline`` is the speedup over a single-core C++ implementation of the
same fill→flowdir→accum pipeline (richdem_tpu/native/core.cpp — the same
heap-based Priority-Flood + topological-queue design as the reference's C++
core), MEASURED on this host at 1024² and extrapolated per-cell.  If the
native engine is unavailable the paper-era constant ≈5 M cells/s is used
(BASELINE.md; the measured value on this host is ≈5-6 M cells/s, so the two
agree).  The >10× target of BASELINE.json corresponds to vs_baseline > 10.

``roofline_pct`` (pipeline config) is the HBM-bandwidth roofline fraction:
bytes-moved (from the per-kernel traffic model below, using the REAL
iteration counts the run reports) divided by device time and by the chip's
HBM bandwidth (BENCH_HBM_GBPS, default 819 GB/s for TPU v5e).  Device time
excludes the measured axon-tunnel sync floor (~27 ms per host round-trip,
reported separately as ``sync_floor_s`` — tunnel overhead, not kernel time).

Env knobs: BENCH_SIZE (grid edge, default 10240 on TPU — the BASELINE.json
north-star size — / 1024 on CPU),
BENCH_REPS (default 5), BENCH_TERRAIN (perlin|cone|depressions),
BENCH_CONFIG (pipeline|fill_flats|dinf_twi|quinn_mfd), BENCH_HBM_GBPS,
BENCH_BATCH (default 1: steps dispatched per timing fence — >1 reports
steady-state throughput with the fixed ~27 ms tunnel sync amortized, the
serving posture where tiles stream back-to-back; the default stays the
conservative single-shot figure).  When BENCH_BATCH is unset on TPU the
same JSON line also carries ``steady_state_cells_s`` /
``steady_state_vs_baseline`` (an 8-step-per-fence measurement) so both
postures are visible from the default invocation.
"""

import json
import os
import sys
import time

import numpy as np

#: Fallback single-core CPU grid-points/s for fill+flowdir+accum.
BASELINE_CPU_PIPELINE = 5.0e6

#: TPU v5e (v5 lite) HBM bandwidth, GB/s.
HBM_GBPS_DEFAULT = 819.0


def measure_cpu_baseline(terrain_fn, n=1024):
    """Single-core C++ pipeline throughput (cells/s) on this host."""
    try:
        from richdem_tpu import native
        if not native.available():
            return BASELINE_CPU_PIPELINE
        dem = np.asarray(terrain_fn(n), dtype=np.float64)
        best = float("inf")
        for _ in range(3):  # the host is noisy; best-of-3 is conservative
            t0 = time.perf_counter()
            acc = native.accum_d8(native.d8_flowdirs(native.fill(dem)))
            best = min(best, time.perf_counter() - t0)
        assert acc.sum() > 0
        return n * n / best
    except Exception:
        return BASELINE_CPU_PIPELINE


#: Where the pinned baseline figure lives (committed, so vs_baseline is
#: comparable round over round — the live per-run measurement wobbles
#: ±30% with host contention, VERDICT r2 weak #5).
PINNED_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE_PINNED.json")


def pinned_baseline(terrain_fn, config="pipeline"):
    """(cells_per_s, source): env override > committed pin > measure+pin.

    The pin is PER CONFIG (tools/pin_baselines.py): each scenario's
    vs_baseline divides by a native C++ run doing the same work — D8
    pipeline, ε-fill + flat resolution, D∞ accumulation + TWI, or Quinn
    MFD accumulation.  A pin file predating the per-config scheme (or a
    config missing from it) falls back to the pipeline figure, tagged
    ``pinned-pipeline`` so the mismatch is visible in the bench JSON."""
    env = os.environ.get("BENCH_BASELINE_CELLS_S")
    if env:
        return float(env), "env"
    if (os.path.exists(PINNED_PATH)
            and not os.environ.get("BENCH_REPIN_BASELINE")):
        with open(PINNED_PATH) as f:
            pin = json.load(f)
        configs = pin.get("configs", {})
        if config in configs:
            return float(configs[config]), "pinned"
        return float(pin["cells_per_s"]), (
            "pinned" if config == "pipeline" else "pinned-pipeline")
    val = measure_cpu_baseline(terrain_fn)
    with open(PINNED_PATH, "w") as f:
        json.dump({"cells_per_s": val,
                   "what": ("native C++ fill+flowdir+accum, 1024^2, "
                            "best-of-3 on this host")}, f)
    return val, "measured+pinned"


def measure_sync_floor(jax, reps=5):
    """Fixed host-round-trip latency of the axon tunnel (block_until_ready
    does not block on this backend; a scalar materialization is the only
    honest fence — and it costs a fixed ~27 ms regardless of work)."""
    import jax.numpy as jnp
    x = jnp.zeros((8, 128), jnp.float32) + 1.0
    float(x.sum())  # warm the dispatch path
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(x.sum())
        best = min(best, time.perf_counter() - t0)
    return best


#: Per-padded-cell HBM byte costs of the folded Pallas building blocks
#: (f32 = 4 B; grids pad to 1024 multiples at ≥2048):
#:   fill rotation  = 4 sweeps × (read W + read floor + write W) 12 B
#:                    + 2 transpose refolds × 8 B = 64 B  (convergence
#:                    rides in-kernel change flags — no equality pass)
#:   warm start     ≈ read z + write w0 = 8 B (coarse grid is 1/64 n)
#:   fill setup     = build floor_p + w0 ≈ 16 B
#:   3×3 stencil    = read + write + pad copies ≈ 16 B
#:   D8 accum rot.  = 4 sweeps × (w + fd + acc_in + acc_out) 16 B
#:                    + 2 transpose refolds × 8 B + convergence eq 8 B
#:                    = 88 B  (summation sweeps need the rotation-level
#:                    equality — per-sweep flags chatter for float
#:                    weights; the adjacent-strip fd/acc boundary groups
#:                    ride as (f, L) blocks, <1 B/cell·rotation, ignored)
#:   accum setup    = fd remap/transpose + w_p ≈ 24 B
#:   D∞ accum rot.  = 4 two-tap sweeps × (w + packed + acc r/w) 16 B
#:                    + 2 refolds × 8 B + eq 8 B = 88 B
#:   dist rotation  = 4 masked sweeps × (w r/w 8 B + ctx 8 B) + eq 8 B
#:                    = 72 B (flat-resolution distance fixpoints; 256-pad)
_B_FILL_ROT, _B_WARM, _B_FILL_SETUP = 64, 8, 16
_B_STENCIL = 16
_B_ACCUM_ROT, _B_ACCUM_SETUP = 88, 24
_B_DINF_ROT = 88
_B_DIST_ROT = 72


def _padded_cells(size):
    pad = 1024 if size >= 2048 else 256
    pc = ((size + pad - 1) // pad) * pad
    return pc * pc


def pipeline_bytes_model(size, fill_rot, accum_rot, multiscale):
    """HBM bytes moved by one pipeline step (see cost table above)."""
    per_cell = (fill_rot * _B_FILL_ROT + (_B_WARM if multiscale else 0)
                + _B_FILL_SETUP + _B_STENCIL
                + accum_rot * _B_ACCUM_ROT + _B_ACCUM_SETUP)
    return _padded_cells(size) * per_cell


def fill_flats_bytes_model(size, fill_rot, dist_rot, multiscale):
    """HBM bytes for config 2: ε-fill + D8 + flat resolution (the
    seed/combine XLA stages ≈ z_eq/neighbor stacks ≈ 11 arrays ≈ 44 B)."""
    per_cell = (fill_rot * _B_FILL_ROT + (_B_WARM if multiscale else 0)
                + _B_FILL_SETUP + _B_STENCIL
                + dist_rot * _B_DIST_ROT + 44)
    return _padded_cells(size) * per_cell


def dinf_twi_bytes_model(size, fill_rot, dinf_rot, multiscale):
    """HBM bytes for config 4: fill + D∞ routing + accumulation + TWI
    (angle stencil + two-tap pack + slope + TWI ≈ 4 stencil passes)."""
    per_cell = (fill_rot * _B_FILL_ROT + (_B_WARM if multiscale else 0)
                + _B_FILL_SETUP + 4 * _B_STENCIL
                + dinf_rot * _B_DINF_ROT + _B_ACCUM_SETUP)
    return _padded_cells(size) * per_cell


#: 4-sweep scan MFD rotation: 4 sweeps × (acc r/w 8 B + 8 proportion
#: planes 32 B + w 4 B) + 2 acc refolds 8 B + rotation equality 8 B
_B_MFD_ROT = 4 * 44 + 16 + 8


def quinn_bytes_model(size, fill_rot, mfd_rot, multiscale):
    """HBM bytes for the Quinn config: fill + MFD proportions (8-plane
    stencil ≈ 40 B) + generic multi-flow accumulation (transposed plane
    stack setup ≈ 72 B)."""
    per_cell = (fill_rot * _B_FILL_ROT + (_B_WARM if multiscale else 0)
                + _B_FILL_SETUP + 40
                + mfd_rot * _B_MFD_ROT + 72)
    return _padded_cells(size) * per_cell


def main():
    import jax

    platform = jax.devices()[0].platform
    # 10240 = the BASELINE.json north-star scenario ("fill+flowdir+accum
    # on 10k x 10k DEM"); earlier rounds' BENCH_r0{1,2,3}.json ran 8192
    # (metric string carries the size either way).
    default_size = 10240 if platform != "cpu" else 1024
    size = int(os.environ.get("BENCH_SIZE", default_size))
    reps = int(os.environ.get("BENCH_REPS", 5))
    batch = max(1, int(os.environ.get("BENCH_BATCH", 1)))
    terrain = os.environ.get("BENCH_TERRAIN", "perlin")
    hbm_gbps = float(os.environ.get("BENCH_HBM_GBPS", HBM_GBPS_DEFAULT))

    # Terrain is generated ON DEVICE (synth_jax): the build host's memory
    # bandwidth is pathologically low (~0.1-0.5 GB/s measured), so host-side
    # numpy generation of large rasters takes minutes.
    from richdem_tpu import synth_jax
    from richdem_tpu.pipeline import make_pipeline

    gen = {"perlin": synth_jax.perlin_dem,
           "depressions": synth_jax.depression_dem,
           "cone": synth_jax.cone_dem}[terrain]
    z = jax.block_until_ready(gen(size))
    # Plain fill (the reference's FillDepressions default).  f32 ulp-scale
    # epsilons create a rounding-creep convergence tail — see ops/fill.py.
    eps = 0.0
    # BENCH_CONFIG selects the BASELINE.md scenario:
    #   pipeline  (default) — config 3: fill → D8 flowdirs → accumulation
    #   fill_flats          — config 2: epsilon fill + flat resolution
    #   dinf_twi            — config 4: D∞ routing + accumulation + TWI
    config = os.environ.get("BENCH_CONFIG", "pipeline")
    label = "fill+flowdir+accum"
    iter_info = {}

    on_tpu = platform != "cpu"

    def _fill_info(zz, eps_v):
        """(filled, iters, converged) on either backend."""
        if on_tpu:
            from richdem_tpu.ops.pallas_folded import fill_fixpoint_pallas
            return fill_fixpoint_pallas(zz, None, eps=eps_v, max_iters=256)
        from richdem_tpu.ops.fill import fill_depressions_info
        return fill_depressions_info(zz, eps=eps_v, max_iters=256)

    # dispatch() queues one step WITHOUT a host fence (BENCH_BATCH > 1:
    # executions serialize in dispatch order on the chip, so fencing the
    # final step fences them all); run_once() dispatches + fences.
    if config == "pipeline":
        step = make_pipeline(z.shape, eps=eps, fill_iters=256)

        def dispatch():
            step(z)

        def run_once():
            out = step(z)
            # Force a device->host scalar round-trip: on the axon tunnel
            # backend, block_until_ready() returns before execution
            # finishes, so a materialized value is the only honest fence.
            return float(out["accum"].sum())

        from richdem_tpu.pipeline import check_converged
        out0 = check_converged(step(z))
        iter_info = {"fill_iters": int(out0["fill_iters"]),
                     "accum_rotations": int(out0["accum_rotations"])}
        bytes_model = lambda: pipeline_bytes_model(
            size, iter_info["fill_iters"], iter_info["accum_rotations"],
            multiscale=size >= 4096)
    elif config == "fill_flats":
        from richdem_tpu import ops
        from richdem_tpu.ops.flats import resolve_flats
        from richdem_tpu.ops.fill import auto_epsilon
        label = "epsilon-fill+flat-resolution"
        # auto_epsilon on the DEVICE raster: the scale reduction runs on
        # chip and the diameter headroom term sees the REAL grid shape
        # (a subsampled host copy would undersize eps ~2× — ADVICE r1).
        eps_v = auto_epsilon(z)

        @jax.jit
        def step(z):
            filled, fi, fdone = _fill_info(z, eps_v)
            fd = ops.d8_flowdirs(filled)
            resolved, si, sdone = resolve_flats(filled, fd,
                                                return_info=True)
            return resolved, fi, si, fdone & sdone

        def dispatch():
            step(z)

        def run_once():
            return float((step(z)[0] != 0).sum())

        out0 = step(z)
        assert bool(out0[3]), "config 2 fixpoints did not converge"
        iter_info = {"fill_iters": int(out0[1]),
                     "flats_rotations": int(out0[2])}
        bytes_model = lambda: fill_flats_bytes_model(
            size, iter_info["fill_iters"], iter_info["flats_rotations"],
            multiscale=size >= 4096)
    elif config == "dinf_twi":
        from richdem_tpu.methods import twi
        from richdem_tpu.ops.terrain import terrain_attribute
        label = "fill+dinf-accum+TWI"

        from richdem_tpu.ops.accum import dinf_accumulation_from_angles
        from richdem_tpu.ops.flowdirs import dinf_flowdirs

        @jax.jit
        def step(z):
            filled, fi, fdone = _fill_info(z, 1e-2)
            ang = dinf_flowdirs(filled)
            acc, ai, adone = dinf_accumulation_from_angles(
                ang, return_info=True)
            slope = terrain_attribute(filled, "slope_radians")
            return twi(acc, slope), fi, ai, fdone & adone

        def dispatch():
            step(z)

        def run_once():
            return abs(float(step(z)[0][::64, ::64].sum()))

        out0 = step(z)
        assert bool(out0[3]), "config 4 fixpoints did not converge"
        iter_info = {"fill_iters": int(out0[1]),
                     "dinf_rotations": int(out0[2])}
        bytes_model = lambda: dinf_twi_bytes_model(
            size, iter_info["fill_iters"], iter_info["dinf_rotations"],
            multiscale=size >= 4096)
    elif config == "quinn_mfd":
        label = "fill+quinn-mfd-accum"
        from richdem_tpu.ops.accum import flow_accumulation_from_props
        from richdem_tpu.ops.flowdirs import flow_proportions

        @jax.jit
        def step(z):
            filled, fi, fdone = _fill_info(z, 1e-2)
            props = flow_proportions(filled, method="Quinn")
            acc, ai, adone = flow_accumulation_from_props(
                props, return_info=True)
            return acc, fi, ai, fdone & adone

        def dispatch():
            step(z)

        def run_once():
            return float(step(z)[0][::64, ::64].sum())

        out0 = step(z)
        assert bool(out0[3]), "quinn config fixpoints did not converge"
        iter_info = {"fill_iters": int(out0[1]),
                     "mfd_rotations": int(out0[2])}
        bytes_model = lambda: quinn_bytes_model(
            size, iter_info["fill_iters"], iter_info["mfd_rotations"],
            multiscale=size >= 4096)
    else:
        raise SystemExit(f"unknown BENCH_CONFIG {config!r}")

    # Warmup/compile.
    checksum = run_once()
    assert checksum > 0, "pipeline produced empty accumulation"

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(batch - 1):
            dispatch()
        run_once()
        times.append((time.perf_counter() - t0) / batch)
    best = min(times)
    cells_per_s = size * size / best

    # When the default single-shot figure is being reported, ALSO measure
    # the steady-state throughput (8 steps per fence — the serving posture
    # where tiles stream back-to-back and the fixed ~27 ms tunnel sync
    # amortizes).  Both figures ride the same JSON line; "value" stays the
    # conservative single-shot number.
    ss_cells_per_s = None
    if on_tpu and batch == 1 and "BENCH_BATCH" not in os.environ:
        ss_batch = 8
        ss_best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(ss_batch - 1):
                dispatch()
            run_once()
            ss_best = min(ss_best, (time.perf_counter() - t0) / ss_batch)
        ss_cells_per_s = size * size / ss_best

    baseline, baseline_source = pinned_baseline(gen, config)
    result = {
        "metric": (f"{label} grid-points/s "
                   f"({size}x{size} {terrain}, {platform})"),
        "value": round(cells_per_s, 1),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_s / baseline, 3),
        "baseline_cells_s": round(baseline, 1),
        "baseline_source": baseline_source,
    }
    if config != "pipeline" and baseline_source == "pinned":
        # continuity with rounds 1-3, whose multipliers for every config
        # divided by the D8-pipeline figure
        pipe_base, _ = pinned_baseline(gen, "pipeline")
        result["vs_pipeline_baseline"] = round(cells_per_s / pipe_base, 3)
    if on_tpu:
        sync = measure_sync_floor(jax)
        dev_t = max(best - sync / batch, 1e-9)
        if batch > 1:
            result["batch"] = batch
        nbytes = bytes_model()
        result.update(
            sync_floor_s=round(sync, 4),
            time_s=round(best, 4),
            roofline_pct=round(100.0 * nbytes / dev_t / (hbm_gbps * 1e9),
                               1),
            **iter_info,
        )
        if ss_cells_per_s is not None:
            result["steady_state_cells_s"] = round(ss_cells_per_s, 1)
            result["steady_state_vs_baseline"] = round(
                ss_cells_per_s / baseline, 3)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
