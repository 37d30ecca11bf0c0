"""Pallas TPU kernels for 3×3 stencil ops (D8 flow directions, terrain
attributes).

The XLA shifted-array stencils in :mod:`richdem_tpu.ops.flowdirs` /
``ops.terrain`` are correct but pay 8 pad+slice materializations per use
and 10+ s XLA compiles through the axon helper; these kernels do one
single pass over the grid in VMEM strips (speed-of-light plan: read z,
write output, nothing else).

Row neighborhoods come from two ±1-row-shifted copies of the elevation
raster (``z_up[r] = z[r-1]``, ``z_dn[r] = z[r+1]``) prepared by one fused
XLA shuffle, so blocks never need halo reads; lane neighbors are in-kernel
lane rolls.

Semantics identical to the oracle (first-max tie-break in direction order
1..8, positive-slope gating, nodata/off-grid neighbors skipped) — see
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu.ops.pallas_sweeps import (_pad_to, _shift_east,
                                           _shift_west, _strip_height)
from richdem_tpu.topology import FLOWDIR_NO_DATA

__all__ = ["d8_flowdirs_pallas"]

#: Elevation sentinel for nodata / off-grid cells (all slopes toward it
#: are hugely negative, so it is never chosen as a flow target).
_ZBIG = 3.0e37


def _d8_kernel(cs_ref, z_ref, zu_ref, zd_ref, out_ref, *, d4):
    # No row-to-row dependency: the whole (bh, W) block is processed in one
    # vectorized shot (full VPU sublane utilization — the sweeps' per-row
    # loops are for carry dependencies this stencil does not have).
    cell = cs_ref[0]
    zbig = jnp.float32(_ZBIG)
    inv_d = jnp.float32(1.0) / (jnp.float32(np.sqrt(2.0)) * cell)
    inv_s = jnp.float32(1.0) / cell

    z = z_ref[...]
    zu = zu_ref[...]
    zd = zd_ref[...]
    best_s = jnp.zeros_like(z)
    best_d = jnp.zeros_like(z, dtype=jnp.int32)
    # direction order 1..8 = W, NW, N, NE, E, SE, S, SW — first-max
    # tie-break requires strict > in this exact order.
    neighbors = (
        (1, _shift_east(z, zbig), inv_s),
        (2, _shift_east(zu, zbig), inv_d),
        (3, zu, inv_s),
        (4, _shift_west(zu, zbig), inv_d),
        (5, _shift_west(z, zbig), inv_s),
        (6, _shift_west(zd, zbig), inv_d),
        (7, zd, inv_s),
        (8, _shift_east(zd, zbig), inv_d),
    )
    for d, zn, inv in neighbors:
        if d4 and d % 2 == 0:
            continue
        s = (z - zn) * inv
        take = s > best_s
        best_s = jnp.where(take, s, best_s)
        best_d = jnp.where(take, jnp.int32(d), best_d)
    out_ref[...] = jnp.where(z >= zbig, jnp.int32(FLOWDIR_NO_DATA), best_d)


def _d8_pallas_call(zed, z_up, z_dn, cellsize, d4):
    h, wd = zed.shape
    bh = _strip_height(wd, n_bufs=4)
    # Mosaic also places the kernel's live temporaries (8 shifted
    # neighbor arrays + best_s/best_d/take ≈ 11 f32 rows ≈ 44 B/cell,
    # from its scoped-vmem accounting at 12288²; the D4 variant skips
    # the 4 diagonal shifts ≈ 28 B/cell) on the 16 MB scoped stack;
    # shrink the strip where the block-fitting height would overflow
    # it (first bites at width 12288 — bh 32 → 16).
    stack_b = 28 if d4 else 44
    while bh > 8 and bh * wd * stack_b > (15 << 20) + (1 << 19):
        bh //= 2
    assert h % bh == 0, (h, bh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h // bh,),
        in_specs=[pl.BlockSpec((bh, wd), lambda i, cs: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((bh, wd), lambda i, cs: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_d8_kernel, d4=d4),
        out_shape=jax.ShapeDtypeStruct((h, wd), jnp.int32),
        grid_spec=grid_spec,
    )(cellsize, zed, z_up, z_dn)


@functools.partial(jax.jit, static_argnames=("d4",))
def _d8_impl(z, nodata_mask, cellsize, d4):
    zbig = jnp.float32(_ZBIG)
    zed = jnp.where(nodata_mask, zbig, jnp.asarray(z, jnp.float32))
    zed = _pad_to(zed, _ZBIG)
    h, wd = zed.shape
    edge = jnp.full((1, wd), zbig, jnp.float32)
    z_up = jnp.concatenate([edge, zed[:-1]], axis=0)
    z_dn = jnp.concatenate([zed[1:], edge], axis=0)
    cs = jnp.asarray(cellsize, jnp.float32).reshape(1)
    fd = _d8_pallas_call(zed, z_up, z_dn, cs, d4)
    return fd[:z.shape[0], :z.shape[1]].astype(jnp.int8)


def _rho8_kernel(seed_ref, cs_ref, z_ref, zu_ref, zd_ref, out_ref, *, d4):
    """Stochastic Rho8 stencil with IN-KERNEL randomness: per-core
    ``pltpu.prng_random_bits`` (no XLA threefry pass, no materialized
    uniform raster) feeds the Fairfield–Leymarie randomized diagonal
    distance ``1 + tan(u·π/4)`` (aspect-unbiasedness derivation in
    ``oracle/flowdirs.rho8_flowdirs``).  The statistical gates compare
    distributions, not streams, so the Mosaic PRNG replacing
    ``jax.random`` keys is behavior-preserving (SURVEY.md §4d)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    cellf = cs_ref[0]
    zbig = jnp.float32(_ZBIG)

    z = z_ref[...]
    zu = zu_ref[...]
    zd = zd_ref[...]
    bits = pltpu.prng_random_bits(z.shape)
    u = (bits & jnp.int32(0xFFFFFF)).astype(jnp.float32) * (1.0 / (1 << 24))
    rho = 1.0 + jnp.tan(u * jnp.float32(np.pi / 4.0))
    inv_d = jnp.float32(1.0) / (rho * cellf)
    inv_s = jnp.float32(1.0) / cellf

    best_s = jnp.zeros_like(z)
    best_d = jnp.zeros_like(z, dtype=jnp.int32)
    neighbors = (
        (1, _shift_east(z, zbig), inv_s),
        (2, _shift_east(zu, zbig), inv_d),
        (3, zu, inv_s),
        (4, _shift_west(zu, zbig), inv_d),
        (5, _shift_west(z, zbig), inv_s),
        (6, _shift_west(zd, zbig), inv_d),
        (7, zd, inv_s),
        (8, _shift_east(zd, zbig), inv_d),
    )
    for d, zn, inv in neighbors:
        if d4 and d % 2 == 0:
            continue
        s = (z - zn) * inv
        take = s > best_s
        best_s = jnp.where(take, s, best_s)
        best_d = jnp.where(take, jnp.int32(d), best_d)
    out_ref[...] = jnp.where(z >= zbig, jnp.int32(FLOWDIR_NO_DATA), best_d)


@functools.partial(jax.jit, static_argnames=("d4",))
def _rho8_pallas_impl(z, nodata_mask, cellsize, seed, d4):
    zbig = jnp.float32(_ZBIG)
    zed = jnp.where(nodata_mask, zbig, jnp.asarray(z, jnp.float32))
    zed = _pad_to(zed, _ZBIG)
    h, wd = zed.shape
    edge = jnp.full((1, wd), zbig, jnp.float32)
    z_up = jnp.concatenate([edge, zed[:-1]], axis=0)
    z_dn = jnp.concatenate([zed[1:], edge], axis=0)
    bh = _strip_height(wd, n_bufs=4)
    seed_a = jnp.asarray(seed, jnp.int32).reshape(1)
    cs_a = jnp.asarray(cellsize, jnp.float32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h // bh,),
        in_specs=[pl.BlockSpec((bh, wd), lambda i, sd, cs: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((bh, wd), lambda i, sd, cs: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    fd = pl.pallas_call(
        functools.partial(_rho8_kernel, d4=d4),
        out_shape=jax.ShapeDtypeStruct((h, wd), jnp.int32),
        grid_spec=grid_spec,
    )(seed_a, cs_a, zed, z_up, z_dn)
    return fd[:z.shape[0], :z.shape[1]].astype(jnp.int8)


def rho8_flowdirs_pallas(dem, no_data=None, topology="D8", cellsize=1.0,
                         seed=0):
    """Rho8 — Pallas single-pass stencil with in-kernel PRNG (the VERDICT
    r1 "Pallas Rho8" item).  Distributionally equivalent to
    :func:`richdem_tpu.ops.flowdirs.rho8_flowdirs` (statistical gates)."""
    from richdem_tpu.ops.stencil import nodata_like

    z = jnp.asarray(dem)
    mask = nodata_like(z, no_data)
    return _rho8_pallas_impl(z, mask, cellsize, seed, topology == "D4")


def d8_flowdirs_pallas(dem, no_data=None, topology="D8", cellsize=1.0):
    """D8/D4 steepest-descent directions — Pallas single-pass stencil.

    Drop-in for :func:`richdem_tpu.ops.flowdirs.d8_flowdirs` (identical
    output; see tests)."""
    from richdem_tpu.ops.stencil import nodata_like

    z = jnp.asarray(dem)
    mask = nodata_like(z, no_data)
    return _d8_impl(z, mask, cellsize, topology == "D4")


# ---------------------------------------------------------------------------
# Terrain attributes (Horn 1981 / Zevenbergen-Thorne 1987), fused
# ---------------------------------------------------------------------------

def _terrain_kernel(sc_ref, z_ref, zu_ref, zd_ref, m_ref, mu_ref, md_ref,
                    out_ref, *, attrib):
    """Single-pass fused 3×3 attribute — mirrors ops.terrain.terrain_core
    exactly (same window-degradation rule: invalid neighbors read the
    center value)."""
    zscale = sc_ref[0]
    L = sc_ref[1]
    z = z_ref[...] * zscale
    zu = zu_ref[...] * zscale
    zd = zd_ref[...] * zscale
    m = m_ref[...]
    mu = mu_ref[...]
    md = md_ref[...]
    one = jnp.int32(1)

    def pick(vals, valid):
        return jnp.where(valid > 0, vals, z)

    # window letters row-major a..i (a=NW, e=center, i=SE); off-grid or
    # nodata neighbors degrade to the center elevation.
    a = pick(_shift_east(zu, 0.0), _shift_east(mu, 0))
    b = pick(zu, mu)
    c = pick(_shift_west(zu, 0.0), _shift_west(mu, 0))
    d = pick(_shift_east(z, 0.0), _shift_east(m, 0))
    e = z
    f = pick(_shift_west(z, 0.0), _shift_west(m, 0))
    g = pick(_shift_east(zd, 0.0), _shift_east(md, 0))
    h = pick(zd, md)
    i = pick(_shift_west(zd, 0.0), _shift_west(md, 0))

    fx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * L)
    fy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * L)

    # Transcendentals (atan/atan2) are not lowerable in Mosaic; those
    # attribute variants emit raw fields finished by one fused XLA map
    # in the caller.
    if attrib == "riserun_raw":
        out = jnp.sqrt(fx * fx + fy * fy)
    elif attrib == "fx_raw":
        out = fx
    elif attrib == "fy_raw":
        out = fy
    else:
        D = ((d + f) / 2.0 - e) / (L * L)
        E = ((b + h) / 2.0 - e) / (L * L)
        F = (-a + c + g - i) / (4.0 * L * L)
        G = (-d + f) / (2.0 * L)
        H = (b - h) / (2.0 * L)
        g2h2 = G * G + H * H
        if attrib == "curvature":
            out = -2.0 * (D + E) * 100.0
        elif attrib == "planform_curvature":
            out = jnp.where(
                g2h2 == 0.0, 0.0,
                2.0 * (D * H * H + E * G * G - F * G * H)
                / jnp.maximum(g2h2, 1e-30) * 100.0)
        else:  # profile_curvature
            out = jnp.where(
                g2h2 == 0.0, 0.0,
                -2.0 * (D * G * G + E * H * H + F * G * H)
                / jnp.maximum(g2h2, 1e-30) * 100.0)
    out_ref[...] = jnp.where(m > 0, out, jnp.float32(jnp.nan))


@functools.partial(jax.jit, static_argnames=("attrib",))
def _terrain_pallas_impl(z, nodata_mask, zscale, cellsize, attrib):
    zf = jnp.asarray(z, jnp.float32)
    h, wd = zf.shape
    zed = _pad_to(zf, 0.0)
    valid = _pad_to((~nodata_mask).astype(jnp.int32), 0)
    hp, wp = zed.shape
    zrow = jnp.zeros((1, wp), jnp.float32)
    vrow = jnp.zeros((1, wp), jnp.int32)
    z_up = jnp.concatenate([zrow, zed[:-1]], axis=0)
    z_dn = jnp.concatenate([zed[1:], zrow], axis=0)
    v_up = jnp.concatenate([vrow, valid[:-1]], axis=0)
    v_dn = jnp.concatenate([valid[1:], vrow], axis=0)
    sc = jnp.stack([jnp.asarray(zscale, jnp.float32),
                    jnp.asarray(cellsize, jnp.float32)])

    bh = _strip_height(wp, n_bufs=7)
    # Cap by Mosaic's scoped-vmem STACK as in _d8_pallas_call: this
    # kernel keeps ~23 live f32 rows (Horn derivatives + shifted
    # neighbor/mask copies ≈ 93 B/cell, from the Mosaic accounting at
    # 12288² — 18.28M at bh 16) against the 16 MB limit.  First bites
    # at width 12288 (bh 16 → 8); 10240 sits at 15.2M and keeps 16.
    while bh > 8 and bh * wp * 93 > (15 << 20) + (1 << 19):
        bh //= 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hp // bh,),
        in_specs=[pl.BlockSpec((bh, wp), lambda i, sc: (i, 0),
                               memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((bh, wp), lambda i, sc: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_terrain_kernel, attrib=attrib),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        grid_spec=grid_spec,
    )(sc, zed, z_up, z_dn, valid, v_up, v_dn)
    return out[:h, :wd]


@functools.partial(jax.jit, static_argnames=("attrib",))
def _terrain_finish(z, mask, zscale, cellsize, attrib):
    if attrib in ("curvature", "planform_curvature", "profile_curvature"):
        return _terrain_pallas_impl(z, mask, zscale, cellsize, attrib)
    if attrib == "aspect":
        fx = _terrain_pallas_impl(z, mask, zscale, cellsize, "fx_raw")
        fy = _terrain_pallas_impl(z, mask, zscale, cellsize, "fy_raw")
        flat = (fx == 0) & (fy == 0)
        out = jnp.where(flat, -1.0,
                        jnp.degrees(jnp.arctan2(-fx, fy)) % 360.0)
        return jnp.where(mask, jnp.nan, out)
    rr = _terrain_pallas_impl(z, mask, zscale, cellsize, "riserun_raw")
    if attrib == "slope_riserun":
        return rr
    if attrib == "slope_percentage":
        return 100.0 * rr
    if attrib == "slope_radians":
        return jnp.arctan(rr)
    return jnp.degrees(jnp.arctan(rr))  # slope_degrees


def terrain_attribute_pallas(dem, attrib, zscale=1.0, cellsize=1.0,
                             no_data=None):
    """Fused single-pass terrain attribute (TPU fast path); identical
    output to :func:`richdem_tpu.ops.terrain.terrain_attribute`."""
    from richdem_tpu.ops.stencil import nodata_like
    from richdem_tpu.oracle.terrain import TERRAIN_ATTRIBUTES

    if attrib not in TERRAIN_ATTRIBUTES:
        raise ValueError(f"unknown terrain attribute {attrib!r}")
    z = jnp.asarray(dem)
    return _terrain_finish(z, nodata_like(z, no_data),
                           jnp.asarray(zscale, jnp.float32),
                           jnp.asarray(cellsize, jnp.float32), attrib)
