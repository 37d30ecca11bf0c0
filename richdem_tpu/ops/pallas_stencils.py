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
from richdem_tpu.topology import DR, NO_FLOW, FLOWDIR_NO_DATA

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


def d8_flowdirs_pallas(dem, no_data=None, topology="D8", cellsize=1.0):
    """D8/D4 steepest-descent directions — Pallas single-pass stencil.

    Drop-in for :func:`richdem_tpu.ops.flowdirs.d8_flowdirs` (identical
    output; see tests)."""
    from richdem_tpu.ops.stencil import nodata_like

    z = jnp.asarray(dem)
    mask = nodata_like(z, no_data)
    return _d8_impl(z, mask, cellsize, topology == "D4")
