"""Out-of-core (larger-than-HBM) processing via disk-tile Schwarz sweeps.

The reference's trillion-cell programs (`parallel_priority_flood`
[P1], SURVEY.md §2.4) keep only one tile per consumer in RAM, evicting
tiles to a ``--cache-dir`` between phases.  The TPU-native recast here
streams tiles of a disk-resident DEM (``.npy`` memmap) through the chip:

* state ``W`` lives in a float32 ``.npy`` memmap (init ``+BIG``);
* each pass visits every tile in serpentine order, loads the tile plus a
  1-cell halo of the *current* ``W``, solves the local fill fixpoint
  exactly on device (halo ring clamped — the same Dirichlet contract as
  :func:`richdem_tpu.parallel.sharded.sharded_fill`), and writes back;
* alternating forward/reverse serpentine passes propagate drainage
  information across the whole tile grid per pass (tile-level
  Gauss–Seidel), so convergence takes a handful of passes on real
  terrain, not O(tile-grid diameter);
* monotone decreasing ⇒ exact-equality convergence detection.

The reference achieves exactly two passes via its O(perimeter) label
graph; this trades a couple of extra passes for a radically simpler
protocol that reuses the on-device kernels unchanged.  RAM usage is
O(tile), disk traffic is O(passes · n).
"""

from __future__ import annotations

import os

import numpy as np

from richdem_tpu.ops.sweeps import BIG

__all__ = ["out_of_core_fill", "out_of_core_accum_d8"]


def _tile_ranges(n, t):
    return [(i, min(i + t, n)) for i in range(0, n, t)]


def _read_halo(mm, r0, r1, c0, c1, fill):
    """(r1-r0+2, c1-c0+2) block with 1-cell halo; off-grid = fill."""
    h, w = mm.shape
    out = np.full((r1 - r0 + 2, c1 - c0 + 2), fill, np.float32)
    rr0, rr1 = max(r0 - 1, 0), min(r1 + 1, h)
    cc0, cc1 = max(c0 - 1, 0), min(c1 + 1, w)
    out[rr0 - (r0 - 1):rr1 - (r0 - 1),
        cc0 - (c0 - 1):cc1 - (c0 - 1)] = mm[rr0:rr1, cc0:cc1]
    return out


def out_of_core_fill(dem_path, state_path=None, tile=2048, eps=0.0,
                     no_data=None, max_passes=64, verbose=False):
    """Depression-fill a disk-resident DEM with O(tile) memory.

    ``dem_path``: ``.npy`` raster (any float dtype; read via memmap).
    ``state_path``: where the filled surface is built (defaults to
    ``dem_path`` + ``.filled.npy``).  Returns the state path.

    Output equals :func:`richdem_tpu.ops.fill.fill_depressions` (same
    fixpoint) — oracle-gated in tests/test_outofcore.py.
    """
    import jax.numpy as jnp

    from richdem_tpu.parallel.sharded import _local_fill_solve

    dem = np.load(dem_path, mmap_mode="r")
    h, w = dem.shape
    if state_path is None:
        state_path = str(dem_path) + ".filled.npy"
    wmm = np.lib.format.open_memmap(state_path, mode="w+",
                                    dtype=np.float32, shape=(h, w))
    wmm[:] = BIG

    rows = _tile_ranges(h, tile)
    cols = _tile_ranges(w, tile)
    # serpentine tile orders: forward and reversed
    order_f = [(ri, ci) for ri in range(len(rows))
               for ci in (range(len(cols)) if ri % 2 == 0
                          else range(len(cols) - 1, -1, -1))]
    order_r = list(reversed(order_f))

    def nodata_mask(z):
        if no_data is None:
            return np.zeros(z.shape, bool)
        if isinstance(no_data, float) and np.isnan(no_data):
            return np.isnan(z)
        return z == no_data

    for pas in range(max_passes):
        changed = False
        for ri, ci in (order_f if pas % 2 == 0 else order_r):
            r0, r1 = rows[ri]
            c0, c1 = cols[ci]
            z = np.asarray(dem[r0:r1, c0:c1], np.float32)
            nd = nodata_mask(z)
            ext = _read_halo(wmm, r0, r1, c0, c1, fill=-BIG)
            floor_ext = ext.copy()
            floor_ext[1:-1, 1:-1] = np.where(nd, -BIG, z)
            ext[1:-1, 1:-1] = np.where(
                nd, -BIG, ext[1:-1, 1:-1])
            new_ext = np.asarray(_local_fill_solve(
                jnp.asarray(ext), jnp.asarray(floor_ext), eps, 256))
            new = new_ext[1:-1, 1:-1]
            old = wmm[r0:r1, c0:c1]
            if not np.array_equal(new, old):
                wmm[r0:r1, c0:c1] = new
                changed = True
        if verbose:
            print(f"pass {pas}: changed={changed}", flush=True)
        if not changed:
            break
    # restore nodata values
    if no_data is not None:
        for r0, r1 in rows:
            z = np.asarray(dem[r0:r1, :])
            blk = wmm[r0:r1, :]
            blk[nodata_mask(z)] = no_data
            wmm[r0:r1, :] = blk
    wmm.flush()
    return state_path


def out_of_core_accum_d8(fd_path, weights_path=None, out_path=None,
                         tile=2048, max_passes=64, verbose=False):
    """D8 flow accumulation over a disk-resident flow-direction raster
    with O(tile) memory — the ``parallel_d8_accum`` [P2] analog.

    Same Schwarz structure as :func:`out_of_core_fill`: per pass, each
    tile is re-solved exactly on device with ``weights + boundary inflow``
    where the inflow is read from the current accumulation memmap's
    1-cell halo (neighbor ring cells whose direction points into the
    tile).  Inflow only grows ⇒ monotone convergence to the exact
    topological-queue result.  Returns the output path.
    """
    import jax.numpy as jnp

    from richdem_tpu.topology import DX, DY, D8_INVERSE

    fd_mm = np.load(fd_path, mmap_mode="r")
    h, w = fd_mm.shape
    wt_mm = (np.load(weights_path, mmap_mode="r")
             if weights_path is not None else None)
    if out_path is None:
        out_path = str(fd_path) + ".accum.npy"
    acc = np.lib.format.open_memmap(out_path, mode="w+",
                                    dtype=np.float32, shape=(h, w))
    acc[:] = 0.0

    rows = _tile_ranges(h, tile)
    cols = _tile_ranges(w, tile)
    order_f = [(ri, ci) for ri in range(len(rows))
               for ci in (range(len(cols)) if ri % 2 == 0
                          else range(len(cols) - 1, -1, -1))]
    order_r = list(reversed(order_f))

    def local_solve(fd_t, w_eff):
        import jax

        if jax.default_backend() == "tpu":
            from richdem_tpu.ops.pallas_folded import d8_accumulation_gs
            return np.asarray(d8_accumulation_gs(
                jnp.asarray(fd_t), weights=jnp.asarray(w_eff)))
        from richdem_tpu.ops.accum import _d8_gs_impl
        return np.asarray(_d8_gs_impl(jnp.asarray(fd_t),
                                      jnp.asarray(w_eff)))

    for pas in range(max_passes):
        changed = False
        for ri, ci in (order_f if pas % 2 == 0 else order_r):
            r0, r1 = rows[ri]
            c0, c1 = cols[ci]
            fd_t = np.asarray(fd_mm[r0:r1, c0:c1], np.int8)
            wt = (np.asarray(wt_mm[r0:r1, c0:c1], np.float32)
                  if wt_mm is not None
                  else np.ones(fd_t.shape, np.float32))
            wt[fd_t < 0] = 0.0
            # boundary inflow from the ring of neighbor-tile cells whose
            # flow direction points into this tile
            fd_ext = np.zeros((r1 - r0 + 2, c1 - c0 + 2), np.int8)
            acc_ext = _read_halo(acc, r0, r1, c0, c1, fill=0.0)
            fe = fd_ext
            rr0, rr1 = max(r0 - 1, 0), min(r1 + 1, h)
            cc0, cc1 = max(c0 - 1, 0), min(c1 + 1, w)
            fe[rr0 - (r0 - 1):rr1 - (r0 - 1),
               cc0 - (c0 - 1):cc1 - (c0 - 1)] = fd_mm[rr0:rr1, cc0:cc1]
            ring = acc_ext.copy()
            ring[1:-1, 1:-1] = 0.0
            th, tw = fd_t.shape
            inflow = np.zeros((th, tw), np.float32)
            for d in range(1, 9):
                inv = int(D8_INVERSE[d])
                contrib = np.where(fe == inv, ring, 0.0)
                dy, dx = int(DY[d]), int(DX[d])
                inflow += contrib[1 + dy:1 + dy + th, 1 + dx:1 + dx + tw]
            new = local_solve(fd_t, wt + inflow).astype(np.float32)
            old = acc[r0:r1, c0:c1]
            if not np.array_equal(new, old):
                acc[r0:r1, c0:c1] = new
                changed = True
        if verbose:
            print(f"pass {pas}: changed={changed}", flush=True)
        if not changed:
            break
    acc.flush()
    return out_path
