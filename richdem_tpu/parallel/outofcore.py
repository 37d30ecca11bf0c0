"""Out-of-core (larger-than-HBM) processing of disk-resident DEMs.

The reference's trillion-cell programs (`parallel_priority_flood` [P1],
SURVEY.md §2.4) keep only one tile per consumer in RAM, evicting tiles to
a ``--cache-dir`` between phases.  Two strategies here, both O(tile) RAM:

**Two-pass label-graph fill (default for plain fill)** — the [P1]
protocol itself (arxiv 1606.06204 §3): pass 1 runs the native tile
consumer (``native.fill_tile``: Priority-Flood seeded on the tile
perimeter, emitting locally filled z + watershed labels + the label
spill graph); the O(perimeter) global label graph (tile graphs + seam
edges) is solved once by minimax Dijkstra
(:mod:`richdem_tpu.parallel.labelgraph`); pass 2 applies
``z' = max(local_fill, raise[label])``.  Exactly TWO passes over the
data at any scale — disk traffic O(2n), not O(passes·n).

**Schwarz sweeps (epsilon fill, and the accumulation fallback)** — each
pass visits every tile in serpentine order, loads the tile plus a 1-cell
halo of the current state, solves the local fixpoint exactly on device
(halo ring clamped — the same Dirichlet contract as
:func:`richdem_tpu.parallel.sharded.sharded_fill`), and writes back;
alternating forward/reverse serpentine passes make convergence a handful
of passes on real terrain; monotone ⇒ exact-equality detection.

D8 accumulation has its own two-pass protocol ([P2]) — see
``out_of_core_accum_d8``.
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


def _open_raster(path):
    """Raster for windowed access: ``.npy`` memmap, or a GeoTIFF via the
    windowed reader (only overlapping strips/tiles are decoded, so a
    compressed GeoTIFF larger than RAM streams through the chip —
    SURVEY.md §2.1 Array2D windowed-load row)."""
    p = str(path)
    if p.lower().endswith((".tif", ".tiff")):
        from richdem_tpu.io.geotiff import GeoTIFFWindow
        return GeoTIFFWindow(p)
    return np.load(p, mmap_mode="r")


def _nodata_mask_of(z, no_data):
    if no_data is None:
        return np.zeros(z.shape, bool)
    if isinstance(no_data, float) and np.isnan(no_data):
        return np.isnan(z)
    return z == no_data


def out_of_core_fill(dem_path, state_path=None, tile=2048, eps=0.0,
                     no_data=None, max_passes=64, verbose=False,
                     method="auto", stats=None):
    """Depression-fill a disk-resident DEM with O(tile) memory.

    ``dem_path``: ``.npy`` raster (any float dtype; read via memmap).
    ``state_path``: where the filled surface is built (defaults to
    ``dem_path`` + ``.filled.npy``).  Returns the state path.

    ``method``: ``"twopass"`` = the [P1] label-graph protocol (exactly 2
    data passes; plain fill only), ``"schwarz"`` = iterative halo sweeps
    (any eps), ``"auto"`` = twopass when ``eps == 0`` and the native
    consumer is available.  ``stats``: optional dict, filled with
    ``data_passes``/``tile_loads``/graph sizes for verification.

    Output equals :func:`richdem_tpu.ops.fill.fill_depressions` (same
    fixpoint) — oracle-gated in tests/test_outofcore.py.
    """
    if method == "auto":
        from richdem_tpu import native
        method = ("twopass" if eps == 0.0 and native.available()
                  else "schwarz")
    if method == "twopass":
        if eps != 0.0:
            raise ValueError("two-pass fill supports plain fill only "
                             "(eps=0); use method='schwarz' for epsilon")
        return _fill_twopass(dem_path, state_path, tile, no_data,
                             verbose, stats)
    return _fill_schwarz(dem_path, state_path, tile, eps, no_data,
                         max_passes, verbose, stats)


def _fill_twopass(dem_path, state_path, tile, no_data, verbose, stats):
    """[P1] two-pass fill: native tile consumers + O(perimeter) label-
    graph combine + apply pass.  See module docstring / labelgraph.py."""
    dem = _open_raster(dem_path)
    if no_data is None:
        no_data = getattr(dem, "no_data", None)
    h, w = dem.shape
    if state_path is None:
        state_path = str(dem_path) + ".filled.npy"
    wmm = np.lib.format.open_memmap(state_path, mode="w+",
                                    dtype=np.float32, shape=(h, w))
    labels_path = str(state_path) + ".labels.npy"
    lmm = np.lib.format.open_memmap(labels_path, mode="w+",
                                    dtype=np.int64, shape=(h, w))
    rows = _tile_ranges(h, tile)
    cols = _tile_ranges(w, tile)
    twopass_fill_into(dem, wmm, lmm, rows, cols, no_data, verbose, stats,
                      apply_pass=True)
    wmm.flush()
    return state_path


def twopass_fill_into(dem, wmm, lmm, rows, cols, no_data, verbose=False,
                      stats=None, apply_pass=True):
    """The [P1] protocol over any array-likes (memmaps or RAM arrays).

    Fills ``wmm`` (f32 filled surface) and ``lmm`` (int64 global labels)
    tile-by-tile, solves the O(perimeter) label graph, and (if
    ``apply_pass``) applies the raise levels in a second tile sweep.
    Returns the per-label raise array (index 0 = ocean = -inf)."""
    from richdem_tpu import native
    from richdem_tpu.parallel.labelgraph import (minimax_raise,
                                                 reduce_edges)

    h, w = dem.shape
    tile_loads = 0
    next_base = 1  # global label ids; 0 = ocean
    ea, eb, ew = [], [], []

    # ---- pass 1: tile consumers (one DEM read per tile)
    for ri, (r0, r1) in enumerate(rows):
        for ci, (c0, c1) in enumerate(cols):
            z = np.asarray(dem[r0:r1, c0:c1], np.float64)
            tile_loads += 1
            ge = ((1 if r0 == 0 else 0) | (2 if r1 == h else 0)
                  | (4 if c0 == 0 else 0) | (8 if c1 == w else 0))
            filled, lab, edges = native.fill_tile(z, no_data=no_data,
                                                  global_edges=ge)
            nlab = int(lab.max())
            b = next_base
            next_base += nlab
            glab = np.where(lab > 0, lab.astype(np.int64) + (b - 1), 0)
            wmm[r0:r1, c0:c1] = filled.astype(np.float32)
            lmm[r0:r1, c0:c1] = glab
            if edges.shape[0]:
                la = edges[:, 0].astype(np.int64)
                lb = edges[:, 1].astype(np.int64)
                ea.append(np.where(la > 0, la + (b - 1), 0))
                eb.append(np.where(lb > 0, lb + (b - 1), 0))
                ew.append(edges[:, 2])

    # ---- seam edges: O(perimeter) reads along every tile boundary
    def _seam(za, zb, la, lb_):
        """Edges between two adjacent lines (8-adjacency: dj ∈ -1,0,1)."""
        nda = _nodata_mask_of(za, no_data)
        ndb = _nodata_mask_of(zb, no_data)
        wa = np.where(nda, -np.inf, za.astype(np.float64))
        wb = np.where(ndb, -np.inf, zb.astype(np.float64))
        m = za.shape[0]
        for dj in (-1, 0, 1):
            a_sl = slice(max(0, -dj), m - max(0, dj))
            b_sl = slice(max(0, dj), m - max(0, -dj))
            ga, gb = la[a_sl], lb_[b_sl]
            wgt = np.maximum(wa[a_sl], wb[b_sl])
            keep = (ga != gb) & np.isfinite(wgt)
            ea.append(ga[keep])
            eb.append(gb[keep])
            ew.append(wgt[keep])

    for (r0, r1) in rows[:-1]:
        _seam(np.asarray(wmm[r1 - 1]), np.asarray(wmm[r1]),
              np.asarray(lmm[r1 - 1]), np.asarray(lmm[r1]))
    for (c0, c1) in cols[:-1]:
        _seam(np.asarray(wmm[:, c1 - 1]), np.asarray(wmm[:, c1]),
              np.asarray(lmm[:, c1 - 1]), np.asarray(lmm[:, c1]))

    # ---- global O(perimeter) label-graph solve
    if ea:
        a, bb, wgt = reduce_edges(np.concatenate(ea), np.concatenate(eb),
                                  np.concatenate(ew))
    else:
        a = bb = np.zeros(0, np.int64)
        wgt = np.zeros(0, np.float64)
    raise_ = minimax_raise(next_base, a, bb, wgt)
    if next_base > 1 and not np.all(raise_[1:] < np.inf):
        raise RuntimeError("label graph has watersheds unreachable from "
                           "the ocean — combine bug")
    if verbose:
        print(f"label graph: {next_base} labels, {a.shape[0]} edges",
              flush=True)

    # ---- pass 2: apply raise levels (one state read/write per tile)
    if apply_pass:
        for (r0, r1) in rows:
            for (c0, c1) in cols:
                blk = np.asarray(wmm[r0:r1, c0:c1])
                glab = np.asarray(lmm[r0:r1, c0:c1])
                tile_loads += 1
                lift = raise_[glab]
                np.maximum(blk, lift.astype(np.float32), out=blk,
                           where=np.isfinite(lift))
                wmm[r0:r1, c0:c1] = blk
    if stats is not None:
        stats.update(method="twopass", data_passes=2,
                     tile_loads=tile_loads, n_labels=int(next_base),
                     n_edges=int(a.shape[0]))
    return raise_


def _fill_schwarz(dem_path, state_path, tile, eps, no_data, max_passes,
                  verbose, stats):
    import jax.numpy as jnp

    from richdem_tpu.parallel.sharded import _local_fill_solve

    dem = _open_raster(dem_path)
    if no_data is None:
        no_data = getattr(dem, "no_data", None)
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
    if stats is not None:
        stats.update(method="schwarz", data_passes=pas + 1,
                     tile_loads=(pas + 1) * len(rows) * len(cols))
    return state_path


def _local_accum_solve_np(fd_t, w_eff):
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        from richdem_tpu.ops.pallas_folded import d8_accumulation_gs
        return np.asarray(d8_accumulation_gs(
            jnp.asarray(fd_t), weights=jnp.asarray(w_eff)))
    from richdem_tpu.ops.accum import _d8_gs_impl
    return np.asarray(_d8_gs_impl(jnp.asarray(fd_t), jnp.asarray(w_eff)))


def _ring_index(th, tw):
    """Flat indices of a tile's border ring, row-major unique."""
    idx = []
    idx.append(np.arange(tw))                         # top row
    if th > 1:
        idx.append((th - 1) * tw + np.arange(tw))     # bottom row
    if th > 2:
        inner = np.arange(1, th - 1)
        idx.append(inner * tw)                        # left col
        if tw > 1:
            idx.append(inner * tw + (tw - 1))         # right col
    return np.concatenate(idx)


def out_of_core_accum_d8(fd_path, weights_path=None, out_path=None,
                         tile=2048, max_passes=64, verbose=False,
                         method="auto", stats=None):
    """D8 flow accumulation over a disk-resident flow-direction raster
    with O(tile) memory — the ``parallel_d8_accum`` [P2] program.

    ``method="twopass"`` (default): [P2]'s two-pass perimeter-link
    protocol (arxiv 1608.04431 §3–4).  Pass 1 solves each tile with zero
    external inflow and records, per perimeter cell, its local
    accumulation and its LINK — the perimeter cell its flow path exits
    the tile through (device successor-resolve).  The O(perimeter)
    inter-tile exit graph (out-degree ≤ 1 per exit for single-flow D8)
    is propagated topologically on the host; pass 2 re-solves each tile
    once with the exact entry inflows injected into the weights.
    Exactly two passes over the data at any scale.

    ``method="schwarz"``: iterative halo sweeps (kept as the
    cross-validation engine; one pass per tile-crossing of the longest
    flow path).  Output of both equals the topological-queue result.
    """
    if method == "auto":
        method = "twopass"
    if method == "twopass":
        return _accum_twopass(fd_path, weights_path, out_path, tile,
                              verbose, stats)
    return _accum_schwarz(fd_path, weights_path, out_path, tile,
                          max_passes, verbose, stats)


def _accum_twopass(fd_path, weights_path, out_path, tile, verbose, stats):
    fd_mm = _open_raster(fd_path)
    h, w = fd_mm.shape
    wt_mm = (_open_raster(weights_path)
             if weights_path is not None else None)
    if out_path is None:
        out_path = str(fd_path) + ".accum.npy"
    acc = np.lib.format.open_memmap(out_path, mode="w+",
                                    dtype=np.float32, shape=(h, w))
    rows = _tile_ranges(h, tile)
    cols = _tile_ranges(w, tile)
    twopass_accum_into(fd_mm, wt_mm, acc, rows, cols, stats)
    acc.flush()
    return out_path


def twopass_accum_into(fd_mm, wt_mm, acc, rows, cols, stats=None):
    """The [P2] protocol over any array-likes (memmaps or RAM arrays);
    writes the exact accumulation into ``acc``."""
    import jax.numpy as jnp

    from richdem_tpu.methods import watersheds_from_flowdirs
    from richdem_tpu.topology import DX, DY

    h, w = fd_mm.shape
    row_starts = np.array([r0 for r0, _ in rows])
    col_starts = np.array([c0 for c0, _ in cols])

    def owner(r, c):
        ri = int(np.searchsorted(row_starts, r, side="right") - 1)
        ci = int(np.searchsorted(col_starts, c, side="right") - 1)
        return ri, ci

    # ---- pass 1: local solves + perimeter links (one read per tile)
    # ring data per tile, each O(perimeter): global flat ids, local a0,
    # fd codes, and link (global flat id of the in-tile exit/terminal)
    ring = {}
    tile_loads = 0
    for ri, (r0, r1) in enumerate(rows):
        for ci, (c0, c1) in enumerate(cols):
            fd_t = np.asarray(fd_mm[r0:r1, c0:c1], np.int8)
            tile_loads += 1
            # explicit copy: a same-dtype slice would be a VIEW and the
            # zeroing below must never write back into the caller's array
            wt = (np.array(wt_mm[r0:r1, c0:c1], dtype=np.float32)
                  if wt_mm is not None
                  else np.ones(fd_t.shape, np.float32))
            wt[fd_t < 0] = 0.0
            a0 = _local_accum_solve_np(fd_t, wt)
            # link: terminal of each cell's path WITHIN the tile
            # (off-tile-pointing cells pin to themselves)
            term = np.asarray(
                watersheds_from_flowdirs(jnp.asarray(fd_t))).reshape(-1)
            th, tw = fd_t.shape
            ridx = _ring_index(th, tw)
            lr, lc = np.divmod(ridx, tw)
            tr, tc = np.divmod(term[ridx], tw)
            ring[(ri, ci)] = {
                "gid": (lr + r0) * w + (lc + c0),
                "a0": a0.reshape(-1)[ridx].astype(np.float64),
                "fd": fd_t.reshape(-1)[ridx],
                "link_gid": (tr + r0) * w + (tc + c0),
            }

    # ---- global O(perimeter) combine: exit graph + topological sweep
    # per-exit info: target entry cell; the entry's forwarding exit
    exit_a0 = {}        # exit gid -> local accumulation
    exit_target = {}    # exit gid -> (owner tile, entry gid) or None
    entry_link = {}     # entry gid -> its tile's exit gid (self-pins too)
    ring_fd = {}        # ring gid -> fd code
    for (ri, ci), rg in ring.items():
        r0, _ = rows[ri]
        c0, _ = cols[ci]
        r1 = rows[ri][1]
        c1 = cols[ci][1]
        gids = rg["gid"]
        rr, cc = np.divmod(gids, w)
        fd = rg["fd"].astype(np.int32)
        dy = np.asarray(DY, np.int32)[np.clip(fd, 0, 8)]
        dx = np.asarray(DX, np.int32)[np.clip(fd, 0, 8)]
        nr, nc = rr + dy, cc + dx
        flows = fd > 0
        off_tile = flows & ((nr < r0) | (nr >= r1) | (nc < c0) | (nc >= c1))
        on_grid = (nr >= 0) & (nr < h) & (nc >= 0) & (nc < w)
        for i in np.nonzero(off_tile)[0]:
            g = int(gids[i])
            exit_a0[g] = float(rg["a0"][i])
            exit_target[g] = (int(nr[i] * w + nc[i])
                              if on_grid[i] else None)
        for i in range(gids.shape[0]):
            entry_link[int(gids[i])] = int(rg["link_gid"][i])
            ring_fd[int(gids[i])] = int(fd[i])

    def forward_of(q):
        """The exit that amounts crossing out of ``q`` route to next."""
        e = exit_target[q]
        if e is None:
            return None, None  # flow left the DEM
        x = entry_link.get(e)
        # x is the in-tile terminal of the entry's path: an exit cell iff
        # it is in an exit record (off-tile pointing); else internal sink
        return e, (x if x in exit_a0 else None)

    indeg = {q: 0 for q in exit_a0}
    for q in exit_a0:
        _, x = forward_of(q)
        if x is not None:
            indeg[x] += 1
    delta = {q: 0.0 for q in exit_a0}
    work = [q for q, d in indeg.items() if d == 0]
    processed = 0
    while work:
        q = work.pop()
        processed += 1
        amount = exit_a0[q] + delta[q]
        _, x = forward_of(q)
        if x is not None:
            delta[x] += amount
            indeg[x] -= 1
            if indeg[x] == 0:
                work.append(x)
    if processed != len(exit_a0):
        raise RuntimeError("inter-tile exit graph has a cycle — the "
                           "flow-direction raster is not acyclic")

    # entry injections for pass 2
    inject = {}  # (ri, ci) -> {local flat: amount}
    for q in exit_a0:
        e, _ = forward_of(q)
        if e is None:
            continue
        er, ec = divmod(e, w)
        t = owner(er, ec)
        r0, c0 = rows[t[0]][0], cols[t[1]][0]
        tw = cols[t[1]][1] - c0
        local = (er - r0) * tw + (ec - c0)
        d = inject.setdefault(t, {})
        d[local] = d.get(local, 0.0) + exit_a0[q] + delta[q]

    # ---- pass 2: replay with exact entry inflows (one read per tile)
    for ri, (r0, r1) in enumerate(rows):
        for ci, (c0, c1) in enumerate(cols):
            fd_t = np.asarray(fd_mm[r0:r1, c0:c1], np.int8)
            tile_loads += 1
            # explicit CONTIGUOUS copy: with a same-dtype view here,
            # reshape(-1) would silently copy and the entry-inflow
            # injections would be lost (caught by the mesh-tiling test)
            wt = (np.array(wt_mm[r0:r1, c0:c1], dtype=np.float32)
                  if wt_mm is not None
                  else np.ones(fd_t.shape, np.float32))
            wt[fd_t < 0] = 0.0
            for local, amt in inject.get((ri, ci), {}).items():
                wt.reshape(-1)[local] += np.float32(amt)
            acc[r0:r1, c0:c1] = _local_accum_solve_np(fd_t, wt)
    if stats is not None:
        stats.update(method="twopass", data_passes=2,
                     tile_loads=tile_loads, n_exits=len(exit_a0))
    return acc


def _accum_schwarz(fd_path, weights_path, out_path, tile, max_passes,
                   verbose, stats):
    """Iterative halo-inflow sweeps (cross-validation engine for the
    two-pass protocol; also exercises the device kernels under halos)."""
    import jax.numpy as jnp

    from richdem_tpu.topology import DX, DY, D8_INVERSE

    fd_mm = _open_raster(fd_path)
    h, w = fd_mm.shape
    wt_mm = (_open_raster(weights_path)
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
    if stats is not None:
        stats.update(method="schwarz", data_passes=pas + 1,
                     tile_loads=(pas + 1) * len(rows) * len(cols))
    return out_path
