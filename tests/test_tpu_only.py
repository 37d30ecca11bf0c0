"""Gates that require a real TPU (the folded kernels dispatch only at
edge ≥ 512/2048, which is prohibitive under interpret mode on CPU).

Run manually / in TPU CI:  python -m pytest tests/test_tpu_only.py -q
(the default CPU suite skips these)."""

import os

import pytest

# Must decide the backend BEFORE the conftest forces CPU: honor an env
# override, else skip when the session is CPU-pinned.
import jax
import numpy as np

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="requires a real TPU (folded kernels; conftest pins CPU)")


from richdem_tpu import oracle, synth  # noqa: E402


@pytest.fixture(scope="module")
def fd640():
    import jax.numpy as jnp
    dem = synth.perlin_dem(640, seed=4, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    return oracle.d8_flowdirs(filled)


def test_watersheds_folded_exact(fd640):
    import jax.numpy as jnp
    from richdem_tpu.methods import watersheds_from_flowdirs
    from richdem_tpu.topology import DX, DY
    got = np.asarray(watersheds_from_flowdirs(jnp.asarray(fd640)))
    h, w = fd640.shape
    fd_f = fd640.reshape(-1)
    rr, cc = np.divmod(np.arange(h * w), w)
    nr = rr + DY[np.clip(fd_f, 0, 8)]
    nc = cc + DX[np.clip(fd_f, 0, 8)]
    valid = (fd_f > 0) & (nr >= 0) & (nr < h) & (nc >= 0) & (nc < w)
    succ = np.where(valid, nr * w + nc, np.arange(h * w))
    lab = succ.copy()
    for _ in range(64):
        new = lab[lab]
        if (new == lab).all():
            break
        lab = new
    np.testing.assert_array_equal(got.reshape(-1), lab)


def test_strahler_folded_exact(fd640):
    import jax.numpy as jnp
    from richdem_tpu.ops.pallas_folded import strahler_folded
    from richdem_tpu.methods import strahler_order
    got = np.asarray(strahler_folded(jnp.asarray(fd640)))
    # reference: the XLA stencil fixpoint at a size below the dispatch
    # threshold would be used; call the folded version against a
    # from-scratch numpy computation instead
    want = _strahler_numpy(fd640)
    np.testing.assert_array_equal(got, want)


def _strahler_numpy(fd):
    from collections import deque

    from richdem_tpu.topology import DX, DY
    h, w = fd.shape
    deps = np.zeros((h, w), np.int32)
    for r in range(h):
        for c in range(w):
            d = int(fd[r, c])
            if d <= 0:
                continue
            nr, nc = r + int(DY[d]), c + int(DX[d])
            if 0 <= nr < h and 0 <= nc < w:
                deps[nr, nc] += 1
    order = np.where(fd >= 0, 1, 0).astype(np.int32)
    inmax = np.zeros((h, w), np.int32)
    incnt = np.zeros((h, w), np.int32)
    q = deque((r, c) for r in range(h) for c in range(w)
              if deps[r, c] == 0 and fd[r, c] >= 0)
    while q:
        r, c = q.popleft()
        if inmax[r, c] > 0:
            order[r, c] = (inmax[r, c] + 1 if incnt[r, c] >= 2
                           else inmax[r, c])
        d = int(fd[r, c])
        if d <= 0:
            continue
        nr, nc = r + int(DY[d]), c + int(DX[d])
        if not (0 <= nr < h and 0 <= nc < w):
            continue
        o = order[r, c]
        if o > inmax[nr, nc]:
            inmax[nr, nc], incnt[nr, nc] = o, 1
        elif o == inmax[nr, nc]:
            incnt[nr, nc] += 1
        deps[nr, nc] -= 1
        if deps[nr, nc] == 0:
            q.append((nr, nc))
    return order


def test_upslope_folded_exact(fd640):
    import jax.numpy as jnp
    from richdem_tpu.methods import upslope_cells
    from richdem_tpu.topology import DX, DY
    h, w = fd640.shape
    seeds = np.zeros((h, w), bool)
    seeds[100, 100] = seeds[400, 350] = True
    got = np.asarray(upslope_cells(jnp.asarray(seeds), jnp.asarray(fd640)))
    fd_f = fd640.reshape(-1)
    rr, cc = np.divmod(np.arange(h * w), w)
    nr = rr + DY[np.clip(fd_f, 0, 8)]
    nc = cc + DX[np.clip(fd_f, 0, 8)]
    valid = (fd_f > 0) & (nr >= 0) & (nr < h) & (nc >= 0) & (nc < w)
    succ = np.where(valid, nr * w + nc, np.arange(h * w))
    hit = seeds.reshape(-1).copy()
    s = succ.copy()
    for _ in range(64):
        nh = hit | hit[s]
        ns = s[s]
        if (nh == hit).all():
            break
        hit, s = nh, ns
    np.testing.assert_array_equal(got.reshape(-1), hit)


def test_fill_folded_large_matches_xla_small_tiles():
    """Folded fill at a >=2048 grid equals the oracle (seam + strip cover)."""
    import jax.numpy as jnp
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    dem = synth.depression_dem(2048, 2176, seed=9, dtype=np.float32,
                               n_pits=24)
    filled, _, done = fill_fixpoint_folded(dem, eps=0.0)
    assert bool(done)
    # property gate (oracle at 2048^2 would take minutes on this host):
    # no depressions remain — every cell has a non-ascending D8 path out.
    from richdem_tpu.ops.flowdirs import d8_flowdirs
    from richdem_tpu.ops.flats import resolve_flats
    fd = d8_flowdirs(filled)
    resolved = resolve_flats(filled, fd)
    fdn = np.asarray(resolved)
    # interior cells must all drain (border cells may be local minima of
    # the grid and legitimately NO_FLOW)
    assert (fdn[1:-1, 1:-1] > 0).all()
    assert (np.asarray(filled) >= dem - 1e-5).all()
