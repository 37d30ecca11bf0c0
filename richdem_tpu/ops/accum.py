"""Flow accumulation by parallel upstream propagation (device ops).

Device counterpart of the reference's topological-queue engine
(``methods/flow_accumulation_generic.hpp`` — SURVEY.md §2.2, §3.2,
appendix A.6).  Two strategies, both queue-free:

* **Jacobi fixpoint** (any metric): ``A ← w + Pᵀ A`` where ``Pᵀ A`` is one
  fused 8-direction stencil (inflow from each neighbor that routes toward
  us).  ``P`` is nilpotent on the post-fill DAG, so iteration converges in
  longest-flow-path steps.  Used for multi-flow metrics and as a
  cross-check.
* **Pointer doubling** (single-flow D8): with ``succ_k = succ^(2^k)``,
  ``A_{k+1} = A_k + scatter_add(A_k → succ_k)`` satisfies
  ``A_k(c) = Σ_{u: dist(u→c) < 2^k} w(u)``, reaching the full upstream sum
  in ⌈log₂ L⌉ rounds — the TPU analog of the reference's two-pass
  perimeter-graph design [P2], without the serial producer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from richdem_tpu.ops.stencil import neighbor
from richdem_tpu.topology import DX, DY, D8_INVERSE

__all__ = ["flow_accumulation_from_props", "d8_accumulation",
           "accumulation_jacobi_info"]


def _inflow_step(acc, props):
    """One application of Pᵀ: total inflow into each cell.

    ``props``: (H, W, 8).  The neighbor in direction d sends us its
    ``acc * props[..., inverse(d)-1]``."""
    total = jnp.zeros_like(acc)
    for d in range(1, 9):
        inv = int(D8_INVERSE[d])
        contrib = acc * props[..., inv - 1]
        total = total + neighbor(contrib, d, 0.0)
    return total


@partial(jax.jit, static_argnames=("max_iters", "check_every"))
def accumulation_jacobi_info(props, weights=None, max_iters=4096,
                             check_every=8):
    """Jacobi accumulation; returns ``(accum, iters, converged)``."""
    props = jnp.asarray(props)
    h, w, _ = props.shape
    dtype = props.dtype if props.dtype == jnp.float64 else jnp.float32
    if weights is None:
        weights = jnp.ones((h, w), dtype)
    else:
        weights = jnp.asarray(weights, dtype)
    props = props.astype(dtype)

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_iters)

    def body(state):
        acc, it, _ = state
        new = acc
        for _ in range(check_every):
            new = weights + _inflow_step(new, props)
        done = jnp.all(new == acc)
        return new, it + check_every, done

    acc0 = weights
    acc, iters, done = jax.lax.while_loop(
        cond, body, (acc0, jnp.int32(0), jnp.bool_(False)))
    return acc, iters, done


def flow_accumulation_from_props(props, weights=None, no_data_mask=None,
                                 max_iters=4096):
    """Weighted upstream accumulation from (H, W, 8) proportions.

    Nodata cells must already have zero proportions (they do, from
    :mod:`richdem_tpu.ops.flowdirs`); the mask only zeroes their output."""
    acc, _, _ = accumulation_jacobi_info(props, weights,
                                         max_iters=max_iters)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    return acc


# -- D8 pointer doubling ------------------------------------------------

@partial(jax.jit, static_argnames=("rounds",))
def _d8_doubling_impl(flowdirs, weights, rounds):
    fd = jnp.asarray(flowdirs).astype(jnp.int32)
    h, w = fd.shape
    n = h * w
    sink = n  # virtual terminal: NO_FLOW / nodata / off-grid flows here

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dy = jnp.asarray(np.asarray(DY, np.int32))[fd.clip(0)]
    dx = jnp.asarray(np.asarray(DX, np.int32))[fd.clip(0)]
    nr, nc = rows + dy, cols + dx
    valid = (fd > 0) & (nr >= 0) & (nr < h) & (nc >= 0) & (nc < w)
    succ0 = jnp.where(valid, nr * w + nc, sink).reshape(-1)
    succ0 = jnp.append(succ0, sink)  # sink loops to itself

    acc0 = jnp.append(weights.reshape(-1), 0.0)

    def body(_, state):
        succ, acc = state
        # add my accumulated upstream mass to my 2^k-th successor …
        acc = acc.at[succ].add(jnp.where(
            jnp.arange(n + 1) < n, acc, 0.0))
        # … and square the successor pointer
        succ = succ[succ]
        return succ, acc

    _, acc = jax.lax.fori_loop(0, rounds, body, (succ0, acc0))
    return acc[:n].reshape(h, w)


def d8_accumulation(flowdirs, weights=None, no_data_mask=None,
                    rounds=None):
    """Exact D8 accumulation in ⌈log₂(n)⌉ scatter-add rounds."""
    fd = jnp.asarray(flowdirs)
    h, w = fd.shape
    if weights is None:
        weights = jnp.ones((h, w), jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
    if no_data_mask is not None:
        weights = jnp.where(jnp.asarray(no_data_mask), 0.0, weights)
    if rounds is None:
        rounds = max(1, int(np.ceil(np.log2(max(h * w, 2)))))
    acc = _d8_doubling_impl(fd, weights, rounds)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    return acc
