"""Shared SPMD multisplitting engine.

The outer solve loop (sweeps, staleness publishing, s-step basis
collection, Gram minimization, pseudo-period-gated termination) is
identical for every sharded layout — only the local matvecs, local
shapes, and mesh axes differ.  ``make_spmd_body`` builds the per-device
body once; layout modules (``sharded``, ``tiled``) supply:

* ``diag_mv(g)``     — A_ii on the local tile (intra-block halos inside)
* ``coupling_mv(g)`` — A_ij contribution from published peer-block state
* ``inner_solve(rhs, x)`` — per-block Krylov solve (SPMD-lockstep)
* ``lshape``         — local tile shape
* ``intra_axes`` / ``all_axes`` — mesh axes for block-local vs global
  reductions ('block' must be the leading axis of ``all_axes``)
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

import numpy as np


def make_spmd_body(
    *,
    diag_mv: Callable,
    coupling_mv: Callable,
    inner_solve: Callable,
    lshape: Tuple[int, ...],
    nb: int,
    intra_axes,
    all_axes,
    is_async: bool,
    stal: jax.Array,           # (nb,) int32 publish periods
    minimization: Optional[str],
    s: int,
    outer_damping: float,
    rtol: float,
    atol: float,
    maxiter: int,
    min_convergence_count: int,
    dtype,
):
    lsize = int(np.prod(lshape))

    def solve_gram(G, c):
        eps = jnp.finfo(dtype).eps
        jitter = eps * jnp.trace(G) / G.shape[0] + outer_damping
        G = G + jitter * jnp.eye(G.shape[0], dtype=dtype)
        ch, low = jax.scipy.linalg.cho_factor(G, lower=True)
        return jax.scipy.linalg.cho_solve((ch, low), c)

    def body(b_loc):
        rnorm0 = jnp.sqrt(lax.psum(jnp.sum(b_loc * b_loc), all_axes))
        tol_global = jnp.maximum(rtol * rnorm0, atol)
        tol_local = jnp.maximum(
            rtol / jnp.sqrt(jnp.asarray(float(nb), dtype)) * rnorm0, atol
        )
        my_stal = stal[lax.axis_index("block")]

        x0 = jnp.zeros(lshape, dtype)
        rhs0 = b_loc - coupling_mv(x0)

        def publish(x, x_vis, sweeps):
            return jnp.where((sweeps % my_stal) == 0, x, x_vis)

        def sweep_body(i, carry):
            x, x_vis, rhs, sweeps, inner_total, S, pub = carry
            res = inner_solve(rhs, x)
            x = res.x.reshape(lshape)
            inner_total = inner_total + lax.psum(res.iters, "block").astype(
                jnp.int32
            )
            sweeps = sweeps + 1
            pub = jnp.logical_or(pub, (sweeps % my_stal) == 0)
            x_vis = publish(x, x_vis, sweeps)
            rhs = b_loc - coupling_mv(x_vis)
            S = S.at[i].set(x)
            return (x, x_vis, rhs, sweeps, inner_total, S, pub)

        def minimize(S, x, x_vis, rhs, sweeps):
            if minimization == "local":
                Rcols = diag_mv(S)
                target = rhs
                axes = intra_axes
            else:
                Rcols = diag_mv(S) + coupling_mv(S)
                target = b_loc
                axes = intra_axes if minimization == "semi_local" else all_axes
            Rmat = Rcols.reshape(s, lsize).T
            tgt = target.reshape(-1)
            G = lax.psum(Rmat.T @ Rmat, axes)
            c = lax.psum(Rmat.T @ tgt, axes)
            alpha = solve_gram(G, c)
            out_sq = lax.psum(jnp.sum((tgt - Rmat @ alpha) ** 2), axes)
            outer_rnorm = jnp.sqrt(out_sq)
            x_new = (S.reshape(s, lsize).T @ alpha).reshape(lshape)
            x_vis = publish(x_new, x_vis, sweeps)
            rhs = b_loc - coupling_mv(x_vis)
            return x_new, x_vis, rhs, outer_rnorm

        def cycle(carry):
            (x, x_vis, rhs, sweeps, cycles, inner_total,
             conv_count, rnorm, outer_rnorm, converged) = carry
            S0 = jnp.zeros((s,) + lshape, dtype)
            pub0 = jnp.zeros((), bool)
            x, x_vis, rhs, sweeps, inner_total, S, pub = lax.fori_loop(
                0, s, sweep_body,
                (x, x_vis, rhs, sweeps, inner_total, S0, pub0),
            )
            if minimization is not None:
                x, x_vis, rhs, outer_rnorm = minimize(S, x, x_vis, rhs, sweeps)

            local_r = rhs - diag_mv(x)
            block_sq = lax.psum(jnp.sum(local_r * local_r), intra_axes)
            block_norm = jnp.sqrt(block_sq)
            rnorm = jnp.sqrt(lax.psum(block_sq, "block"))
            cycles = cycles + 1

            if is_async:
                # pseudo-period gate: only publish-complete cycles count
                under = block_norm <= tol_local
                all_pub = lax.psum(pub.astype(jnp.int32), "block") == nb
                conv_count = jnp.where(
                    ~under, 0,
                    jnp.where(all_pub, conv_count + 1, conv_count),
                )
                ok = (conv_count >= min_convergence_count).astype(jnp.int32)
                converged = lax.psum(ok, "block") == nb
            elif minimization == "global":
                converged = outer_rnorm <= tol_global
            elif minimization is not None:
                ok = (block_norm <= tol_local).astype(jnp.int32)
                converged = lax.psum(ok, "block") == nb
            else:
                converged = rnorm <= tol_global

            return (x, x_vis, rhs, sweeps, cycles, inner_total,
                    conv_count, rnorm, outer_rnorm, converged)

        def cond(carry):
            return jnp.logical_and(~carry[-1], carry[3] < maxiter)

        init = (
            x0, x0, rhs0,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            rnorm0, jnp.asarray(jnp.inf, dtype),
            rnorm0 <= tol_global,
        )
        (x, _, rhs, sweeps, cycles, inner_total, _, rnorm, outer_rnorm,
         converged) = lax.while_loop(cond, cycle, init)

        local_r = rhs - diag_mv(x)
        block_norm = jnp.sqrt(
            lax.psum(jnp.sum(local_r * local_r), intra_axes)
        )
        return (x, sweeps, cycles, inner_total, rnorm, rnorm0, block_norm,
                outer_rnorm, converged)

    return body
