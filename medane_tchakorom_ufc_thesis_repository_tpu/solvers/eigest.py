"""Lanczos spectral-interval estimation for SPD operators.

The Chebyshev inner iteration and the CA-GMRES Newton basis need the
spectral interval ``[lmin, lmax]``.  The Poisson strip operators carry
analytic bounds (``diag_eig_bounds``); user (AIJ) matrices do not — the
reference inherits this from PETSc, whose ``KSPChebyshev`` runs a few
GMRES iterations to estimate the interval (``-ksp_chebyshev_esteig``).
Here the TPU-idiomatic equivalent: a fixed-trip-count Lanczos recurrence
(matvec + two dots per step — one jitted program, no data-dependent
control flow) whose extreme Ritz values converge to the extreme
eigenvalues first, safety-widened exactly like PETSc's default
``esteig 0,0.1,0,1.1`` transform.

Reference anchor: ``initializeKSP``/``KSPSetFromOptions``
(``src/utils/utils.c:511-530``) exposes PETSc's whole KSP zoo including
Chebyshev with estimated eigenvalues.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lanczos_bounds"]


def lanczos_bounds(mv: Callable, n: int, *, iters: int = 30,
                   seed: int = 7, safety: float = 0.1,
                   dtype=None) -> Tuple[float, float]:
    """Estimate the spectral interval of an SPD operator.

    Runs ``iters`` Lanczos steps with full reorthogonalization (two
    whole-basis matmuls per step — CGS-style, MXU-shaped; numerically
    equivalent to the textbook recurrence but immune to the ghost-
    eigenvalue duplication that breaks the raw three-term form in f32),
    then returns the Ritz interval widened by ``safety`` on each side:
    ``((1 - safety) * min(theta), (1 + safety) * max(theta))`` — the
    PETSc ``esteig`` transform shape.

    Raises ``ValueError`` if the estimated interval is not positive
    (the operator is not SPD as far as Lanczos can see — Chebyshev and
    the Newton basis are inapplicable).
    """
    if n < 1:
        raise ValueError(f"n must be positive, got {n}")
    m = max(2, min(int(iters), n))

    @jax.jit
    def run(v0):
        dt = v0.dtype

        def step(carry, _):
            V, alphas, betas, j = carry
            v = V[j]
            w = mv(v)
            # full reorthogonalization: rows > j of V are zero, so one
            # pair of whole-basis matmuls handles every previous vector
            h = V @ w
            w = w - V.T @ h
            h2 = V @ w
            w = w - V.T @ h2
            alpha = h[j] + h2[j]
            beta = jnp.sqrt(jnp.sum(w * w))
            vnext = jnp.where(beta > 0, w / jnp.where(beta > 0, beta, 1.0),
                              w)
            V = V.at[j + 1].set(vnext)
            alphas = alphas.at[j].set(alpha)
            betas = betas.at[j].set(beta)
            return (V, alphas, betas, j + 1), None

        V = jnp.zeros((m + 1, n), dt).at[0].set(v0)
        alphas = jnp.zeros((m,), dt)
        betas = jnp.zeros((m,), dt)
        (V, alphas, betas, _), _ = jax.lax.scan(
            step, (V, alphas, betas, 0), None, length=m
        )
        # Ritz values of the m x m tridiagonal (betas[m-1] is the
        # residual coupling, not part of it)
        theta = jax.scipy.linalg.eigh_tridiagonal(
            alphas, betas[: m - 1], eigvals_only=True
        )
        return theta

    rng = np.random.default_rng(seed)
    v0 = rng.standard_normal(n)
    v0 /= np.linalg.norm(v0)
    dt = jnp.float32 if dtype is None else dtype
    theta = np.asarray(run(jnp.asarray(v0, dt)), np.float64)
    tmin, tmax = float(theta.min()), float(theta.max())
    lmin = (1.0 - safety) * tmin
    lmax = (1.0 + safety) * tmax
    if not (np.isfinite(lmin) and np.isfinite(lmax)) or lmin <= 0:
        raise ValueError(
            f"lanczos_bounds: estimated interval [{lmin:.3e}, {lmax:.3e}] "
            "is not positive — the operator does not look SPD; "
            "chebyshev/ca_gmres need an SPD diagonal block (use "
            "gmres/cg, or pass eig_min/eig_max explicitly)"
        )
    return lmin, lmax
