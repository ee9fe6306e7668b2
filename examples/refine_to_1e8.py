"""North-star demo: 3D Poisson to 1e-8+ relative residual on f32 hardware.

Two to three passes of f32 GMRES on-device with f64 residuals on host
(classic iterative refinement).  See solvers/refine.py.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
from medane_tchakorom_ufc_thesis_repository_tpu.solvers import gmres
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.refine import (
    iterative_refinement,
    stencil3d_mv_np,
)

nx = 64
op = poisson.poisson3d(nx, nx, nx)
mv64 = stencil3d_mv_np(nx, nx, nx)
b = mv64(np.ones(nx ** 3))

solve32 = jax.jit(
    lambda r: gmres(op.mv, r, restart=30, maxiter=3000, rtol=1e-5).x
)
res = iterative_refinement(solve32, mv64, b, rtol=1e-10)
print(f"passes={res.passes} rel_residual={res.rnorm / res.rnorm0:.2e} "
      f"max|x-1|={np.max(np.abs(res.x - 1.0)):.2e} converged={res.converged}")
