"""Hand-written TPU kernels (Pallas) for the hot operations.

The reference's hot leaves (SURVEY.md §3, flamegraph): GMRES MGS
reductions, SpMV MatMult, norms.  XLA already fuses the matrix-free
stencil SpMV to one bandwidth-bound pass; these kernels exist for the
cases where XLA's defaults lose (row-tiled stencils with explicit VMEM
management and DMA pipelining) and as the foundation for the fused
orthogonalization path.
"""

from medane_tchakorom_ufc_thesis_repository_tpu.ops.stencil_pallas import (  # noqa: F401
    stencil2d_mv_pallas,
    stencil3d_apply_pallas,
    stencil3d_df_residual_pallas,
    stencil3d_mv_cast_pallas,
    stencil3d_mv_pallas,
    stencil3d_prolong_jacobi_pallas,
    stencil3d_residual_restrict_pallas,
)

from medane_tchakorom_ufc_thesis_repository_tpu.ops.fused_pallas import (  # noqa: F401
    maxpy_pallas,
    mdot_pallas,
    mosaic_available,
    pallas_enabled,
    residual_norm_sq,
    spmm_panel,
    stencil2d_mv_norm_pallas,
    stencil3d_mv_norm_pallas,
    stencil2d_spmm_pallas,
)

from medane_tchakorom_ufc_thesis_repository_tpu.ops.bsr_pallas import (  # noqa: F401
    bsr_mv_pallas,
)
