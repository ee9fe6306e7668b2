from medane_tchakorom_ufc_thesis_repository_tpu.solvers.krylov import (  # noqa: F401
    KrylovResult,
    bicgstab,
    cg,
    gmres,
    minres,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.lsqr import (  # noqa: F401
    cgne,
    lsqr,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.lstsq import (  # noqa: F401
    lstsq_normal,
    lstsq_qr,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.castep import (  # noqa: F401
    ca_gmres,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.chebyshev import (  # noqa: F401
    chebyshev,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.refine import (  # noqa: F401
    df_northstar_fused,
    iterative_refinement,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.multigrid import (  # noqa: F401
    mg_preconditioner,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.amg import (  # noqa: F401
    AMGPreconditioner,
    amg_setup,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.bjacobi import (  # noqa: F401
    BlockJacobi,
    block_jacobi_from_coo,
    block_jacobi_from_scipy,
)
