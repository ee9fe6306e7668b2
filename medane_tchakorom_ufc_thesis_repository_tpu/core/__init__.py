from medane_tchakorom_ufc_thesis_repository_tpu.core import operators, poisson  # noqa: F401
