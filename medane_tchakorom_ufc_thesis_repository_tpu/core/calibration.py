"""Routing-constant calibration store (autotuned thresholds).

The operator-routing cost model (``core.operators``: BSR block-size
penalties, the gather-ELL cost bar, the dense-route cutoff) ships with
constants MEASURED on TPU v5e (BENCHMARKS.md format table).  Relative
costs shift across chip generations — the lane-padding penalty of small
BSR blocks, gather throughput, and the dense crossover are all
microarchitectural.  ``utils.calibrate`` re-measures them on the current
device with the repo-standard barriered-slope method and saves a JSON;
this module loads that file (per device kind) and serves the constants
to the routing code, falling back to the shipped v5e table.

This replaces nothing in the reference — PETSc's AIJ has one format and
no routing — it is the knob SURVEY §7.2's "measure nnz/s per chip from
day one" stance implies once more than one representation competes.

Lookup order:
  1. ``MEDANE_TPU_CALIBRATION`` env var (explicit file path),
  2. ``$XDG_CACHE_HOME/medane_tchakorom_ufc_thesis_repository_tpu/
     calibration-<device_kind>.json``,
  3. shipped v5e constants.
"""

from __future__ import annotations

import json
import os
import warnings

__all__ = [
    "SHIPPED",
    "bsr_bs_penalty",
    "calibration_path",
    "aij_relative_cost",
    "default_max_dense_n",
    "ell_relative_cost",
    "load",
    "reset_cache",
    "save",
]

# measured on TPU v5e, barriered-slope (BENCHMARKS.md):
#   * bsr_bs_penalty: per-stored-value SpMV cost relative to bs=128
#     (187/164/130/63/21 Gnnz/s for bs=128/16/32/64/8 — bs=8 pads the
#     (8,128) lane tiling 16x; the bs=64 dip reproduced across runs)
#   * ell_relative_cost: gather-ELL SpMV per-nonzero cost relative to
#     the slice (DIA/stencil) paths — the bar any other representation
#     must beat before gather-ELL is the honest answer.  Round-3
#     re-measurement: the earlier 139x used a round-1 DIA timing that
#     was harness-limited; steady-state chained DIA is 0.080 ms at
#     2048² vs 157 ms gather-ELL = 1957x (3500x at 1024² where DIA is
#     VMEM-resident; at 4096² ELL cannot even COMPILE — the (n, w)
#     gather's 25.6x-padded select OOMs HBM).  1950 is the
#     HBM-streaming value.  Practical consequence: gather-ELL survives
#     routing only when every alternative is memory-capped.
#   * max_dense_n: largest n routed to a dense MXU matvec (dense beat
#     gather-ELL at every density tested up to this size; above it the
#     n^2 storage dominates — 64 MB f32 at the cutoff)
#   * aij_relative_cost: Clos-routed AIJ SpMV per-nonzero cost relative
#     to the slice paths (round-5 on-chip, wide 8-block kernels:
#     0.071 ms at n=65536 d=10 random structureless = 11.1x the
#     values-read roofline, chained-slope).  Pattern-independent by
#     construction — replaces ell_relative_cost as the unstructured
#     routing bar (gather-ELL is retired from routing; its constant is
#     kept for the format table and tests).
SHIPPED = {
    "bsr_bs_penalty": {8: 8.0, 16: 1.3, 32: 1.5, 64: 3.0, 128: 1.0,
                       256: 2.5},
    "ell_relative_cost": 1950.0,
    "aij_relative_cost": 12.0,
    "max_dense_n": 4096,
}

_loaded = None


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind.replace(" ", "_").replace(
            "/", "_")
    except Exception:  # backend init can fail in exotic envs — shipped
        return "unknown"  # constants still apply


def calibration_path(kind: str | None = None) -> str:
    env = os.environ.get("MEDANE_TPU_CALIBRATION")
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.expanduser("~/.cache"))
    return os.path.join(
        base, "medane_tchakorom_ufc_thesis_repository_tpu",
        f"calibration-{kind or _device_kind()}.json",
    )


def load() -> dict:
    """Constants for the current device: saved calibration merged over
    the shipped defaults (cached after the first call; ``reset_cache``
    after saving a new calibration in-process)."""
    global _loaded
    if _loaded is None:
        out = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in SHIPPED.items()}
        path = calibration_path()
        if os.path.exists(path):
            try:
                with open(path) as f:
                    data = json.load(f)
                pen = {int(k): float(v)
                       for k, v in data.get("bsr_bs_penalty", {}).items()}
                if pen:
                    out["bsr_bs_penalty"] = pen
                if "ell_relative_cost" in data:
                    out["ell_relative_cost"] = float(
                        data["ell_relative_cost"])
                if "aij_relative_cost" in data:
                    out["aij_relative_cost"] = float(
                        data["aij_relative_cost"])
                if "max_dense_n" in data:
                    out["max_dense_n"] = int(data["max_dense_n"])
                out["source"] = path
            except (OSError, ValueError) as e:
                warnings.warn(
                    f"ignoring unreadable calibration file {path!r}: {e}",
                    UserWarning,
                )
        _loaded = out
    return _loaded


def reset_cache() -> None:
    global _loaded
    _loaded = None


def bsr_bs_penalty() -> dict:
    return load()["bsr_bs_penalty"]


def ell_relative_cost() -> float:
    return load()["ell_relative_cost"]


def aij_relative_cost() -> float:
    return load()["aij_relative_cost"]


def default_max_dense_n() -> int:
    return load()["max_dense_n"]


def save(cal: dict, path: str | None = None) -> str:
    """Persist a measured calibration (``utils.calibrate`` output) and
    reset the in-process cache so routing picks it up immediately."""
    path = path or calibration_path(cal.get("device_kind"))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(cal, f, indent=2, sort_keys=True)
    reset_cache()
    return path
