"""Solver-state checkpointing (beyond the reference, which runs every
solve within one process lifetime — SURVEY.md §5.4 "none").

Multisplitting state is tiny (the iterate ``x`` plus counters), so plain
``.npz`` files suffice; every solver accepts ``x0`` for warm restart, so
resume = load + pass ``x0``.

>>> save_state("ckpt.npz", res.x, sweeps=int(res.sweeps))
>>> x0, meta = load_state("ckpt.npz")
>>> res2 = ms.sm(op, b, x0=jnp.asarray(x0), ...)
"""

from __future__ import annotations

import json
from typing import Dict, Tuple

import numpy as np


def save_state(path: str, x, **meta) -> None:
    """Write the iterate and JSON-serializable metadata to ``path``."""
    np.savez(
        path,
        x=np.asarray(x),
        meta=np.frombuffer(
            json.dumps(meta, default=float).encode(), dtype=np.uint8
        ),
    )


def load_state(path: str) -> Tuple[np.ndarray, Dict]:
    """Return ``(x, meta)`` from a checkpoint written by ``save_state``."""
    with np.load(path) as z:
        x = z["x"]
        meta = json.loads(bytes(z["meta"].tobytes()).decode()) if "meta" in z else {}
    return x, meta
