"""Collective-traffic accounting from compiled (SPMD) HLO.

Real multi-host slices are not reachable from this environment, so
wall-clock weak-scaling numbers come from oversubscribed virtual CPU
devices — host contention, not collectives, dominates their spread.
This module makes the STRUCTURAL weak-scaling argument instead: lower
the actual sharded program at each mesh size, parse the optimized HLO
(the per-device SPMD module — shapes are already per-device), and count
the collectives and their byte volumes.  Weak scaling holds structurally
when bytes-moved-per-device and collective counts stay constant as the
mesh grows (the halo exchange is nearest-neighbor ``ppermute`` of
boundary planes; reductions are O(1) scalars).

Used by ``utils/scaling.py --structural`` and pinned in
``tests/test_hlostats.py``.
"""

from __future__ import annotations

import re
from typing import Dict

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

# collective op kinds we account (XLA HLO names; '-start' variants are
# the async split forms — count starts only, 'done' moves no new bytes)
_COLLECTIVES = (
    "collective-permute",
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shapes: str) -> int:
    """Total bytes of every ``dtype[dims]`` occurrence in ``shapes``
    (handles tuple results)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shapes):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Parse optimized HLO text → per-collective ``{count, bytes}``.

    ``bytes`` is the RESULT byte volume per device per execution of the
    op (SPMD modules carry per-device shapes).  ``-start``/``-done``
    async pairs are counted once (on the start).
    """
    stats = {k: {"count": 0, "bytes": 0} for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        s = line.strip()
        if "=" not in s:
            continue
        lhs, rhs = s.split("=", 1)
        rhs = rhs.strip()
        for kind in _COLLECTIVES:
            # match the op name at the call site, not inside operands
            m = re.search(rf"\b{kind}(-start)?\(", rhs)
            if m and f"{kind}-done" not in rhs.split("(", 1)[0]:
                # result shape(s) precede the op name in the rhs
                shapes = rhs[: m.start()]
                stats[kind]["count"] += 1
                stats[kind]["bytes"] += _shape_bytes(shapes)
                break
    return stats


def jitted_collective_stats(jitted, *args, **kwargs):
    """Lower+compile a jitted callable and account its collectives."""
    compiled = jitted.lower(*args, **kwargs).compile()
    texts = compiled.as_text()
    if isinstance(texts, (list, tuple)):
        texts = "\n".join(texts)
    return collective_stats(texts)


def total_collective_bytes(stats: Dict[str, Dict[str, int]]) -> int:
    return sum(v["bytes"] for v in stats.values())


def total_collective_count(stats: Dict[str, Dict[str, int]]) -> int:
    return sum(v["count"] for v in stats.values())
