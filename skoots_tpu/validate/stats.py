"""Per-object morphometrics + model cost (reference /root/reference/skoots/validate/stats.py).

Surface area uses exposed-face counting (6-connectivity) rather than marching
cubes (the reference's skimage dependency is absent here); for convex-ish
organelles the two differ by a bounded constant factor and both rank objects
identically. FLOPs/params use jax's cost analysis instead of fvcore.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def get_volume(mask: np.ndarray) -> Dict[int, int]:
    """Voxel count per instance id (reference stats.py:12-27)."""
    ids, counts = np.unique(mask[mask > 0], return_counts=True)
    return {int(i): int(c) for i, c in zip(ids, counts)}


def get_surface_area(mask: np.ndarray) -> Dict[int, int]:
    """Exposed-face count per instance (reference stats.py:30-48 role)."""
    out: Dict[int, int] = {}
    for uid in np.unique(mask[mask > 0]):
        b = (mask == uid).astype(np.int8)
        faces = 0
        for ax in range(3):
            d = np.diff(b, axis=ax)
            faces += int(np.abs(d).sum())
            # volume-boundary faces
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[ax] = 0
            sl_hi[ax] = -1
            faces += int(b[tuple(sl_lo)].sum() + b[tuple(sl_hi)].sum())
        out[int(uid)] = faces
    return out


def get_parameter_count(params) -> int:
    """Total parameter count (reference stats.py:72-83 role, sans fvcore)."""
    import jax

    return int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params)))


def get_flops(fn, *example_args) -> float:
    """FLOP estimate of a jitted function via XLA cost analysis."""
    import jax

    lowered = jax.jit(fn).lower(*example_args)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", -1.0)) if analysis else -1.0


def stats_per_instance(mask: np.ndarray) -> Dict[int, Dict[str, int]]:
    """Volume + surface area per instance (reference compare.py:8-28)."""
    vol = get_volume(mask)
    area = get_surface_area(mask)
    return {k: {"volume": vol[k], "surface_area": area.get(k, 0)} for k in vol}
