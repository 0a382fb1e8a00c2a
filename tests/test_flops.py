"""Analytic UNeXT FLOP count vs XLA cost analysis on the pure-XLA model.

The analytic counter (validate/stats.py::analytic_unext_flops) exists
because the production model's Pallas kernels are opaque to cost analysis
(they report zero FLOPs). On a model forced to XLA-only paths the two
estimates must agree — this pins the analytic formula to the compiler's
own accounting.
"""

import jax
import jax.numpy as jnp
import pytest

from skoots_tpu.models.unext import UNeXT3D
from skoots_tpu.validate.stats import analytic_unext_flops, get_flops

DIMS = (16, 32, 64, 32, 16)
DEPTHS = (1, 1, 1, 1, 1)
TILE = (32, 32, 16)


def test_analytic_flops_match_cost_analysis():
    model = UNeXT3D(
        in_channels=1, out_channels=16, dims=DIMS, depths=DEPTHS,
        kernel_size=7, dtype=jnp.float32, dwconv_impl="xla",
    )
    x = jnp.zeros((1, *TILE, 1), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x,
                        deterministic=True)
    measured = get_flops(
        lambda p, t: model.apply(p, t, deterministic=True), params, x
    )
    if measured <= 0:
        pytest.skip("backend exposes no cost analysis")
    tile_vox = TILE[0] * TILE[1] * TILE[2]
    analytic = analytic_unext_flops(DIMS, DEPTHS, 7, 16, tile_vox)
    # cost analysis counts optimized HLO (fusions fold some elementwise
    # work); require same order + same leading digit-ish agreement
    assert 0.5 * measured <= analytic <= 1.6 * measured, (
        analytic, measured)


def test_analytic_flops_default_config_magnitude():
    # the default production config lands at ~267 kFLOP/vox — pin the
    # order of magnitude so refactors can't silently misplace a factor
    f = analytic_unext_flops([32, 64, 128, 64, 32], [2, 2, 2, 2, 2], 7, 32,
                             256 * 256 * 96)
    per_vox = f / (256 * 256 * 96)
    assert 200e3 < per_vox < 350e3, per_vox
