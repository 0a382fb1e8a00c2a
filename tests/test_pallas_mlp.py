"""Fused ConvNeXt block tail (kernels/mlp.py) vs the flax composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.kernels.mlp import (
    _mlp_call,
    _xla_tail,
    mlp_block_tail,
    mlp_tail_eligible,
)


def _inputs(rng, v=1024, c=32, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((v, c)), dtype)
    s = jnp.asarray(rng.standard_normal((v, c)), dtype)
    ls = jnp.asarray(rng.standard_normal(c) * 0.1 + 1.0, dtype)
    lb = jnp.asarray(rng.standard_normal(c) * 0.1, dtype)
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.1, dtype)
    b1 = jnp.asarray(rng.standard_normal(4 * c) * 0.1, dtype)
    w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.1, dtype)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, dtype)
    g = jnp.asarray(np.full(c, 0.9), jnp.float32)
    return x, s, ls, lb, w1, b1, w2, b2, g


class TestFusedKernelParity:
    @pytest.mark.parametrize("c", [16, 32, 64, 128])
    def test_interpret_matches_xla(self, rng, c):
        x, s, ls, lb, w1, b1, w2, b2, g = _inputs(rng, v=512, c=c)
        got = np.asarray(_mlp_call(x, s, ls, lb, w1, b1, w2, b2, g,
                                   interpret=True))
        want = np.asarray(_xla_tail(x, s, ls, lb, w1, b1, w2, b2, g))
        # kernel gelu uses the A&S erf polynomial (no erf lowering in
        # Mosaic), |err| <= 1.5e-7; tolerance is set by bf16 rounding
        np.testing.assert_allclose(got, want, atol=4e-3, rtol=1e-3)

    def test_non_divisible_tile_picks_smaller(self, rng):
        # v = 576 = 64 * 9: only the 64-tile divides
        x, s, ls, lb, w1, b1, w2, b2, g = _inputs(rng, v=576, c=32)
        got = np.asarray(_mlp_call(x, s, ls, lb, w1, b1, w2, b2, g,
                                   interpret=True))
        want = np.asarray(_xla_tail(x, s, ls, lb, w1, b1, w2, b2, g))
        np.testing.assert_allclose(got, want, atol=4e-3, rtol=1e-3)

    def test_eligibility_gate(self):
        ok = jnp.zeros((1, 16, 16, 8, 32), jnp.bfloat16)
        assert mlp_tail_eligible(ok)
        assert not mlp_tail_eligible(jnp.zeros((1, 7, 5, 3, 32)))  # V=105
        assert not mlp_tail_eligible(jnp.zeros((1, 16, 16, 8, 12)))  # C%8
        assert not mlp_tail_eligible(jnp.zeros((16, 16, 8, 32)))  # 4D

    def test_gradients_flow_through_custom_vjp(self, rng):
        x, s, ls, lb, w1, b1, w2, b2, g = _inputs(rng, v=256, c=16)

        def loss(w1_):
            return jnp.sum(
                mlp_block_tail(
                    x.reshape(1, 8, 8, 4, 16), s.reshape(1, 8, 8, 4, 16),
                    ls, lb, w1_, b1, w2, b2, g,
                ) ** 2
            )

        grad = jax.grad(loss)(w1)
        assert grad.shape == w1.shape
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).sum()) > 0


class TestBlockIntegration:
    def test_block_fused_matches_unfused(self, rng):
        """ConvNeXtBlock3D with mlp_impl='pallas' (interpret off-TPU is not
        available, so compare the forced-XLA block against the fused-path
        math via _xla_tail composition on the block's own params)."""
        from skoots_tpu.models.unext import ConvNeXtBlock3D

        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 32)), jnp.float32)
        blk_x = ConvNeXtBlock3D(32, 3, 1.0, 0.0, "gelu", jnp.float32,
                                dwconv_impl="xla", mlp_impl="xla")
        params = blk_x.init({"params": jax.random.PRNGKey(0)}, x, True)
        want = blk_x.apply(params, x, True)

        # the fused branch builds an identical param tree
        blk_f = ConvNeXtBlock3D(32, 3, 1.0, 0.0, "gelu", jnp.float32,
                                dwconv_impl="xla", mlp_impl="pallas")
        params_f = blk_f.init({"params": jax.random.PRNGKey(0)}, x, True)
        flat_x = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_f = jax.tree_util.tree_flatten_with_path(params_f)[0]
        assert [k for k, _ in flat_x] == [k for k, _ in flat_f]
        assert [v.shape for _, v in flat_x] == [v.shape for _, v in flat_f]

        got = blk_f.apply(params, x, True)  # same weights through fused path
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=4e-3, rtol=1e-3
        )
