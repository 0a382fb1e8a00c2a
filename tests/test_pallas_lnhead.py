"""Fused LN + 1x1 head kernel vs the flax/XLA composition."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from skoots_tpu.kernels.lnhead import (  # noqa: E402
    _ln_head_call,
    _xla_ln_head,
    ln_head,
    ln_head_eligible,
)


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def _inputs(rng, v=512, c=32, n=32, dt=jnp.float32):
    x = jnp.asarray(rng.standard_normal((v, c)), dt)
    ls = jnp.asarray(rng.standard_normal(c) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, n)) * 0.2, dt)
    b = jnp.asarray(rng.standard_normal(n) * 0.1, dt)
    return x, ls, lb, w, b


class TestLnHeadKernel:
    @pytest.mark.parametrize("c,n", [(32, 32), (32, 8), (64, 32)])
    def test_interpret_matches_xla(self, rng, c, n):
        x, ls, lb, w, b = _inputs(rng, v=512, c=c, n=n)
        got = np.asarray(_ln_head_call(x, ls, lb, w, b, interpret=True))
        want = np.asarray(_xla_ln_head(x, ls, lb, w, b))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_wrapper_matches_flax_composition(self, rng):
        """The fused model branch must equal LayerNorm+Conv numerics."""
        from flax import linen as nn

        x5 = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 32)), jnp.float32)

        class Tail(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(x)
                return nn.Conv(16, kernel_size=(1, 1, 1), dtype=jnp.float32,
                               name="head_conv")(x)

        m = Tail()
        p = m.init(jax.random.PRNGKey(0), x5)
        want = np.asarray(m.apply(p, x5))
        prm = p["params"]
        got = np.asarray(ln_head(
            x5, prm["final_norm"]["scale"], prm["final_norm"]["bias"],
            jnp.reshape(prm["head_conv"]["kernel"], (32, 16)),
            prm["head_conv"]["bias"],
        ))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_eligibility(self):
        assert ln_head_eligible(jnp.zeros((1, 16, 16, 8, 32), jnp.bfloat16))
        assert not ln_head_eligible(jnp.zeros((1, 4, 4, 4, 3)))  # lanes
        assert not ln_head_eligible(jnp.zeros((4, 32)))  # rank

    def test_grad_matches_xla_composition(self, rng):
        x, ls, lb, w, b = _inputs(rng, v=512, c=32, n=16)
        x5 = x.reshape(1, 8, 8, 8, 32)

        def f_fused(*a):
            return jnp.sum(ln_head(*a) ** 2)

        def f_ref(*a):
            return jnp.sum(_xla_ln_head(*a) ** 2)

        g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x5, ls, lb, w, b)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x5, ls, lb, w, b)
        for a, bb in zip(g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), atol=1e-4, rtol=1e-4
            )

    def test_unext_model_tree_unchanged(self, rng):
        """Forcing the fused head must not change the param tree or (at
        f32) the outputs of the full model."""
        import os

        from skoots_tpu.models.unext import UNeXT3D

        x = jnp.asarray(rng.standard_normal((1, 16, 16, 8, 1)), jnp.float32)
        m = UNeXT3D(dims=(8, 16, 8), depths=(1, 1, 1), kernel_size=3,
                    out_channels=4, dtype=jnp.float32)
        old = os.environ.pop("SKOOTS_LNHEAD_IMPL", None)
        try:
            os.environ["SKOOTS_LNHEAD_IMPL"] = "xla"
            p_ref = m.init(jax.random.PRNGKey(0), x)
            want = np.asarray(m.apply(p_ref, x))
            os.environ["SKOOTS_LNHEAD_IMPL"] = "pallas"
            p_fused = m.init(jax.random.PRNGKey(0), x)
            assert (jax.tree_util.tree_structure(p_ref)
                    == jax.tree_util.tree_structure(p_fused))
            got = np.asarray(m.apply(p_ref, x))
        finally:
            if old is None:
                os.environ.pop("SKOOTS_LNHEAD_IMPL", None)
            else:
                os.environ["SKOOTS_LNHEAD_IMPL"] = old
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
