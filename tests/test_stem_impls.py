"""Stem im2col and Downsample matmul variants vs their XLA conv twins.

Both variants re-express the same contraction for the MXU (reference role:
the stem/downsample convs of bism's UNeXT, lib/utils.py); they must agree
with the lax.conv lowering to accumulation-rounding tolerance and build
byte-identical param trees."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from skoots_tpu.models.unext import Downsample, StemConv3D  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(11)


class TestStemIm2col:
    def test_matches_xla_conv(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 16, 12, 8, 1)), jnp.float32)
        ref = StemConv3D(8, kernel_size=7, dtype=jnp.float32, impl="xla")
        alt = StemConv3D(8, kernel_size=7, dtype=jnp.float32, impl="im2col")
        p = ref.init(jax.random.PRNGKey(0), x)
        want = ref.apply(p, x)
        got = alt.apply(p, x)  # identical param tree by construction
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )

    def test_bf16_close(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 1)), jnp.bfloat16)
        ref = StemConv3D(8, kernel_size=3, dtype=jnp.bfloat16, impl="xla")
        alt = StemConv3D(8, kernel_size=3, dtype=jnp.bfloat16, impl="im2col")
        p = ref.init(jax.random.PRNGKey(1), x)
        np.testing.assert_allclose(
            np.asarray(alt.apply(p, x), np.float32),
            np.asarray(ref.apply(p, x), np.float32),
            atol=5e-2, rtol=5e-2,
        )


class TestDownsampleMatmul:
    def test_matches_xla_conv(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 12, 4, 16)), jnp.float32)
        ref = Downsample(32, dtype=jnp.float32, impl="xla")
        alt = Downsample(32, dtype=jnp.float32, impl="matmul")
        p = ref.init(jax.random.PRNGKey(0), x)
        pa = alt.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pa)
        want = ref.apply(p, x)
        got = alt.apply(p, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )

    def test_odd_extent_falls_back(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 5, 8)), jnp.float32)
        alt = Downsample(16, dtype=jnp.float32, impl="matmul")
        p = alt.init(jax.random.PRNGKey(0), x)
        out = alt.apply(p, x)  # odd z: must route through nn.Conv
        assert out.shape == (1, 3, 3, 3, 16)  # SAME padding: ceil(5/2)
