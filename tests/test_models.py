"""Model layer tests: shapes, head ranges, param counts, jit/grad flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.models import cfg_to_model, init_model, split_output


@pytest.fixture(scope="module")
def small_cfg():
    cfg = get_cfg_defaults()
    cfg.MODEL.DIMS = [8, 16, 32, 16, 8]
    cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
    cfg.MODEL.OUT_CHANNELS = 8
    cfg.MODEL.KERNEL_SIZE = 3
    return cfg


@pytest.fixture(scope="module")
def model_and_params(small_cfg):
    return init_model(small_cfg, jax.random.PRNGKey(0), spatial=(16, 16, 8))


class TestUNeXT:
    def test_output_shape_and_channels(self, model_and_params):
        model, params = model_and_params
        x = jnp.zeros((2, 16, 16, 8, 1))
        out = model.apply(params, x)
        assert out.shape == (2, 16, 16, 8, 5)
        assert out.dtype == jnp.float32

    def test_head_ranges(self, model_and_params):
        model, params = model_and_params
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 8, 1)) * 10
        out = np.asarray(model.apply(params, x))
        vec, skel, sem = out[..., 0:3], out[..., 3:4], out[..., 4:5]
        assert vec.min() >= -1 and vec.max() <= 1  # tanh
        assert skel.min() >= 0 and skel.max() <= 1  # sigmoid
        assert sem.min() >= 0 and sem.max() <= 1

    def test_split_output(self, model_and_params):
        model, params = model_and_params
        out = model.apply(params, jnp.zeros((1, 16, 16, 8, 1)))
        v, s, p = split_output(out)
        assert v.shape[-1] == 3 and s.shape[-1] == 1 and p.shape[-1] == 1

    def test_different_input_size(self, model_and_params):
        model, params = model_and_params
        out = model.apply(params, jnp.zeros((1, 32, 24, 4, 1)))
        assert out.shape == (1, 32, 24, 4, 5)

    def test_grad_flows(self, model_and_params):
        model, params = model_and_params
        x = jnp.ones((1, 16, 16, 8, 1))

        def loss(p):
            return jnp.mean(model.apply(p, x) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)

    @pytest.mark.slow
    def test_default_cfg_param_count(self):
        # full-size default model should be a few million params (3D ConvNeXt
        # UNet at dims [32,64,128,64,32]) — sanity bound, not exact parity
        cfg = get_cfg_defaults()
        model, params = init_model(cfg, jax.random.PRNGKey(0), spatial=(8, 8, 4))
        n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
        # ConvNeXt math: ~8*d^2 + 343*d per block -> ~760k at default dims
        assert 3e5 < n < 3e7, f"param count {n}"


class TestUNet:
    def test_unet_arch(self, small_cfg):
        cfg = small_cfg.clone()
        cfg.MODEL.ARCHITECTURE = "bism_unet"
        model, params = init_model(cfg, jax.random.PRNGKey(0), spatial=(16, 16, 8))
        out = model.apply(params, jnp.zeros((1, 16, 16, 8, 1)))
        assert out.shape == (1, 16, 16, 8, 5)

    def test_unknown_arch_raises(self, small_cfg):
        cfg = small_cfg.clone()
        cfg.MODEL.ARCHITECTURE = "resnet"
        with pytest.raises(RuntimeError, match="not a valid architecture"):
            cfg_to_model(cfg)


class TestUpsample2x:
    def test_matches_jax_image_resize(self, rng):
        import jax
        import jax.numpy as jnp

        from skoots_tpu.models.unext import upsample_trilinear

        x = jnp.asarray(rng.standard_normal((2, 8, 6, 4, 3)), jnp.float32)
        want = jax.image.resize(x, (2, 16, 12, 8, 3), method="trilinear")
        got = upsample_trilinear(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


class TestStemIdentity:
    def test_dense_1toC_equals_broadcast_dwconv(self, rng):
        """The StemConv3D fast path's core identity: conv(1->C) ==
        depthwise-conv(broadcast(x, C)) with the same [k,k,k,1,C] kernel."""
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(rng.standard_normal((1, 12, 12, 8, 1)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, 16)), jnp.float32)
        dense = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        )
        wide = jnp.broadcast_to(x, (1, 12, 12, 8, 16))
        dw = jax.lax.conv_general_dilated(
            wide, w, (1, 1, 1), "SAME",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
            feature_group_count=16,
        )
        np.testing.assert_allclose(np.asarray(dense), np.asarray(dw),
                                   atol=1e-5)
