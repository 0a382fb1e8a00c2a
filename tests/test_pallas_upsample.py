"""Pallas fused 2x trilinear upsample vs the XLA composition / resize."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from skoots_tpu.kernels.upsample import (  # noqa: E402
    _pallas_impl,
    _xla_upsample,
    upsample2x_eligible,
    upsample2x_trilinear,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestPallasUpsample:
    @pytest.mark.parametrize(
        "shape",
        [
            (1, 8, 8, 8, 8),
            (1, 16, 8, 4, 16),
            (2, 8, 6, 10, 8),   # odd-ish spatial dims, batch > 1
            (1, 4, 4, 24, 128),  # the 1/4-res decoder shape family
            (1, 16, 16, 24, 16),  # z-blocked path (zs > bz)
        ],
    )
    def test_matches_xla_composition(self, rng, shape):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        want = _xla_upsample(x)
        got = _pallas_impl(x, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6
        )

    def test_matches_jax_image_resize(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 6, 4, 8)), jnp.float32)
        b, xs, ys, zs, c = x.shape
        want = jax.image.resize(
            x, (b, 2 * xs, 2 * ys, 2 * zs, c), method="trilinear"
        )
        got = _pallas_impl(x, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    def test_bfloat16_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 8)), jnp.bfloat16)
        got = _pallas_impl(x, interpret=True)
        want = _xla_upsample(x)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=1e-2,
        )

    def test_eligibility_gate(self, rng):
        ok = jnp.zeros((1, 8, 8, 8, 16), jnp.bfloat16)
        assert upsample2x_eligible(ok)
        assert not upsample2x_eligible(jnp.zeros((1, 8, 8, 8, 3)))  # lanes
        assert not upsample2x_eligible(
            jnp.zeros((1, 8, 8, 8, 16), jnp.int32)
        )

    def test_vmem_budget_at_bigvol_shape(self):
        """The 1024^3-proof decoder shape (48,48,24,128) OOM'd scoped VMEM
        at 24.7 MB when z was unblocked; the block picker must keep the
        per-step liveness estimate under budget for it."""
        from skoots_tpu.kernels.upsample import (
            _VMEM_BUDGET,
            _pick_blocks,
            _vmem_peak,
        )

        blocks = _pick_blocks(48, 48, 24, 128, 2)
        assert blocks is not None
        assert _vmem_peak(*blocks, 128, 2) <= _VMEM_BUDGET
        # and the picked geometry still divides the shape
        for d, b in zip((48, 48, 24), blocks):
            assert d % b == 0

    def test_zblocked_matches_xla(self, rng):
        """Exactly the bigvol failure family, shrunk in c for speed."""
        x = jnp.asarray(rng.standard_normal((1, 48, 48, 24, 8)), jnp.float32)
        want = _xla_upsample(x)
        got = _pallas_impl(x, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6
        )

    def test_wrapper_grad_is_exact_transpose(self, rng):
        """The custom_vjp backward must be the exact linear transpose."""
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 8)), jnp.float32)
        ct = jnp.asarray(
            rng.standard_normal((1, 8, 8, 8, 8)), jnp.float32
        )
        _, vjp_fused = jax.vjp(upsample2x_trilinear, x)
        _, vjp_ref = jax.vjp(_xla_upsample, x)
        np.testing.assert_allclose(
            np.asarray(vjp_fused(ct)[0]), np.asarray(vjp_ref(ct)[0]),
            atol=2e-6,
        )


class TestMXUUpsample:
    """The interleave-matmul re-expression (kernels/upsample._mxu_upsample):
    blend + interleave per axis as one dot_general with a 2-nonzeros-per-row
    matrix — MXU work instead of VPU relayouts. Opt-in until its on-chip
    A/B lands (SKOOTS_UPSAMPLE_IMPL=mxu)."""

    def test_matches_xla_composition_exactly(self, rng):
        import jax
        import jax.numpy as jnp

        from skoots_tpu.kernels.upsample import _mxu_upsample, _xla_upsample

        for shape in [(1, 16, 12, 8, 8), (2, 8, 8, 4, 16), (1, 5, 7, 3, 4)]:
            x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
            a = np.asarray(jax.jit(_mxu_upsample)(x))
            b = np.asarray(_xla_upsample(x))
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_env_opt_in(self, rng, monkeypatch):
        import jax.numpy as jnp

        from skoots_tpu.kernels import upsample as up

        monkeypatch.setenv("SKOOTS_UPSAMPLE_IMPL", "mxu")
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4, 8)).astype(np.float32))
        a = np.asarray(up.upsample2x_trilinear(x))
        b = np.asarray(up._xla_upsample(x))
        np.testing.assert_allclose(a, b, atol=1e-6)
