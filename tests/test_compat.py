"""torch .trch converter + model cost helpers + remaining morphology."""

import numpy as np
import pytest


class TestTorchCompat:
    def test_convert_trch_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        from skoots_tpu.train.checkpoint import load_checkpoint
        from skoots_tpu.utils.torch_compat import convert_trch

        sd = {
            "backbone.stem.weight": torch.randn(4, 1, 7, 7, 7),
            "head.weight": torch.randn(3, 4, 1, 1, 1),
        }
        ck = {
            "cfg": {"MODEL": {"DIMS": [4, 8, 16, 8, 4], "DEPTHS": [1, 1, 1, 1, 1],
                              "OUT_CHANNELS": 4, "KERNEL_SIZE": 3}},
            "model_state_dict": sd,
            "dataset_mean": 99.0,
            "dataset_std": 11.0,
        }
        p = str(tmp_path / "ref.trch")
        torch.save(ck, p)
        out = convert_trch(p)
        state = load_checkpoint(out)
        assert state["dataset_mean"] == 99.0
        assert state["cfg"].MODEL.DIMS == [4, 8, 16, 8, 4]
        assert state["extra"]["converted_from"] == p
        assert "backbone.stem.weight" in state["extra"]["torch_state_dict_keys"]

    def test_legacy_checkpoint_no_cfg(self, tmp_path):
        torch = pytest.importorskip("torch")
        from skoots_tpu.utils.torch_compat import convert_trch

        p = str(tmp_path / "legacy.trch")
        torch.save({"model_state_dict": {}}, p)
        out = convert_trch(p)  # falls back to default cfg
        assert out.endswith(".skoots")


class TestStatsFlops:
    def test_get_flops(self):
        import jax.numpy as jnp

        from skoots_tpu.validate.stats import get_flops

        f = get_flops(lambda a, b: a @ b, jnp.zeros((64, 64)), jnp.zeros((64, 64)))
        # 2*64^3 = 524288 FLOPs (cost analysis may round; just check order)
        assert f <= 0 or 1e5 < f < 1e7


class TestMedianMean:
    def test_median_filter_removes_speckle(self):
        import jax.numpy as jnp

        from skoots_tpu.ops.morphology import mean_filter, median_filter

        x = np.zeros((1, 7, 7, 7, 1), np.float32)
        x[0, 3, 3, 3, 0] = 100.0  # single speck
        med = np.asarray(median_filter(jnp.asarray(x)))
        assert med[0, 3, 3, 3, 0] == 0.0
        mean = np.asarray(mean_filter(jnp.asarray(x)))
        np.testing.assert_allclose(mean[0, 3, 3, 3, 0], 100.0 / 27, rtol=1e-5)
