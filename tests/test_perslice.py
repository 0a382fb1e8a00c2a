"""2D / anisotropic per-slice mode (VERDICT r2 item 8).

Reference role: 2D vector_to_embedding path + per-slice flood & stitch
(/root/reference/skoots/lib/vector_to_embedding.py:51-76,
/root/reference/skoots/utils/flood_and_stitch.py:38-133).
"""

import jax.numpy as jnp
import numpy as np

from skoots_tpu.infer.perslice import perslice_segment
from skoots_tpu.ops.vec2embed import vector_to_embedding
from skoots_tpu.utils.synthetic import make_tubes, perfect_prediction
from skoots_tpu.validate.metrics import accuracies_from_iou, mask_iou


class TestVec2Embed2D:
    def test_2d_single_step_matches_manual(self):
        vec = np.zeros((1, 8, 8, 2), np.float32)
        vec[0, 2, 3] = [0.5, -0.25]
        emb = np.asarray(vector_to_embedding(jnp.asarray([4.0, 8.0]),
                                             jnp.asarray(vec)))
        assert emb.shape == (1, 8, 8, 2)
        np.testing.assert_allclose(emb[0, 2, 3], [2 + 2.0, 3 - 2.0])
        np.testing.assert_allclose(emb[0, 0, 0], [0, 0])

    def test_2d_n_step_walk(self):
        """n>1 re-applies the field at the rounded embedded position — the
        3D machinery is dimension-generic (superset of the reference's
        single-step 2D path)."""
        vec = np.zeros((1, 8, 8, 2), np.float32)
        vec[0, 0, 0] = [1.0, 0.0]   # step to (2, 0)
        vec[0, 2, 0] = [1.0, 0.0]   # then to (4, 0)
        emb = np.asarray(vector_to_embedding(
            jnp.asarray([2.0, 2.0]), jnp.asarray(vec), n=2))
        np.testing.assert_allclose(emb[0, 0, 0], [4.0, 0.0])


class TestPerSliceSegment:
    def test_oracle_recovers_separated_tubes(self):
        img, labels, skels = make_tubes(shape=(64, 64, 12), n_tubes=3,
                                        seed=7, min_separation=10)
        pred = perfect_prediction(labels, skels, vector_scale=(12, 12, 6))
        skel = (pred[..., 3] > 0.5).astype(np.uint8)
        sem = (pred[..., 4] > 0.5).astype(np.uint8)
        out = perslice_segment(pred[..., 0:3], skel, sem, (12, 12, 6),
                               embed_iterations=5)
        assert out.shape == labels.shape
        iou = mask_iou(labels, out)
        tp, fp, fn = accuracies_from_iou(iou, 0.5)
        n_gt = len(np.unique(labels)) - 1
        assert tp == n_gt and fn == 0, (tp, fp, fn)

    def test_z_stitching_unifies_slices(self):
        """A single z-columnar object must come out as ONE instance, not
        one per slice."""
        labels = np.zeros((16, 16, 6), np.int32)
        labels[4:9, 4:9, :] = 1
        skels = {1: np.asarray([[6.0, 6.0, float(z)] for z in range(6)],
                               np.float32)}
        pred = perfect_prediction(labels, skels, vector_scale=(6, 6, 3))
        skel = (pred[..., 3] > 0.5).astype(np.uint8)
        sem = (pred[..., 4] > 0.5).astype(np.uint8)
        out = perslice_segment(pred[..., 0:3], skel, sem, (6, 6, 3),
                               embed_iterations=3)
        ids = np.unique(out[labels > 0])
        ids = ids[ids > 0]
        assert len(ids) == 1, ids
