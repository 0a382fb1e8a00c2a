"""Experimental (tuned) inference variant.

Reference /root/reference/skoots/experimental/eval.py:32-320 — a copy of the
standard eval with: probability threshold 0.5 (vs 0.8), three 2D dilations
(vs one 3D + two 2D), and an N=10 decay=0.95 embedding walk
(:138-146, :253-255). Here it is just the standard engine with those knobs.
"""

from __future__ import annotations

import numpy as np

from skoots_tpu.infer.engine import run_inference


def eval(image_path: str, checkpoint_path: str, **kwargs) -> np.ndarray:
    kwargs.setdefault("prob_threshold", 0.5)
    kwargs.setdefault("dilation_3d", 0)
    kwargs.setdefault("dilation_2d", 3)
    kwargs.setdefault("embed_iterations", 10)
    kwargs.setdefault("embed_decay", 0.95)
    return run_inference(image_path, checkpoint_path, **kwargs)
