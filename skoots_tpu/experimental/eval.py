"""Experimental (tuned) inference variant.

Reference /root/reference/skoots/experimental/eval.py:32-320 — a copy of the
standard eval with: probability threshold 0.5 (vs 0.8), three 2D dilations
(vs one 3D + two 2D), and an N=10 decay=0.95 embedding walk
(:138-146, :253-255). Here it is just the standard engine with those knobs.
"""

from __future__ import annotations

import numpy as np

from skoots_tpu.infer.engine import run_inference


_TUNED = {
    "prob_threshold": 0.5,
    "dilation_3d": 0,
    "dilation_2d": 3,
    "embed_iterations": 10,
    "embed_decay": 0.95,
}


def eval(image_path: str, checkpoint_path: str, **kwargs) -> np.ndarray:
    """Run the engine with the experimental knob set. A kwarg passed as
    None counts as unset (the CLI forwards auto-mode dilation knobs as
    None) so the tuned value still applies."""
    for k, v in _TUNED.items():
        if kwargs.get(k) is None:
            kwargs[k] = v
    return run_inference(image_path, checkpoint_path, **kwargs)
