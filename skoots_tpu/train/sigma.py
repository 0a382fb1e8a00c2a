"""Annealed Gaussian bandwidth for the embedding loss.

Reference /root/reference/skoots/train/sigma.py:10-60: sigma at epoch e is
the initial sigma times the product of all multipliers whose epoch < e.
Implemented as a pure function of the epoch so it can live inside a jitted
train step (epoch passed as a traced scalar).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from skoots_tpu.config import CfgNode


class Sigma:
    def __init__(
        self,
        adjustments: List[dict],
        initial_sigma: Sequence[float] = (0.1, 0.1, 0.8),
    ):
        self.initial_sigma = jnp.asarray(initial_sigma, jnp.float32)
        values = [1.0] + [float(d["multiplier"]) for d in adjustments]
        epochs = [-1] + [int(d["epoch"]) for d in adjustments]
        self.values = jnp.asarray(values, jnp.float32)
        self.epochs = jnp.asarray(epochs, jnp.int32)

    def __call__(self, e: int | jax.Array) -> jax.Array:
        """Sigma [x, y, z] at epoch ``e`` (works traced or concrete)."""
        mult = jnp.prod(jnp.where(self.epochs < e, self.values, 1.0))
        return self.initial_sigma * mult

    def host(self, e: int) -> "np.ndarray":
        """Concrete sigma at a host epoch, computed with numpy only.

        Train steps take sigma as a runtime input (not a traced-in
        constant) so that editing SIGMA_DECAY/NUM_EPOCHS never changes the
        compiled program — schedule constants baked into HLO were the main
        cause of full recompiles between training protocols.
        """
        import numpy as np

        epochs = np.asarray(self.epochs)
        values = np.asarray(self.values)
        mult = np.prod(np.where(epochs < e, values, 1.0))
        return (np.asarray(self.initial_sigma) * mult).astype(np.float32)


def init_sigma(cfg: CfgNode) -> Sigma:
    adjustments = [
        {"multiplier": a, "epoch": b} for a, b in cfg.TRAIN.SIGMA_DECAY
    ]
    return Sigma(adjustments, initial_sigma=cfg.TRAIN.INITIAL_SIGMA)
