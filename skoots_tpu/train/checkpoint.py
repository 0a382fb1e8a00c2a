"""Single-artifact checkpoints carrying params + cfg + dataset stats.

The reference checkpoint contract is one ``torch.save`` dict with keys
'cfg', 'model_state_dict', 'optimizer_state_dict', 'dataset_mean',
'dataset_std' (observed at /root/reference/skoots/lib/eval.py:51-88,
train/engine.py:288-295). We keep the same single-file, cfg-embedded
contract (inference reconstructs the exact model from the file alone) with
msgpack serialization of the JAX pytrees. Extension: ``.skoots``.

A converter for PyTorch ``.trch`` files lives in
``skoots_tpu.utils.torch_compat``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from skoots_tpu.config import CfgNode, cfg_from_dict

MAGIC = b"SKOOTSTPU1"


def _msgpackable(obj):
    """Recursively convert tuples -> lists (msgpack has no tuple type)."""
    if isinstance(obj, dict):
        return {k: _msgpackable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_msgpackable(v) for v in obj]
    return obj


def save_checkpoint(
    path: str,
    cfg: CfgNode,
    params: Any,
    opt_state: Any = None,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    state = {
        "cfg": _msgpackable(cfg.to_dict()),
        "params": serialization.to_state_dict(jax.device_get(params)),
        "opt_state": (
            serialization.to_state_dict(jax.device_get(opt_state))
            if opt_state is not None
            else None
        ),
        "dataset_mean": float(np.asarray(dataset_mean)),
        "dataset_std": float(np.asarray(dataset_std)),
        "extra": _msgpackable(extra or {}),
    }
    blob = serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(blob)
    os.replace(tmp, path)  # atomic: a crash never truncates the checkpoint


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint dict: {'cfg': CfgNode, 'params': pytree-state-dict,
    'opt_state', 'dataset_mean', 'dataset_std', 'extra'}."""
    with open(path, "rb") as f:
        head = f.read(len(MAGIC))
        if head != MAGIC:
            raise RuntimeError(
                f"{path} is not a skoots-tpu checkpoint (bad magic {head!r}); "
                "PyTorch .trch files need skoots_tpu.utils.torch_compat.convert"
            )
        state = serialization.msgpack_restore(f.read())
    state["cfg"] = cfg_from_dict(state["cfg"])
    return state


def restore_params(template_params: Any, state_dict: Any) -> Any:
    """Bind a loaded params state-dict back onto a freshly-initialized
    template (shape/dtype checked by flax)."""
    return serialization.from_state_dict(template_params, state_dict)
