"""PyTorch ``.trch`` checkpoint converter.

The reference checkpoint is a ``torch.save`` dict with keys 'cfg' (yacs),
'model_state_dict', 'optimizer_state_dict', 'dataset_mean', 'dataset_std'
(/root/reference/skoots/lib/eval.py:51-88). This converter reads it with
torch-cpu, rebuilds the cfg, and re-expresses the weights in the skoots-tpu
parameter tree.

Mapping strategy: **deterministic order alignment**. A torch ``state_dict``
iterates in module-registration order, and the bism ``SpatialEmbedding(
UNeXT_3D)`` registers modules in network order (stem -> encoder stages with
downsamples -> bottleneck -> decoder stages with skip fusions -> final norm/
head -> the three output heads) — the same order this package's flax model
is defined in. We therefore generate the flax parameter paths *in network
order* from the cfg (``ordered_flax_roles``), walk the torch tensors in
state-dict order, transpose each to flax convention, and zip the two
sequences with per-pair shape verification. Repeated same-shape blocks are
unambiguous because order disambiguates them. If the sequences disagree
(e.g. a bism variant with extra buffers), a longest-common-subsequence
alignment on shape signatures maps what it can and reports the rest.

Tensor conventions handled:
- torch Conv3d ``[O, I, kx, ky, kz]`` -> flax ``[kx, ky, kz, I, O]``
  (covers depthwise ``[C, 1, k, k, k]`` and dense convs);
- torch 1x1x1 Conv3d ``[O, I, 1, 1, 1]`` -> flax Dense ``[I, O]`` when the
  flax side is a Dense kernel (the pointwise layers);
- torch Linear ``[O, I]`` -> flax Dense ``[I, O]``;
- 1-D vectors (biases, LayerNorm weight/bias, layer-scale gamma) verbatim.
"""

from __future__ import annotations

import difflib
import logging
from typing import Any, Dict, List, Tuple

import numpy as np

from skoots_tpu.config import cfg_from_dict, get_cfg_defaults

log = logging.getLogger(__name__)

Path = Tuple[str, ...]


def ordered_flax_roles(cfg) -> List[Path]:
    """Flax parameter paths of ``SpatialEmbedding(UNeXT3D(cfg))`` in network
    (= torch registration) order. Mirrors ``models/unext.py``."""
    if cfg.MODEL.ARCHITECTURE not in ("bism_unext", "unext"):
        raise NotImplementedError(
            f"ordered mapping only implemented for unext, got "
            f"{cfg.MODEL.ARCHITECTURE!r}"
        )
    dims = list(cfg.MODEL.DIMS)
    depths = list(cfg.MODEL.DEPTHS)
    k_down = len(dims) // 2
    bb = ("params", "backbone")
    roles: List[Path] = [bb + ("stem", "kernel"), bb + ("stem", "bias")]

    def block(name: str) -> List[Path]:
        # torch state_dict order: direct parameters precede submodules, so a
        # ConvNeXt block's layer-scale gamma (a bare nn.Parameter) comes first
        p = bb + (name,)
        return [
            p + ("gamma",),
            p + ("dwconv", "kernel"), p + ("dwconv", "bias"),
            p + ("norm", "scale"), p + ("norm", "bias"),
            p + ("pw1", "kernel"), p + ("pw1", "bias"),
            p + ("pw2", "kernel"), p + ("pw2", "bias"),
        ]

    for s in range(k_down):
        for i in range(depths[s]):
            roles += block(f"enc{s}_block{i}")
        d = bb + (f"down{s}",)
        roles += [d + ("norm", "scale"), d + ("norm", "bias"),
                  d + ("conv", "kernel"), d + ("conv", "bias")]
    for i in range(depths[k_down]):
        roles += block(f"bottleneck_block{i}")
    for s in range(k_down):
        c = bb + (f"concat{s}",)
        roles += [c + ("fuse", "kernel"), c + ("fuse", "bias")]
        for i in range(depths[k_down + 1 + s]):
            roles += block(f"dec{s}_block{i}")
    roles += [bb + ("final_norm", "scale"), bb + ("final_norm", "bias"),
              bb + ("head_conv", "kernel"), bb + ("head_conv", "bias")]
    for head in ("vector_head", "skeleton_head", "semantic_head"):
        roles += [("params", head, "kernel"), ("params", head, "bias")]
    return roles


def _to_flax_convention(arr: np.ndarray, want_shape: Tuple[int, ...]) -> np.ndarray | None:
    """Re-express a torch tensor in flax convention such that it matches
    ``want_shape``; None if impossible."""
    shape = tuple(arr.shape)
    if len(shape) == 5:
        cand = np.transpose(arr, (2, 3, 4, 1, 0))  # conv kernel
        if cand.shape == tuple(want_shape):
            return cand
        if shape[2:] == (1, 1, 1) and len(want_shape) == 2:  # 1^3 conv -> Dense
            cand = arr[:, :, 0, 0, 0].T
            if cand.shape == tuple(want_shape):
                return cand
        return None
    if len(shape) == 2:
        return arr.T if arr.T.shape == tuple(want_shape) else None
    return arr if shape == tuple(want_shape) else None


def _signature(shape: Tuple[int, ...]) -> str:
    """Orientation-independent shape signature for LCS alignment. A 1^3 conv
    and a Dense/Linear of the same channel counts signature identically (the
    torch side may implement pointwise layers either way)."""
    if len(shape) == 5:
        if tuple(shape[2:]) == (1, 1, 1):  # torch 1^3 conv
            return f"mat{sorted(shape[:2])}"
        if tuple(shape[:3]) == (1, 1, 1):  # flax 1^3 conv kernel
            return f"mat{sorted(shape[3:])}"
        return f"conv{sorted(shape)}"
    if len(shape) == 2:
        return f"mat{sorted(shape)}"
    return f"vec{list(shape)}"


def map_torch_state(params, torch_state: Dict[str, np.ndarray], cfg):
    """Map torch tensors onto the flax tree by network-order alignment.

    Returns (new_params, mapped_count, unmapped_torch_keys, unfilled_paths).
    """
    import jax

    roles = ordered_flax_roles(cfg)
    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])

    def leaf_at(path: Path):
        for kp, leaf in flat.items():
            if tuple(getattr(k, "key", k) for k in kp) == path:
                return kp, leaf
        raise KeyError(path)

    # torch tensors in registration order, buffers dropped
    t_items = [
        (k, v) for k, v in torch_state.items()
        if np.issubdtype(v.dtype, np.floating)
    ]

    f_sigs = []
    role_leaves = []
    for path in roles:
        kp, leaf = leaf_at(path)
        role_leaves.append((path, kp, leaf))
        f_sigs.append(_signature(tuple(leaf.shape)))
    t_sigs = [_signature(tuple(v.shape)) for _, v in t_items]

    if f_sigs == t_sigs:
        pairs = list(zip(range(len(roles)), range(len(t_items))))
    else:  # LCS alignment on signatures
        sm = difflib.SequenceMatcher(a=f_sigs, b=t_sigs, autojunk=False)
        pairs = []
        for op, i1, i2, j1, j2 in sm.get_opcodes():
            if op == "equal":
                pairs += list(zip(range(i1, i2), range(j1, j2)))

    updates = {}
    used = set()
    for fi, ti in pairs:
        path, kp, leaf = role_leaves[fi]
        name, arr = t_items[ti]
        cand = _to_flax_convention(arr, tuple(leaf.shape))
        if cand is None:
            log.warning("shape mismatch at %s <- %s %s", "/".join(path), name,
                        arr.shape)
            continue
        updates[kp] = cand.astype(np.asarray(leaf).dtype)
        used.add(name)

    new_params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [updates.get(kp, leaf)
         for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]],
    )
    unmapped = [k for k, _ in t_items if k not in used]
    unfilled = ["/".join(p) for p, kp, _ in role_leaves if kp not in updates]
    return new_params, len(updates), unmapped, unfilled


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

    The produced checkpoint carries the translated cfg + dataset stats and
    the parameter tree with every torch tensor mapped by network-order
    alignment (see module docstring). Returns the output path.
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
    params, mapped, unmapped, unfilled = map_torch_state(params, state, cfg)
    if unmapped or unfilled:
        log.warning(
            "%d torch tensors unmapped (%s...); %d flax params left at init (%s...)",
            len(unmapped), unmapped[:5], len(unfilled), unfilled[:5],
        )
    out = output_path or path.rsplit(".", 1)[0] + ".skoots"
    save_checkpoint(
        out, cfg, params, dataset_mean=mean, dataset_std=std,
        extra={
            "converted_from": path,
            "mapped": mapped,
            "unmapped_torch_keys": sorted(unmapped),
            "unfilled_params": sorted(unfilled),
            "torch_state_dict_keys": [k for k in state],
        },
    )
    log.info("converted %s -> %s (%d/%d tensors mapped)", path, out, mapped,
             len(state))
    return out
