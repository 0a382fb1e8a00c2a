"""Configuration system for skoots-tpu.

Schema-compatible with the reference SKOOTS yacs config
(/root/reference/skoots/config.py:9-155): the same section / key names are
accepted from YAML files, so existing SKOOTS config files drive this framework
unchanged. Implemented as a small self-contained attribute-dict ("CfgNode")
rather than a yacs dependency.

TPU-specific additions live under ``SYSTEM`` (mesh axes) and are defaulted so
reference configs remain valid.
"""

from __future__ import annotations

import copy
import warnings
from typing import Any, Dict

import yaml


class CfgNode(dict):
    """Attribute-accessible dict with freeze/merge semantics (yacs-like)."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        super().__init__()
        self.__dict__[CfgNode.IMMUTABLE] = False
        init_dict = init_dict or {}
        for k, v in init_dict.items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"CfgNode has no attribute {name!r}")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(CfgNode.IMMUTABLE, False):
            raise AttributeError(f"CfgNode is frozen; cannot set {name!r}")
        self[name] = value

    def freeze(self) -> "CfgNode":
        self.__dict__[CfgNode.IMMUTABLE] = True
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()
        return self

    def defrost(self) -> "CfgNode":
        self.__dict__[CfgNode.IMMUTABLE] = False
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()
        return self

    def is_frozen(self) -> bool:
        return self.__dict__.get(CfgNode.IMMUTABLE, False)

    def clone(self) -> "CfgNode":
        return CfgNode(self.to_dict())

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return out

    def merge_from_dict(self, other: Dict[str, Any], _path: str = "") -> "CfgNode":
        if self.is_frozen():
            raise AttributeError("cannot merge into a frozen CfgNode")
        for k, v in other.items():
            full = f"{_path}.{k}" if _path else k
            if k not in self:
                raise KeyError(f"Unknown config key: {full}")
            if isinstance(self[k], CfgNode):
                if not isinstance(v, dict):
                    raise TypeError(f"Config key {full} expects a section, got {type(v)}")
                self[k].merge_from_dict(v, full)
            else:
                self[k] = _coerce(v, self[k], full)
        return self

    def merge_from_file(self, path: str) -> "CfgNode":
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return self.merge_from_dict(data)

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def __repr__(self) -> str:  # pragma: no cover
        return f"CfgNode({dict.__repr__(self)})"


def _coerce(value: Any, template: Any, key: str) -> Any:
    """Light type coercion on merge (tuples<->lists, int->float)."""
    if isinstance(template, tuple) and isinstance(value, list):
        return tuple(value)
    if isinstance(template, float) and isinstance(value, int):
        return float(value)
    return value


def _default_cfg() -> CfgNode:
    c = CfgNode()

    # ------------------------------------------------------------- SYSTEM
    c.SYSTEM = CfgNode()
    c.SYSTEM.NUM_GPUS = 1           # kept for reference-config compat; unused on TPU
    c.SYSTEM.NUM_CPUS = 1
    # TPU-native: logical device mesh. ('data',) axis for DP; 'space' axis shards
    # the spatial tile grid at inference. -1 means "all local devices".
    c.SYSTEM.MESH_DATA = -1
    c.SYSTEM.MESH_SPACE = 1

    # -------------------------------------------------------------- MODEL
    # Mirrors reference cfg.MODEL (/root/reference/skoots/config.py:20-34).
    c.MODEL = CfgNode()
    c.MODEL.ARCHITECTURE = "bism_unext"   # accepted aliases: unext, bism_unet, unet
    c.MODEL.IN_CHANNELS = 1
    c.MODEL.OUT_CHANNELS = 32
    c.MODEL.DIMS = [32, 64, 128, 64, 32]
    c.MODEL.DEPTHS = [2, 2, 2, 2, 2]
    c.MODEL.KERNEL_SIZE = 7
    c.MODEL.DROP_PATH_RATE = 0.0
    c.MODEL.LAYER_SCALE_INIT_VALUE = 1.0
    c.MODEL.ACTIVATION = "gelu"
    c.MODEL.BLOCK = "block3d"
    c.MODEL.CONCAT_BLOCK = "concatconv3d"
    c.MODEL.UPSAMPLE_BLOCK = "upsamplelayer3d"
    c.MODEL.NORMALIZATION = "layernorm"
    c.MODEL.COMPILE = True                # jit is free on TPU; default on
    c.MODEL.DTYPE = "bfloat16"            # compute dtype for the backbone
    c.MODEL.DWCONV_IMPL = "auto"          # 'auto'|'pallas'|'xla' depthwise conv

    # -------------------------------------------------------------- TRAIN
    # Mirrors reference cfg.TRAIN (/root/reference/skoots/config.py:37-116).
    c.TRAIN = CfgNode()
    c.TRAIN.TARGET = "skoots"
    c.TRAIN.DISTRIBUTED = True
    c.TRAIN.PRETRAINED_MODEL_PATH = []
    c.TRAIN.LOAD_PRETRAINED_OPTIMIZER = False
    c.TRAIN.TRANSFORM_DEVICE = "default"
    c.TRAIN.DATALOADER_OUTPUT_DEVICE = "default"
    c.TRAIN.DATALOADER_NUM_WORKERS = 0
    c.TRAIN.DATALOADER_PREFETCH_FACTOR = 2

    c.TRAIN.LOSS_EMBED = "tversky"
    c.TRAIN.LOSS_EMBED_KEYWORDS = ["alpha", "beta", "eps"]
    c.TRAIN.LOSS_EMBED_VALUES = [0.25, 0.75, 1e-8]
    c.TRAIN.LOSS_PROBABILITY = "tversky"
    c.TRAIN.LOSS_PROBABILITY_KEYWORDS = ["alpha", "beta", "eps"]
    c.TRAIN.LOSS_PROBABILITY_VALUES = [0.5, 0.5, 1e-8]
    c.TRAIN.LOSS_SKELETON = "tversky"
    c.TRAIN.LOSS_SKELETON_KEYWORDS = ["alpha", "beta", "eps"]
    c.TRAIN.LOSS_SKELETON_VALUES = [0.5, 1.5, 1e-8]

    c.TRAIN.LOSS_EMBED_RELATIVE_WEIGHT = 1.0
    c.TRAIN.LOSS_PROBABILITY_RELATIVE_WEIGHT = 1.0
    c.TRAIN.LOSS_SKELETON_RELATIVE_WEIGHT = 1.0
    c.TRAIN.LOSS_EMBED_START_EPOCH = -1
    c.TRAIN.LOSS_PROBABILITY_START_EPOCH = -1
    c.TRAIN.LOSS_SKELETON_START_EPOCH = 10

    c.TRAIN.TRAIN_DATA_DIR = []
    c.TRAIN.TRAIN_SAMPLE_PER_IMAGE = []
    c.TRAIN.TRAIN_BATCH_SIZE = 1
    c.TRAIN.VALIDATION_DATA_DIR = []
    c.TRAIN.VALIDATION_SAMPLE_PER_IMAGE = []
    c.TRAIN.VALIDATION_BATCH_SIZE = 1
    c.TRAIN.BACKGROUND_DATA_DIR = []
    c.TRAIN.BACKGROUND_SAMPLE_PER_IMAGE = []
    # 'zeros' (skoots-tpu default: background teaches semantic->0) or 'ones'
    # (reference BackgroundTransformFromCfg parity, merged_transform.py:1111)
    c.TRAIN.BACKGROUND_MASK_MODE = "zeros"
    c.TRAIN.TRAIN_STORE_DATA_ON_GPU = []      # on TPU: keep resident in HBM
    c.TRAIN.VALIDATION_STORE_DATA_ON_GPU = []
    c.TRAIN.BACKGROUND_STORE_DATA_ON_GPU = []
    c.TRAIN.STORE_DATA_ON_GPU = []

    c.TRAIN.INITIAL_SIGMA = [20.0, 20.0, 20.0]
    c.TRAIN.SIGMA_DECAY = [
        [0.66, 200],
        [0.66, 800],
        [0.66, 1500],
        [0.5, 20000],
        [0.5, 20000],
    ]
    c.TRAIN.NUM_EPOCHS = 10000
    c.TRAIN.LEARNING_RATE = 5e-4
    c.TRAIN.WEIGHT_DECAY = 1e-6
    c.TRAIN.OPTIMIZER = "adamw"
    c.TRAIN.OPTIMIZER_KEYWORD_ARGUMENTS = []
    c.TRAIN.OPTIMIZER_KEYWORD_VALUES = []
    c.TRAIN.OPTIMIZER_EPS = 1e-8
    c.TRAIN.SCHEDULER = "cosine_annealing_warm_restarts"
    c.TRAIN.SCHEDULER_T0 = 10000 + 1
    c.TRAIN.MIXED_PRECISION = True
    c.TRAIN.N_WARMUP = 3      # XLA-compile warmup steps; inductor needed 1500
    c.TRAIN.SAVE_PATH = "./models"
    c.TRAIN.SKELETON_MASK_RADIUS = 9
    c.TRAIN.SKELETON_MASK_FLANK_RADIUS = 3
    c.TRAIN.SAVE_INTERVAL = 100
    c.TRAIN.VALIDATE_EPOCH_SKIP = 10
    c.TRAIN.CUDNN_BENCHMARK = True        # no-op on TPU; accepted for compat
    c.TRAIN.AUTOGRAD_PROFILE = False      # maps to jax.profiler trace
    c.TRAIN.AUTOGRAD_EMIT_NVTX = False    # no-op on TPU
    c.TRAIN.AUTOGRAD_DETECT_ANOMALY = False  # maps to jax checkify/debug_nans
    c.TRAIN.SEED = 101196                 # reference fixed seed (engine.py:53)
    # Per-crop static padding budgets (JAX needs static shapes):
    c.TRAIN.MAX_INSTANCES_PER_CROP = 32
    c.TRAIN.MAX_SKELETON_POINTS = 512

    # -------------------------------------------------------- AUGMENTATION
    c.AUGMENTATION = CfgNode()
    c.AUGMENTATION.CROP_WIDTH = 300
    c.AUGMENTATION.CROP_HEIGHT = 300
    c.AUGMENTATION.CROP_DEPTH = 20
    c.AUGMENTATION.FLIP_RATE = 0.5
    c.AUGMENTATION.BRIGHTNESS_RATE = 0.4
    c.AUGMENTATION.BRIGHTNESS_RANGE = [-0.1, 0.1]
    c.AUGMENTATION.NOISE_GAMMA = 0.1
    c.AUGMENTATION.NOISE_RATE = 0.2
    c.AUGMENTATION.CONTRAST_RATE = 0.33
    c.AUGMENTATION.CONTRAST_RANGE = [0.75, 2.0]
    c.AUGMENTATION.AFFINE_RATE = 0.66
    c.AUGMENTATION.AFFINE_SCALE = [0.85, 1.1]
    c.AUGMENTATION.AFFINE_YAW = [-180, 180]
    c.AUGMENTATION.AFFINE_SHEAR = [-7, 7]
    c.AUGMENTATION.SMOOTH_SKELETON_KERNEL_SIZE = (3, 3, 1)
    c.AUGMENTATION.BAKE_SKELETON_ANISOTROPY = (1.0, 1.0, 3.0)
    c.AUGMENTATION.N_SKELETON_MASK_DILATE = 1
    c.AUGMENTATION.ELASTIC_GRID_SHAPE = (6, 6, 2)
    c.AUGMENTATION.ELASTIC_GRID_MAGNITUDE = (0.05, 0.05, 0.01)
    c.AUGMENTATION.ELASTIC_RATE = 0.33
    c.AUGMENTATION.INVERT_RATE = 0.4      # reference reuses BRIGHTNESS_RATE

    # -------------------------------------------------------------- SKOOTS
    c.SKOOTS = CfgNode()
    c.SKOOTS.VECTOR_SCALING = (60, 60, 60 // 5)
    c.SKOOTS.ANISOTROPY = (1.0, 1.0, 3.0)
    c.SKOOTS.NOTES = ""

    # -------------------------------------------------------- EXPERIMENTAL
    c.EXPERIMENTAL = CfgNode()
    c.EXPERIMENTAL.DIST_THR = 10.0
    c.EXPERIMENTAL.IS_SPARSE = False
    c.EXPERIMENTAL.SPARSE_BACKGROUND_PENALTY_MULTIPLIER = 10
    c.EXPERIMENTAL.BACKGROUND_N_ERODE = 0.0
    c.EXPERIMENTAL.BACKGROUND_SLICE_PERCENTAGE = 1.0

    return c


_C = _default_cfg()


def get_cfg_defaults() -> CfgNode:
    """Return a fresh clone of the default config tree."""
    return _C.clone()


# ------------------------------------------------------------------ validation
# Mirrors reference validators (/root/reference/skoots/config.py:157-219).

_VALID_ARCHITECTURES = ("bism_unext", "unext", "bism_unet", "unet")


def _validate_model(cfg: CfgNode) -> None:
    cm = cfg.MODEL
    assert cm.ARCHITECTURE in _VALID_ARCHITECTURES, (
        f"unsupported MODEL.ARCHITECTURE {cm.ARCHITECTURE!r}; valid: {_VALID_ARCHITECTURES}"
    )
    assert cm.IN_CHANNELS == 1, f"only greyscale input supported; {cm.IN_CHANNELS=} != 1"
    assert cm.OUT_CHANNELS == cm.DIMS[-1], f"{cm.OUT_CHANNELS=} != DIMS[-1]={cm.DIMS[-1]}"
    assert len(cm.DIMS) == len(cm.DEPTHS), "MODEL.DIMS and MODEL.DEPTHS length mismatch"
    assert len(cm.DIMS) % 2 == 1, "MODEL.DIMS must describe a symmetric U (odd length)"
    assert cm.KERNEL_SIZE >= 3 and cm.KERNEL_SIZE % 2 == 1, "kernel size must be odd and >=3"
    if cm.KERNEL_SIZE >= 9:
        warnings.warn("kernel size >= 9 is unusually large")
    for val in (cm.BLOCK, cm.CONCAT_BLOCK, cm.UPSAMPLE_BLOCK):
        assert "3d" in val, f"model part must be 3d, not {val!r}"


def _validate_training(cfg: CfgNode) -> None:
    ct = cfg.TRAIN
    assert ct.TARGET == "skoots", 'cfg.TRAIN.TARGET must be "skoots"'
    assert len(ct.LOSS_EMBED_KEYWORDS) == len(ct.LOSS_EMBED_VALUES)
    assert len(ct.LOSS_PROBABILITY_KEYWORDS) == len(ct.LOSS_PROBABILITY_VALUES)
    assert len(ct.LOSS_SKELETON_KEYWORDS) == len(ct.LOSS_SKELETON_VALUES)
    assert ct.LOSS_EMBED_RELATIVE_WEIGHT >= 0
    assert ct.LOSS_PROBABILITY_RELATIVE_WEIGHT >= 0
    assert ct.LOSS_SKELETON_RELATIVE_WEIGHT >= 0
    assert len(ct.TRAIN_DATA_DIR) == len(ct.TRAIN_SAMPLE_PER_IMAGE), (
        "each TRAIN_DATA_DIR needs a TRAIN_SAMPLE_PER_IMAGE entry"
    )
    assert len(ct.VALIDATION_DATA_DIR) == len(ct.VALIDATION_SAMPLE_PER_IMAGE)
    assert ct.TRAIN_BATCH_SIZE >= 1 and ct.VALIDATION_BATCH_SIZE >= 1
    assert len(ct.OPTIMIZER_KEYWORD_ARGUMENTS) == len(ct.OPTIMIZER_KEYWORD_VALUES)
    assert ct.VALIDATE_EPOCH_SKIP >= 1, "cannot skip negative numbers"


def _validate_skoots(cfg: CfgNode) -> None:
    x, y, _ = cfg.SKOOTS.VECTOR_SCALING
    if x < 5 or y < 5:
        warnings.warn("SKOOTS.VECTOR_SCALING below a reasonable value (default (60,60,12))")
    x, y, z = cfg.SKOOTS.ANISOTROPY
    if not any(v == 1 for v in (x, y, z)):
        warnings.warn("SKOOTS.ANISOTROPY should be relative (default (1,1,3))")


def validate_cfg(cfg: CfgNode) -> None:
    _validate_model(cfg)
    _validate_skoots(cfg)
    _validate_training(cfg)


def load_cfg_from_file(path: str, freeze: bool = True) -> CfgNode:
    cfg = get_cfg_defaults()
    cfg.merge_from_file(path)
    validate_cfg(cfg)
    if freeze:
        cfg.freeze()
    return cfg


def cfg_from_dict(d: Dict[str, Any], strict: bool = False) -> CfgNode:
    """Rebuild a cfg from a checkpoint-embedded dict (unknown keys tolerated
    unless strict): checkpoints written by older/newer versions still load."""
    cfg = get_cfg_defaults()
    if strict:
        cfg.merge_from_dict(d)
    else:
        _merge_lenient(cfg, d)
    return cfg


def _merge_lenient(node: CfgNode, d: Dict[str, Any]) -> None:
    for k, v in d.items():
        if k not in node:
            node[k] = CfgNode(v) if isinstance(v, dict) else v
        elif isinstance(node[k], CfgNode) and isinstance(v, dict):
            _merge_lenient(node[k], v)
        else:
            node[k] = _coerce(v, node[k], k)
