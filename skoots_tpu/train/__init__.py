from skoots_tpu.train.losses import (
    cfg_loss,
    dice,
    jaccard,
    soft_cldice,
    soft_dice_cldice,
    soft_skeletonize,
    split_loss,
    tversky,
)
from skoots_tpu.train.sigma import Sigma, init_sigma

__all__ = [
    "cfg_loss",
    "dice",
    "jaccard",
    "soft_cldice",
    "soft_dice_cldice",
    "soft_skeletonize",
    "split_loss",
    "tversky",
    "Sigma",
    "init_sigma",
]
