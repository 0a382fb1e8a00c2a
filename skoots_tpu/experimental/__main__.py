"""``python -m skoots_tpu.experimental`` — the experimental entry point.

Mirrors /root/reference/skoots/experimental/__main__.py:31-78, which loads
a YAML config and launches sparse (weakly-supervised) training. Two modes:

* ``--config-file cfg.yaml`` — sparse training. The config's
  ``EXPERIMENTAL.IS_SPARSE`` is forced on (the reference module
  unconditionally dispatches its sparse engine).
* ``--image I.tif --pretrained-checkpoint M.skoots`` — the tuned
  experimental inference knob set (reference experimental/eval.py:32-320),
  equivalent to ``skoots --experimental``.
"""

from __future__ import annotations

import argparse
import logging
import sys

log = logging.getLogger(__name__)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="skoots_tpu.experimental", description=__doc__
    )
    p.add_argument("--config-file", type=str, default=None,
                   help="YAML config for sparse training")
    p.add_argument("--image", type=str, default=None,
                   help="volume to segment with the experimental knob set")
    p.add_argument("--pretrained-checkpoint", dest="pretrained_checkpoint",
                   type=str, default=None)
    p.add_argument("--use-cached", action="store_true", dest="use_cached")
    p.add_argument("--log", type=int, default=2)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    args = p.parse_args(argv)

    logging.basicConfig(
        level=[logging.ERROR, logging.WARNING, logging.INFO, logging.DEBUG][
            min(args.log, 3)
        ],
        format="[%(asctime)s] skoots-experimental [%(levelname)s]: %(message)s",
    )
    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.config_file:
        from skoots_tpu.config import load_cfg_from_file
        from skoots_tpu.experimental.sparse_engine import train_sparse

        cfg = load_cfg_from_file(args.config_file, freeze=False)
        cfg.EXPERIMENTAL.IS_SPARSE = True
        train_sparse(cfg, steps_per_epoch=args.steps_per_epoch)
        return 0

    if args.image and args.pretrained_checkpoint:
        from skoots_tpu.experimental.eval import eval as experimental_eval

        experimental_eval(args.image, args.pretrained_checkpoint,
                          use_cached_data=args.use_cached)
        return 0

    print(
        "usage: python -m skoots_tpu.experimental --config-file cfg.yaml\n"
        "       python -m skoots_tpu.experimental --image I.tif "
        "--pretrained-checkpoint M.skoots",
        file=sys.stderr,
    )
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
