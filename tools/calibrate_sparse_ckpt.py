"""Retrofit semantic-threshold calibration onto an existing sparse checkpoint.

New sparse training runs self-calibrate at save time
(sparse_engine.make_threshold_calibrator); this tool applies the same
procedure to a checkpoint trained before the mechanism existed, writing the
result into the checkpoint's ``extra.calibrated_prob_threshold`` so
``run_inference`` adopts it automatically.

Usage: python tools/calibrate_sparse_ckpt.py CKPT TRAIN_DIR
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ckpt_path, train_dir = sys.argv[1], sys.argv[2]

    from skoots_tpu.experimental.data import SparseDataset
    from skoots_tpu.experimental.sparse_engine import make_threshold_calibrator
    from skoots_tpu.models import cfg_to_model
    from skoots_tpu.train.checkpoint import (
        load_checkpoint,
        restore_params,
        save_checkpoint,
    )
    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    ck = load_checkpoint(ckpt_path)
    cfg = ck["cfg"]
    model = cfg_to_model(cfg)
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 16, 16, 16, 1), jnp.float32),
            deterministic=True,
        )
    )
    params = restore_params(template, ck["params"])
    dataset = SparseDataset(train_dir, cfg, sample_per_image=8)
    calibrate = make_threshold_calibrator(
        model, cfg, dataset, ck["dataset_mean"], ck["dataset_std"]
    )
    thr = calibrate(params)
    print(f"calibrated semantic threshold: {thr}")
    if thr is None:
        return 1
    extra = dict(ck.get("extra") or {})
    extra["calibrated_prob_threshold"] = float(thr)
    save_checkpoint(
        ckpt_path, cfg, params, ck.get("opt_state"),
        dataset_mean=ck["dataset_mean"], dataset_std=ck["dataset_std"],
        extra=extra,
    )
    print(f"updated {ckpt_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
