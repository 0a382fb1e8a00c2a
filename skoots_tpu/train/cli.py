"""``skoots-train`` console entry point.

Reference /root/reference/skoots/train/__main__.py:37-113: loads/merges the
YAML config, optionally batch-runs a folder of configs (-b), builds the
model, and launches training. The reference spawns one process per GPU
(mp.spawn); on TPU a single process drives the whole ('data','space') mesh.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys

log = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="skoots-train", description=__doc__)
    p.add_argument("--config-file", type=str, help="YAML config (reference schema)")
    p.add_argument(
        "-b", "--batch", action="store_true",
        help="treat --config-file as a directory and run every *.yaml in it",
    )
    p.add_argument("--log", type=int, default=2)
    p.add_argument(
        "--steps-per-epoch", type=int, default=None,
        help="override steps per epoch (default: dataset length / batch size)",
    )
    return p


def run_config(cfg_path: str, steps_per_epoch=None) -> None:
    import jax

    from skoots_tpu.config import load_cfg_from_file
    from skoots_tpu.parallel import batch_sharding, make_mesh
    from skoots_tpu.train.data import MultiDataset, SkootsDataset, batch_iterator
    from skoots_tpu.train.engine import train
    from skoots_tpu.train.transforms import make_batch_augment

    cfg = load_cfg_from_file(cfg_path, freeze=False)

    if cfg.EXPERIMENTAL.IS_SPARSE:
        from skoots_tpu.experimental.sparse_engine import train_sparse

        return train_sparse(cfg, steps_per_epoch=steps_per_epoch)

    datasets = [
        SkootsDataset(d, cfg, sample_per_image=s)
        for d, s in zip(cfg.TRAIN.TRAIN_DATA_DIR, cfg.TRAIN.TRAIN_SAMPLE_PER_IMAGE)
    ]
    for d, s in zip(cfg.TRAIN.BACKGROUND_DATA_DIR, cfg.TRAIN.BACKGROUND_SAMPLE_PER_IMAGE):
        datasets.append(SkootsDataset(d, cfg, sample_per_image=s, background=True))
    dataset = MultiDataset(datasets)
    # reference computes combined stats over raw AND inverted images
    # (engine.py:188 mean(with_invert=True)) because the invert augmentation
    # doubles the intensity distribution; with inversion disabled, raw stats
    # normalize better
    invert_rate = cfg.AUGMENTATION.get("INVERT_RATE",
                                       cfg.AUGMENTATION.BRIGHTNESS_RATE)
    mean, std = dataset.mean_std(with_invert=invert_rate > 0)
    ceiling = dataset.intensity_ceiling()
    # scale estimate of the objects (median EDT at GT-skeleton points) —
    # persisted in the checkpoint so downstream tooling can derive
    # data-regime knobs (infer/autoknobs.py)
    radius = dataset.object_radius()
    log.info("dataset: %d samples/epoch, mean=%.3f std=%.3f ceil=%d "
             "object_radius=%s",
             len(dataset), mean, std, ceiling,
             "n/a" if radius is None else f"{radius:.1f}vox")

    val_sets = [
        SkootsDataset(d, cfg, sample_per_image=s)
        for d, s in zip(
            cfg.TRAIN.VALIDATION_DATA_DIR, cfg.TRAIN.VALIDATION_SAMPLE_PER_IMAGE
        )
    ]

    bsz = cfg.TRAIN.TRAIN_BATCH_SIZE
    steps = steps_per_epoch or max(1, len(dataset) // bsz)
    host_iter = batch_iterator(dataset, bsz, steps, cfg.TRAIN.SEED)
    augment = make_batch_augment(cfg, mean, std, intensity_ceiling=ceiling)

    import math

    n_dev = len(jax.devices())
    space = cfg.SYSTEM.MESH_SPACE
    if cfg.SYSTEM.MESH_DATA != -1:
        data_axis = cfg.SYSTEM.MESH_DATA
    else:
        # data axis must divide the global batch; use as many devices as fit
        data_axis = math.gcd(bsz, max(n_dev // space, 1))
    mesh = (
        make_mesh(
            data=data_axis, space=space,
            devices=jax.devices()[: data_axis * space],
        )
        if data_axis * space > 1
        else None
    )
    if mesh is not None:
        log.info("mesh: %s over %d devices", dict(mesh.shape), data_axis * space)

    from skoots_tpu.train.data import prefetch_iterator

    host_iter = prefetch_iterator(host_iter)

    def data_iter(epoch: int):
        rng = jax.random.PRNGKey(cfg.TRAIN.SEED + epoch)
        for i, host_batch in enumerate(host_iter(epoch)):
            rng, sub = jax.random.split(rng)
            batch = augment(sub, {k: jax.numpy.asarray(v) for k, v in host_batch.items()})
            if mesh is not None:
                batch = {
                    k: jax.device_put(v, batch_sharding(mesh, v.ndim))
                    for k, v in batch.items()
                }
            yield batch

    val_data_iter = None
    if val_sets:
        val_multi = MultiDataset(val_sets)
        val_host = batch_iterator(
            val_multi, cfg.TRAIN.VALIDATION_BATCH_SIZE,
            max(1, len(val_multi) // cfg.TRAIN.VALIDATION_BATCH_SIZE),
            cfg.TRAIN.SEED + 999,
        )

        def val_data_iter(epoch: int):
            rng = jax.random.PRNGKey(cfg.TRAIN.SEED + 31 * epoch)
            for host_batch in val_host(epoch):
                rng, sub = jax.random.split(rng)
                yield augment(sub, {k: jax.numpy.asarray(v) for k, v in host_batch.items()})

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter()
    except Exception:
        log.warning("tensorboard unavailable; scalar logging to stdout only")

    crop = (cfg.AUGMENTATION.CROP_WIDTH, cfg.AUGMENTATION.CROP_HEIGHT,
            cfg.AUGMENTATION.CROP_DEPTH)
    train(
        cfg, data_iter, val_data_iter, dataset_mean=mean, dataset_std=std,
        writer=writer, mesh=mesh, init_spatial=crop, object_radius=radius,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=[logging.ERROR, logging.WARNING, logging.INFO, logging.DEBUG][
            min(args.log, 3)
        ],
        format="[%(asctime)s] skoots-train [%(levelname)s]: %(message)s",
    )
    if not args.config_file:
        print("usage: skoots-train --config-file cfg.yaml [-b]", file=sys.stderr)
        return 2
    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if args.batch:
        configs = sorted(glob.glob(os.path.join(args.config_file, "*.yaml")))
        if not configs:
            raise FileNotFoundError(f"no *.yaml under {args.config_file}")
    else:
        configs = [args.config_file]
    for c in configs:
        log.info("training with %s", c)
        run_config(c, steps_per_epoch=args.steps_per_epoch)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
