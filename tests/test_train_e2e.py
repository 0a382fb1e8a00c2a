"""End-to-end skoots-train: synthetic dataset -> CLI -> checkpoint."""

import glob
import os

import numpy as np
import pytest
import yaml

from skoots_tpu.train.generate_skeletons import save_skeletons
from skoots_tpu.utils.io import imsave
from skoots_tpu.utils.synthetic import make_tubes


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("train_data")
    for i in range(2):
        image, labels, skels = make_tubes(shape=(64, 64, 8), n_tubes=2, seed=i)
        imsave(str(d / f"vol{i}.tif"), image)
        imsave(str(d / f"vol{i}.labels.tif"), labels)
        save_skeletons(str(d / f"vol{i}.skeletons.npz"), skels)
    return str(d)


@pytest.fixture(scope="module")
def cfg_yaml(dataset_dir, tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("models"))
    cfg = {
        "MODEL": {
            "DIMS": [4, 8, 16, 8, 4],
            "DEPTHS": [1, 1, 1, 1, 1],
            "OUT_CHANNELS": 4,
            "KERNEL_SIZE": 3,
        },
        "TRAIN": {
            "TRAIN_DATA_DIR": [dataset_dir],
            "TRAIN_SAMPLE_PER_IMAGE": [2],
            "TRAIN_STORE_DATA_ON_GPU": [False],
            "NUM_EPOCHS": 2,
            "SAVE_INTERVAL": 2,
            "SAVE_PATH": save_dir,
            "MAX_SKELETON_POINTS": 128,
            "VALIDATE_EPOCH_SKIP": 10,
            "LOSS_SKELETON_START_EPOCH": -1,
        },
        "AUGMENTATION": {
            "CROP_WIDTH": 32,
            "CROP_HEIGHT": 32,
            "CROP_DEPTH": 8,
        },
        "SKOOTS": {"VECTOR_SCALING": [8, 8, 4]},
    }
    p = tmp_path_factory.mktemp("cfg") / "test.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p), save_dir


class TestTrainCLI:
    def test_train_and_checkpoint(self, cfg_yaml):
        from skoots_tpu.train.cli import main

        cfg_path, save_dir = cfg_yaml
        rc = main(["--config-file", cfg_path, "--steps-per-epoch", "2", "--log", "1"])
        assert rc == 0
        ckpts = glob.glob(os.path.join(save_dir, "*.skoots"))
        assert len(ckpts) == 1

        # the checkpoint must be loadable by the INFERENCE path (cfg embedded)
        from skoots_tpu.train.checkpoint import load_checkpoint

        state = load_checkpoint(ckpts[0])
        assert state["cfg"].MODEL.DIMS == [4, 8, 16, 8, 4]
        assert state["extra"]["epoch"] == 1
        assert state["dataset_std"] > 0

    def test_inference_on_trained_checkpoint(self, cfg_yaml, dataset_dir):
        from skoots_tpu.infer import run_inference

        _, save_dir = cfg_yaml
        ckpt = glob.glob(os.path.join(save_dir, "*.skoots"))[0]
        img = sorted(glob.glob(os.path.join(dataset_dir, "vol0.tif")))[0]
        mask = run_inference(
            img, ckpt, crop_size=(32, 32, 8), overlap=(4, 4, 0),
            assign_crop_size=(32, 32, 8), assign_overlap=(4, 4, 0),
            embed_iterations=2,
        )
        assert mask.shape == (64, 64, 8)

    def test_missing_config(self):
        from skoots_tpu.train.cli import main

        assert main([]) == 2
