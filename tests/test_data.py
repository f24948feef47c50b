"""Dataset pipeline tests: LOL / LOL-v2 layouts, RIDCP val split modes,
log transform, histeq concat, loader semantics."""

import os

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def lol_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lol")
    rng = np.random.RandomState(0)
    for split, n in [("our485", 3), ("eval15", 2)]:
        for sub in ("low", "high"):
            os.makedirs(root / split / sub, exist_ok=True)
        for i in range(n):
            img = rng.randint(0, 255, (400, 600, 3), np.uint8)
            cv2.imwrite(str(root / split / "low" / f"{i}.png"), (img * 0.1).astype(np.uint8))
            cv2.imwrite(str(root / split / "high" / f"{i}.png"), img)
    return str(root)


@pytest.fixture(scope="module")
def lolv2_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lolv2")
    rng = np.random.RandomState(1)
    for sub_data in ("Synthetic", "Real_captured"):
        for phase, (low, high) in [("Train", ("Low", "Normal")), ("Test", ("low", "high"))]:
            for d in (low, high):
                os.makedirs(root / sub_data / phase / d, exist_ok=True)
            for i in range(2):
                img = rng.randint(0, 255, (64, 80, 3), np.uint8)
                cv2.imwrite(str(root / sub_data / phase / low / f"{i}.png"),
                            (img * 0.15).astype(np.uint8))
                cv2.imwrite(str(root / sub_data / phase / high / f"{i}.png"), img)
    return str(root)


class TestLoLDatasetRIDCP:
    def test_train_pipeline_shapes_and_log(self, lol_root):
        from glare_tpu.data import create_dataset

        opt = {"root": lol_root, "GT_size": 64, "use_resize_crop": True,
               "use_flip": True, "use_rot": False, "log_low": True, "phase": "train"}
        ds = create_dataset(opt, train=True, all_opt={"dataset": "LoL"})
        s = ds[0]
        assert s["LQ"].shape == (64, 64, 3)
        assert s["GT"].shape == (64, 64, 3)
        assert s["LQ"].min() >= np.log(1e-3) - 1e-5  # log domain
        # GT stays near [0,1] but cubic resize may overshoot slightly —
        # the reference has the same behavior (no clip after random_resize)
        assert -0.5 < s["GT"].min() and s["GT"].max() < 1.5

    def test_val_split_modes(self, lol_root):
        from glare_tpu.data import create_dataset

        for split, keys in [(0, {"LQ", "GT"}), (1, {"tiles", "LQ", "GT", "name"}),
                            (2, {"LQ_left", "LQ_right", "name", "GT"})]:
            opt = {"root": lol_root, "GT_size": 64, "split": split,
                   "log_low": False, "phase": "val"}
            ds = create_dataset(opt, train=False, all_opt={"dataset": "LoL"})
            s = ds[0]
            assert keys <= set(s.keys()), (split, s.keys())
            if split == 1:
                assert s["tiles"]["up_left"].shape == (256, 256, 3)
                assert len(s["tiles"]) == 6

    def test_histeq_concat_channels(self, lol_root):
        from glare_tpu.data import create_dataset

        opt = {"root": lol_root, "GT_size": 64, "use_resize_crop": True,
               "use_flip": False, "log_low": True, "phase": "train"}
        ds = create_dataset(opt, train=True,
                            all_opt={"dataset": "LoL", "concat_histeq": True})
        s = ds[0]
        assert s["LQ"].shape[-1] == 6  # low-light log + histeq channels


class TestLoLv2Dataset:
    def test_layout_and_both_subsets(self, lolv2_root):
        from glare_tpu.data import create_dataset

        opt = {"root": lolv2_root, "GT_size": 32, "use_crop": True,
               "use_flip": True, "log_low": True, "gamma_aug": True, "phase": "train"}
        ds = create_dataset(opt, train=True, all_opt={"dataset": "LoL_v2"})
        assert len(ds) == 4  # 2 Synthetic + 2 Real_captured
        s = ds[0]
        assert s["LQ"].shape == (32, 32, 3)

    def test_test_split(self, lolv2_root):
        from glare_tpu.data import create_dataset

        opt = {"root": lolv2_root, "log_low": False, "phase": "val"}
        ds = create_dataset(opt, train=False, all_opt={"dataset": "LoL_v2"})
        assert len(ds) == 4
        s = ds[0]
        assert s["GT"].shape == (64, 80, 3)


class TestLoader:
    def test_drop_last_and_shuffle_determinism(self, lol_root):
        from glare_tpu.data import create_dataloader, create_dataset

        opt = {"root": lol_root, "GT_size": 32, "use_resize_crop": True,
               "use_flip": False, "log_low": False, "phase": "train",
               "batch_size": 2}
        ds = create_dataset(opt, train=True, all_opt={"dataset": "LoL"})
        loader = create_dataloader(True, ds, opt, seed=7)
        batches = list(loader)
        assert len(batches) == 1  # 3 samples, batch 2, drop_last
        assert batches[0]["LQ"].shape == (2, 32, 32, 3)

    def test_prefetch_loader_yields_all(self, lol_root):
        from glare_tpu.data import create_dataloader, create_dataset
        from glare_tpu.data.loader import PrefetchDataLoader

        opt = {"root": lol_root, "GT_size": 32, "use_resize_crop": True,
               "log_low": False, "phase": "val", "split": 0}
        ds = create_dataset(opt, train=False, all_opt={"dataset": "LoL"})
        loader = PrefetchDataLoader(create_dataloader(False, ds, opt))
        assert len(list(loader)) == 2
