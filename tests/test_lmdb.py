"""lmdb data-path round trip (reference: basicsr/utils/lmdb_util.py +
basicsr/data/data_util.py lmdb modes): build `.lmdb` datasets from synthetic
pngs, read them back through FileClient/PairedImageDataset, and train one
stage-1 step from the lmdb-backed batch."""

import os

import cv2
import numpy as np
import pytest

from glare_tpu.sr.data.data_util import (
    paired_paths_from_lmdb,
    paired_paths_from_meta_info_file,
    paths_from_lmdb,
)
from glare_tpu.sr.utils.file_client import FileClient, imfrombytes
from glare_tpu.sr.utils.lmdb_util import make_lmdb_from_imgs


@pytest.fixture(scope="module")
def lmdb_pair(tmp_path_factory):
    """Synthetic paired pngs -> lq.lmdb + gt.lmdb."""
    root = tmp_path_factory.mktemp("lmdbdata")
    rng = np.random.RandomState(0)
    imgs = {}
    for sub in ["lq", "gt"]:
        os.makedirs(root / sub)
        for i in range(4):
            img = rng.randint(0, 255, (40, 48, 3), np.uint8)
            cv2.imwrite(str(root / sub / f"img_{i}.png"), img)
            imgs[(sub, f"img_{i}")] = img
    for sub in ["lq", "gt"]:
        names = sorted(os.listdir(root / sub))
        make_lmdb_from_imgs(
            str(root / sub), str(root / f"{sub}.lmdb"), names,
            [os.path.splitext(n)[0] for n in names], compress_level=1,
        )
    return root, imgs


class TestLmdbBuild:
    def test_layout(self, lmdb_pair):
        root, _ = lmdb_pair
        for sub in ["lq", "gt"]:
            d = root / f"{sub}.lmdb"
            assert (d / "meta_info.txt").exists()
            lines = open(d / "meta_info.txt").read().strip().splitlines()
            assert len(lines) == 4
            assert lines[0].split() == ["img_0.png", "(40,48,3)", "1"]

    def test_fileclient_roundtrip_bytes(self, lmdb_pair):
        root, imgs = lmdb_pair
        client = FileClient(
            "lmdb", db_paths=[str(root / "lq.lmdb")], client_keys=["lq"]
        )
        for i in range(4):
            buf = client.get(f"img_{i}", "lq")
            assert buf is not None
            got = imfrombytes(buf)
            np.testing.assert_array_equal(got, imgs[("lq", f"img_{i}")])
        assert client.get("missing", "lq") is None

    def test_existing_dir_refused(self, lmdb_pair):
        root, _ = lmdb_pair
        with pytest.raises(FileExistsError):
            make_lmdb_from_imgs(str(root / "lq"), str(root / "lq.lmdb"), ["img_0.png"], ["img_0"])


class TestPathCollection:
    def test_paired_paths_from_lmdb(self, lmdb_pair):
        root, _ = lmdb_pair
        paths = paired_paths_from_lmdb(
            [str(root / "lq.lmdb"), str(root / "gt.lmdb")], ["lq", "gt"]
        )
        assert len(paths) == 4
        assert paths[0] == {"lq_path": "img_0", "gt_path": "img_0"}

    def test_rejects_non_lmdb(self, lmdb_pair):
        root, _ = lmdb_pair
        with pytest.raises(ValueError):
            paired_paths_from_lmdb([str(root / "lq"), str(root / "gt")], ["lq", "gt"])

    def test_paths_from_lmdb(self, lmdb_pair):
        root, _ = lmdb_pair
        assert sorted(paths_from_lmdb(str(root / "gt.lmdb"))) == [
            f"img_{i}" for i in range(4)
        ]

    def test_meta_info_file_mode(self, lmdb_pair, tmp_path):
        root, _ = lmdb_pair
        meta = tmp_path / "meta.txt"
        meta.write_text("img_0.png (40,48,3)\nimg_2.png (40,48,3)\n")
        paths = paired_paths_from_meta_info_file(
            [str(root / "lq"), str(root / "gt")], ["lq", "gt"], str(meta)
        )
        assert len(paths) == 2
        assert paths[1]["lq_path"].endswith("lq/img_2.png")


class TestLmdbDataset:
    def _dataset(self, root, phase="train"):
        from glare_tpu.sr.data.paired_image_dataset import PairedImageDataset

        return PairedImageDataset({
            "dataroot_lq": str(root / "lq.lmdb"),
            "dataroot_gt": str(root / "gt.lmdb"),
            "io_backend": {"type": "lmdb"},
            "phase": phase,
            "gt_size": 32,
        })

    def test_items_match_source_images(self, lmdb_pair):
        root, imgs = lmdb_pair
        ds = self._dataset(root, phase="val")
        assert len(ds) == 4
        item = ds[1]
        want = imgs[("gt", "img_1")][:, :, ::-1].astype(np.float32) / 255.0  # BGR->RGB
        np.testing.assert_allclose(item["gt"], want)
        assert item["lq"].shape == (40, 48, 3)

    def test_train_one_step_from_lmdb_batch(self, lmdb_pair):
        """The full round trip: pngs -> lmdb -> dataset -> one GAN train step."""
        from glare_tpu.sr.models.vq_model import VQDehazeModel

        root, _ = lmdb_pair
        ds = self._dataset(root)
        items = [ds[i] for i in range(2)]
        batch = {
            "lq": np.stack([it["lq"] for it in items]),
            "gt": np.stack([it["gt"] for it in items]),
        }
        opt = {
            "is_train": True,
            "manual_seed": 0,
            "network_g": {
                "type": "VQWeightDehazeNet",
                "gt_resolution": 32,
                "codebook_params": [[8, 64, 64]],
                "LQ_stage": False,
                "use_weight": False,
            },
            "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 64, "num_feat": 32},
            "datasets": {"train": {"gt_size": 32}},
            "path": {},
            "train": {
                "optim_g": {"type": "Adam", "lr": 1e-4},
                "optim_d": {"type": "Adam", "lr": 1e-4},
                "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                "gan_opt": {"type": "GANLoss", "gan_type": "hinge", "loss_weight": 0.1},
                "codebook_opt": {"loss_weight": 1.0},
                "net_d_init_iters": 0,
            },
            "val": {"metrics": {"psnr": {"type": "psnr"}}},
        }
        model = VQDehazeModel(opt)
        logs = model.optimize_parameters(1, batch)
        assert np.isfinite(logs["l_g_total"])
