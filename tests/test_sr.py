"""Stage-1 framework tests: registries, Swin/RSTB shapes, weighted-VQ
autoencoder forward (HQ + LQ stage), discriminator + GAN trainer step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestRegistry:
    def test_arch_registry_populated(self):
        from glare_tpu.sr.registry import ARCH_REGISTRY
        import glare_tpu.sr.archs  # noqa: F401  (triggers auto-import)

        assert "VQWeightDehazeNet" in ARCH_REGISTRY
        assert "UNetDiscriminatorSN" in ARCH_REGISTRY

    def test_duplicate_registration_fails(self):
        from glare_tpu.sr.registry import Registry

        r = Registry("t")

        @r.register()
        class Foo:
            pass

        with pytest.raises(KeyError):
            r._do_register("Foo", Foo)


class TestSwin:
    def test_rstb_shapes_and_shift(self):
        from glare_tpu.sr.archs.swin import SwinLayers

        m = SwinLayers(embed_dim=64, blk_depth=2, num_heads=4, window_size=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 64))
        params = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(params, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_window_partition_roundtrip(self):
        from glare_tpu.sr.archs.swin import window_partition, window_reverse

        x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        w = window_partition(x, 4)
        assert w.shape == (2 * 4, 16, 3)
        x2 = window_reverse(w, 4, 8, 8)
        np.testing.assert_array_equal(x2, x)


@pytest.fixture(scope="module")
def hq_net():
    from glare_tpu.sr.archs.vq_weight_arch import VQWeightDehazeNet

    net = VQWeightDehazeNet(
        gt_resolution=32, codebook_params=((8, 64, 64),), LQ_stage=False,
        use_weight=False,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(1), x)["params"]
    return net, params, x


class TestVQWeightDehazeNet:
    def test_hq_forward(self, hq_net):
        net, params, x = hq_net
        out, out_res, cb_loss, feat_q, z_q, idx_list = net.apply(
            {"params": params}, x, method=net.encode_and_decode
        )
        assert out.shape == (1, 32, 32, 3)
        assert out_res is None  # HQ stage has no residual branch
        assert float(cb_loss) >= 0
        assert z_q.shape == (1, 8, 8, 64)
        assert len(idx_list) == 1

    def test_decode_indices(self, hq_net):
        net, params, x = hq_net
        idx = jnp.zeros((1, 8, 8), jnp.int32)
        img = net.apply({"params": params}, idx, method=net.decode_indices)
        assert img.shape == (1, 32, 32, 3)

    def test_lq_stage_forward_with_gt_indices(self):
        from glare_tpu.sr.archs.vq_weight_arch import VQWeightDehazeNet

        net = VQWeightDehazeNet(
            gt_resolution=32, codebook_params=((8, 64, 64),), LQ_stage=True,
            use_weight=True, use_residual=True,
            )
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        params = net.init(jax.random.PRNGKey(1), x)["params"]
        gt_idx = [jnp.zeros((1, 8, 8), jnp.int32)]
        out, out_res, cb_loss, _, z_q, idx_list = net.apply(
            {"params": params}, x, gt_indices=gt_idx, method=net.encode_and_decode
        )
        assert out_res is not None and out_res.shape == (1, 32, 32, 3)
        assert float(cb_loss) > 0


class TestDiscriminator:
    def test_unet_sn_forward_and_spectral_update(self):
        from glare_tpu.sr.archs.discriminator_arch import UNetDiscriminatorSN

        d = UNetDiscriminatorSN(num_in_ch=64, num_feat=32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 64))
        variables = d.init(jax.random.PRNGKey(1), x)
        out, new_vars = d.apply(variables, x, update_stats=True, mutable=["spectral"])
        assert out.shape == (1, 16, 16, 1)
        u_before = jax.tree.leaves(variables["spectral"])[0]
        u_after = jax.tree.leaves(new_vars["spectral"])[0]
        assert not np.allclose(np.asarray(u_before), np.asarray(u_after))


class TestGANLosses:
    def test_gan_loss_types(self):
        from glare_tpu.sr.losses import GANLoss

        pred = jnp.asarray([[0.3, -0.2], [1.5, -1.5]])
        for t in ["vanilla", "lsgan", "wgan", "wgan_softplus", "hinge"]:
            g = GANLoss(gan_type=t, loss_weight=0.5)
            for real in (True, False):
                for is_disc in (True, False):
                    v = float(g(pred, real, is_disc=is_disc))
                    assert np.isfinite(v), (t, real, is_disc)

    def test_vanilla_matches_bce(self):
        from glare_tpu.sr.losses import GANLoss
        import math

        g = GANLoss(gan_type="vanilla", loss_weight=1.0)
        pred = jnp.asarray([[0.0]])
        # BCEWithLogits(0, target=1) = ln(2)
        np.testing.assert_allclose(float(g(pred, True, is_disc=True)), math.log(2), rtol=1e-6)


class TestVQDehazeTrainer:
    def test_hq_train_step(self, tmp_path):
        from glare_tpu.sr.models.vq_model import VQDehazeModel

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
            "path": {"models": str(tmp_path / "models"),
                     "training_states": str(tmp_path / "states")},
            "train": {
                "optim_g": {"type": "Adam", "lr": 1e-4},
                "optim_d": {"type": "Adam", "lr": 1e-4},
                "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                "gan_opt": {"type": "GANLoss", "gan_type": "hinge", "loss_weight": 0.1},
                "codebook_opt": {"loss_weight": 1.0},
                "net_d_init_iters": 0,
                "ema_decay": 0.999,
            },
            "val": {"metrics": {"psnr": {"type": "psnr", "better": "higher"}}},
        }
        model = VQDehazeModel(opt)
        rng = np.random.RandomState(0)
        batch = {
            "lq": rng.rand(2, 32, 32, 3).astype(np.float32),
            "gt": rng.rand(2, 32, 32, 3).astype(np.float32),
        }
        logs = model.optimize_parameters(1, batch)
        for k in ["l_codebook", "l_pix", "l_g_gan", "l_d_real", "l_d_fake"]:
            assert k in logs and np.isfinite(logs[k]), (k, logs)
        # second step: EMA must move toward params
        logs2 = model.optimize_parameters(2, batch)
        assert np.isfinite(logs2["l_g_total"])
        # save/restore round trip
        model.save(0, 2)
        import glob, os

        assert glob.glob(str(tmp_path / "models" / "net_g_2.flax"))
        assert glob.glob(str(tmp_path / "states" / "2.state"))

    def test_model_test_pads_to_32(self, tmp_path):
        from glare_tpu.sr.models.vq_model import VQDehazeModel

        opt = {
            "is_train": False,
            "manual_seed": 0,
            "network_g": {
                "type": "VQWeightDehazeNet",
                "gt_resolution": 32,
                "codebook_params": [[8, 64, 64]],
                "LQ_stage": False,
                "use_weight": False,
            },
            "datasets": {"train": {"gt_size": 32}},
            "path": {},
            "val": {"metrics": {"psnr": {"type": "psnr"}}},
        }
        model = VQDehazeModel(opt)
        lq = jnp.asarray(np.random.rand(1, 40, 52, 3).astype(np.float32))
        out = model.test(lq)
        assert out.shape == (1, 40, 52, 3)


class TestSemanticLoss:
    def test_hq_with_semantic(self, tmp_path):
        from glare_tpu.sr.models.vq_model import VQDehazeModel

        opt = {
            "is_train": True,
            "manual_seed": 0,
            "network_g": {
                "type": "VQWeightDehazeNet",
                "gt_resolution": 32,
                "codebook_params": [[8, 64, 64]],
                "LQ_stage": False,
                "use_weight": False,
                "use_semantic_loss": True,
            },
            "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 64, "num_feat": 32},
            "datasets": {"train": {"gt_size": 32}},
            "path": {"models": str(tmp_path / "m"), "training_states": str(tmp_path / "s")},
            "train": {
                "optim_g": {"type": "Adam", "lr": 1e-4},
                "optim_d": {"type": "Adam", "lr": 1e-4},
                "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                "gan_opt": {"type": "GANLoss", "gan_type": "hinge", "loss_weight": 0},
                "codebook_opt": {"loss_weight": 1.0},
                "semantic_opt": {"loss_weight": 0.1},
                "ema_decay": 0,
            },
            "val": {"metrics": {"psnr": {"type": "psnr", "better": "higher"}}},
        }
        model = VQDehazeModel(opt)
        rng = np.random.RandomState(0)
        batch = {"lq": rng.rand(1, 32, 32, 3).astype(np.float32),
                 "gt": rng.rand(1, 32, 32, 3).astype(np.float32)}
        logs = model.optimize_parameters(1, batch)
        assert "l_semantic" in logs and np.isfinite(logs["l_semantic"])


class TestFileClient:
    def test_disk_backend_and_imfrombytes(self, tmp_path):
        import cv2
        from glare_tpu.sr.utils.file_client import FileClient, imfrombytes

        img = np.random.RandomState(0).randint(0, 255, (8, 9, 3), np.uint8)
        p = str(tmp_path / "x.png")
        cv2.imwrite(p, img)
        fc = FileClient("disk")
        data = fc.get(p)
        dec = imfrombytes(data)
        np.testing.assert_array_equal(dec, img)

    def test_unknown_backend_raises(self):
        from glare_tpu.sr.utils.file_client import FileClient

        with pytest.raises(ValueError):
            FileClient("s3")


class TestMetricsRegistry:
    def test_psnr_ssim_y_channel(self):
        from glare_tpu.sr.metrics import calculate_psnr, calculate_ssim

        rng = np.random.RandomState(0)
        a = rng.randint(0, 256, (32, 32, 3), np.uint8)
        b = np.clip(a.astype(int) + rng.randint(-8, 8, a.shape), 0, 255).astype(np.uint8)
        p_rgb = calculate_psnr(a, b)
        p_y = calculate_psnr(a, b, crop_border=2, test_y_channel=True)
        assert np.isfinite(p_rgb) and np.isfinite(p_y)
        assert p_y > p_rgb  # Y-channel PSNR is characteristically higher
        s = calculate_ssim(a, b, crop_border=2, test_y_channel=True)
        assert 0 < s <= 1

    def test_niqe_raises_informative(self):
        from glare_tpu.sr.metrics import calculate_niqe

        with pytest.raises(NotImplementedError):
            calculate_niqe(np.zeros((8, 8, 3)))


class TestFID:
    def test_identical_distributions_zero(self):
        from glare_tpu.sr.metrics_fid import calculate_fid, compute_stats

        rng = np.random.RandomState(0)
        feats = rng.randn(500, 16)
        assert abs(calculate_fid(feats, feats)) < 1e-6
        mu, s = compute_stats(feats)
        assert abs(calculate_fid((mu, s), (mu, s))) < 1e-6

    def test_mean_shift_analytic(self):
        """For equal covariances, FID = ||mu1 - mu2||^2."""
        from glare_tpu.sr.metrics_fid import frechet_distance

        rng = np.random.RandomState(1)
        d = 8
        a = rng.randn(d, d)
        sigma = a @ a.T + np.eye(d)
        mu1 = np.zeros(d)
        mu2 = np.full(d, 0.5)
        got = frechet_distance(mu1, sigma, mu2, sigma)
        np.testing.assert_allclose(got, 0.25 * d, rtol=1e-6)

    def test_shifted_gaussians_positive_and_ordered(self):
        from glare_tpu.sr.metrics_fid import calculate_fid

        rng = np.random.RandomState(2)
        base = rng.randn(800, 8)
        near = base + 0.1 * rng.randn(800, 8)
        far = base + 2.0 + 0.5 * rng.randn(800, 8)
        f_near = calculate_fid(base, near)
        f_far = calculate_fid(base, far)
        assert 0 <= f_near < f_far

    def test_registry_and_informative_error(self):
        from glare_tpu.sr.metrics import build_metric

        fn = build_metric("calculate_fid")
        rng = np.random.RandomState(3)
        assert np.isfinite(fn(rng.randn(100, 4), rng.randn(100, 4)))
        with pytest.raises(NotImplementedError, match="InceptionV3"):
            fn(None, imgs1=np.zeros((2, 8, 8, 3)), imgs2=np.zeros((2, 8, 8, 3)))
