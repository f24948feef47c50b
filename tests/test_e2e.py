"""End-to-end pipeline tests on a synthetic tiny LOL dataset:
stage-2 training -> checkpoint -> stage-3 training (warm-started) ->
paired inference protocol. Exercises options, data, trainers, schedulers,
checkpoint IO, and the CLIs' core loop (SURVEY.md §4 oracle (d), miniature)."""

import glob
import os

import numpy as np
import pytest
import yaml

import cv2

# full train->ckpt->infer pipelines: minutes of CPU compile per class
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_lol(tmp_path_factory):
    root = tmp_path_factory.mktemp("work")
    data_root = root / "LOLdataset"
    rng = np.random.RandomState(0)
    for split, n in [("our485", 3), ("eval15", 2)]:
        for sub in ["low", "high"]:
            os.makedirs(data_root / split / sub, exist_ok=True)
        for i in range(n):
            hi = rng.randint(60, 255, (48, 48, 3), np.uint8)
            lo = (hi * rng.uniform(0.05, 0.2)).astype(np.uint8)
            cv2.imwrite(str(data_root / split / "low" / f"{i}.png"), lo)
            cv2.imwrite(str(data_root / split / "high" / f"{i}.png"), hi)
    return root


def write_conf(root, stage, **over):
    base = yaml.safe_load(open(f"confs/train_stage{stage}_LOL.yml" if stage in (2, 3) else "confs/LOL.yml"))
    base["datasets"]["train"]["root"] = str(root / "LOLdataset")
    base["datasets"]["val"]["root"] = str(root / "LOLdataset")
    base["datasets"]["train"]["GT_size"] = 32
    base["datasets"]["train"]["batch_size"] = 2
    base["datasets"]["val"]["split"] = 0
    base["dataroot_GT"] = str(root / "LOLdataset" / "eval15" / "high")
    base["dataroot_LR"] = str(root / "LOLdataset" / "eval15" / "low")
    base["train"]["niter"] = 2
    base["train"]["warmup_iter"] = -1
    base["logger"]["print_freq"] = 1
    base["logger"]["save_checkpoint_freq"] = 2
    base["network_G"]["flow"]["K"] = 2
    base.update(over)
    name = over.get("name", f"tstage{stage}")
    base["name"] = name
    p = root / f"conf_{name}.yml"
    yaml.safe_dump(base, open(p, "w"))
    return str(p)


@pytest.fixture(scope="module")
def stage2_run(tiny_lol, monkeypatch_module):
    monkeypatch_module.setenv("GLARE_ROOT", str(tiny_lol))
    from glare_tpu.cli.train import main

    conf = write_conf(tiny_lol, 2)
    model, step = main(stage=2, argv=["--opt", conf])
    return tiny_lol, model, step


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


class TestStage2Training:
    def test_runs_and_checkpoints(self, stage2_run):
        root, model, step = stage2_run
        assert step >= 2
        ckpts = glob.glob(str(root / "experiments" / "tstage2" / "models" / "*_G.flax"))
        states = glob.glob(str(root / "experiments" / "tstage2" / "training_state" / "*.state"))
        assert ckpts and states
        assert np.isfinite(model.log_dict["nll_loss"])

    def test_resume_restores_step(self, stage2_run):
        root, model, step = stage2_run
        states = sorted(
            glob.glob(str(root / "experiments" / "tstage2" / "training_state" / "*.state"))
        )
        epoch, it = model.resume_training(states[-1])
        assert it == step


class TestStage3Training:
    def test_warm_start_and_train(self, stage2_run, monkeypatch_module):
        root, _, step = stage2_run
        from glare_tpu.cli.train import main

        g = sorted(glob.glob(str(root / "experiments" / "tstage2" / "models" / "*_G.flax")))[-1]
        conf = write_conf(
            root, 3, name="tstage3",
            path={"pretrain_model_G": g, "strict_load": False, "resume_state": None},
        )
        model, step3 = main(stage=3, argv=["--opt", conf])
        assert step3 >= 2
        for k in ["total_loss", "l1_loss", "percep_loss", "ssim_loss"]:
            assert np.isfinite(model.log_dict[k]), k

    def test_frozen_modules_unchanged(self, stage2_run, monkeypatch_module):
        """RRDB + flow params must not move during stage-3 training."""
        root, _, _ = stage2_run
        from glare_tpu.options import parse, dict_to_nonedict
        from glare_tpu.models import create_model
        import jax.numpy as jnp
        import jax

        conf = write_conf(root, 3, name="tstage3b")
        opt = dict_to_nonedict(parse(conf, is_train=True))
        model = create_model(opt)
        before = jax.tree.map(lambda x: np.asarray(x).copy(), model.params["RRDB"])
        lq = jnp.asarray(np.random.rand(1, 32, 32, 3).astype(np.float32))
        gt = jnp.asarray(np.random.rand(1, 32, 32, 3).astype(np.float32))
        model.optimize_parameters({"LQ": lq, "GT": gt}, 1)
        after = model.params["RRDB"]
        for (pa, pb) in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


class TestReleasedWeightsRehearsal:
    """Artifact-file rehearsal of the released-weights path (VERDICT #6):
    torch.save a reference-layout net_G.pth (module.-prefixed state_dict,
    base_model.py:93-122) and a Lightning-style vqgan.pkl (with decoy loss
    keys, LLFlow_model.py:41-50 / VQModel_arch.py:64-71), run the
    tools/torch2flax.py CLI on the *files*, then run the judged paired
    inference on synthetic images — proving convert -> load -> infer -> CSV
    works on artifacts, not just in-memory state_dicts."""

    REF = "/root/reference/code"

    @pytest.fixture(scope="class")
    def torch_artifacts(self, tiny_lol):
        torch = pytest.importorskip("torch")
        if not os.path.isdir(self.REF):
            pytest.skip("reference not mounted")
        import sys
        import types

        # reference modules import natsort/torchvision (absent): stub them
        for name in ["natsort", "torchvision"]:
            if name not in sys.modules:
                mod = types.ModuleType(name)
                if name == "natsort":
                    mod.natsorted = sorted
                else:
                    utils = types.ModuleType("torchvision.utils")
                    utils.make_grid = utils.save_image = lambda *a, **k: None
                    mod.utils = utils
                    sys.modules["torchvision.utils"] = utils
                sys.modules[name] = mod
        sys.path.insert(0, self.REF)
        try:
            from models.modules.ConditionEncoder import ConEncoder1
            from models.modules.deformableDecoder_arch import MultiScaleDecoder2
            from models.modules.encoder_decoder import Decoder, Encoder
            from models.modules.FlowUpsamplerNet import FlowUpsamplerNet
            from models.modules.quantize import VectorQuantizer2

            from glare_tpu.options import dict_to_nonedict

            ref_opt = dict_to_nonedict({
                "scale": 1, "le_curve": False, "sigmoid_output": False,
                "datasets": {"train": {"GT_size": 256, "quant": 32}},
                "network_G": {"flow": {
                    "K": 2, "L": 2, "coupling": "CondAffineSeparatedAndCond",
                    "additionalFlowNoAffine": 2, "conditionInFeaDim": 64,
                    "split": {"enable": False},
                }},
            })

            def randomize(module, seed, scale=0.05):
                g = torch.Generator().manual_seed(seed)
                sd = module.state_dict()
                for k, v in sd.items():
                    sd[k] = torch.randn(v.shape, generator=g) * scale
                module.load_state_dict(sd)
                return module

            # ---- net_G.pth: stage-3 state_dict, module.-prefixed ----
            rrdb = randomize(ConEncoder1(opt=ref_opt), 0)
            fun = randomize(FlowUpsamplerNet(
                (80, 80, 3), 64, 2,
                flow_coupling="CondAffineSeparatedAndCond", opt=ref_opt), 1)
            g = torch.Generator().manual_seed(2)
            with torch.no_grad():  # invconvs must stay invertible
                for layer in fun.layers:
                    layer.invconv.weight.copy_(
                        torch.linalg.qr(torch.randn(3, 3, generator=g))[0])
            aft = randomize(MultiScaleDecoder2(
                ch=128, out_ch=3, ch_mult=(1, 2, 4), num_res_blocks=2,
                attn_resolutions=[64], resolution=256, z_channels=3), 3)
            net_g_sd = {}
            for prefix, mod in [("RRDB", rrdb), ("flowUpsamplerNet", fun),
                                ("deformable_decoder", aft)]:
                for k, v in mod.state_dict().items():
                    net_g_sd[f"module.{prefix}.{k}"] = v
            net_g_path = tiny_lol / "net_G.pth"
            torch.save(net_g_sd, str(net_g_path))

            # ---- vqgan.pkl: Lightning-style checkpoint ----
            enc = randomize(Encoder(
                ch=128, out_ch=3, ch_mult=(1, 2, 4), num_res_blocks=2,
                attn_resolutions=[64], dropout=0.0, in_channels=3,
                resolution=256, z_channels=3, double_z=False), 4)
            dec = randomize(Decoder(
                ch=128, out_ch=3, ch_mult=(1, 2, 4), num_res_blocks=2,
                attn_resolutions=[64], dropout=0.0, in_channels=3,
                resolution=256, z_channels=3), 5)
            quant = randomize(VectorQuantizer2(8192, 3, beta=0.25), 6, scale=1.0)
            qc = randomize(torch.nn.Conv2d(3, 3, 1), 7)
            pqc = randomize(torch.nn.Conv2d(3, 3, 1), 8)
            vq_sd = {}
            for prefix, mod in [("encoder", enc), ("decoder", dec),
                                ("quantize", quant), ("quant_conv", qc),
                                ("post_quant_conv", pqc)]:
                for k, v in mod.state_dict().items():
                    vq_sd[f"{prefix}.{k}"] = v
            # decoy training-time keys a real Lightning ckpt carries
            vq_sd["loss.discriminator.main.0.weight"] = torch.zeros(4, 3, 3, 3)
            ckpt = {"state_dict": vq_sd, "epoch": 17, "global_step": 123456,
                    "pytorch-lightning_version": "1.0.8", "callbacks": {},
                    "optimizer_states": [], "lr_schedulers": []}
            vqgan_path = tiny_lol / "vqgan.pkl"
            torch.save(ckpt, str(vqgan_path))
            return net_g_path, vqgan_path, net_g_sd
        finally:
            sys.path.remove(self.REF)

    def test_convert_load_infer_csv_chain(self, tiny_lol, torch_artifacts,
                                          monkeypatch, capsys):
        import sys

        net_g_path, vqgan_path, net_g_sd = torch_artifacts

        # 1. the converter CLI, on artifact files (drop-in conf semantics:
        #    .pth/.pkl paths map to sibling .flax files)
        from tools.torch2flax import main as convert_main

        for kind, src in [("stage3", net_g_path), ("vqgan", vqgan_path)]:
            dst = os.path.splitext(str(src))[0] + ".flax"
            monkeypatch.setattr(
                sys, "argv",
                ["torch2flax", "--kind", kind, "--src", str(src), "--dst", dst])
            convert_main()
            assert os.path.exists(dst)

        # 2. judged paired-inference CLI against the converted artifacts
        conf = write_conf(
            tiny_lol, 3, name="trehearsal",
            model_path=str(net_g_path),
            path={"pretrained_vqgan": str(vqgan_path), "strict_load": True,
                  "resume_state": None},
        )
        monkeypatch.chdir(str(tiny_lol))
        from glare_tpu.cli.infer_paired import main as infer_main

        monkeypatch.setattr(sys, "argv", ["infer", "--opt", conf])
        infer_main(default_conf=conf)
        out = capsys.readouterr().out
        assert "using fresh init" not in out  # weights must actually load
        assert "Mean:" in out

        # 3. CSV written with the metric columns
        import pandas as pd

        csvs = glob.glob(str(tiny_lol / "results" / "*trehearsal*" / "*.csv"))
        assert csvs
        df = pd.read_csv(csvs[0])
        assert {"PSNR", "SSIM", "LPIPS"} <= set(df.columns)
        assert len(df) == 2 and np.isfinite(df["PSNR"]).all()

        # 4. converted weights actually landed in the live model params
        from glare_tpu.cli.infer_paired import load_model

        model, _ = load_model(conf)
        got = np.asarray(model.params["RRDB"]["color_conv"]["kernel"])
        want = net_g_sd["module.RRDB.color_conv.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestInferenceProtocol:
    def test_paired_inference_loop(self, stage2_run, monkeypatch_module, capsys):
        """Drive the judged CLI loop (pad, log, forward, crop, adjust, PSNR)."""
        root, _, _ = stage2_run
        import sys

        conf = write_conf(root, 3, name="tinfer")
        monkeypatch_module.chdir(str(root))
        from glare_tpu.cli.infer_paired import main

        monkeypatch_module.setattr(
            sys, "argv", ["infer", "--opt", conf]
        )
        main(default_conf=conf)
        out = capsys.readouterr().out
        assert "PSNR" in out and "Mean:" in out
        csvs = glob.glob(str(root / "results" / "*" / "*.csv"))
        assert csvs
