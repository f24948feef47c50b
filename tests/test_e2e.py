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
