"""Checkpoint-aware DCN dispatch (round-3 verdict #2).

``VQLLFLOWDModel.auto_configure_dcn`` audits the LOADED weights' learned
offsets on a real batch (the ``sow`` hook in modules/deformable_decoder.py)
and switches clamped impls (pallas/chain) to the exact-tail hybrid op when
the offsets exceed the clamp radius — so reference-trained checkpoints
(which are not clamp-bounded; see OFFSET_HIST artifacts) never silently run
with deviating semantics. Wired into the paired-inference CLI
(cli/infer_paired.py, network_G.dcn_auto: false disables).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import yaml

# full-channel stage-3 model init on CPU: minutes of compile
pytestmark = pytest.mark.slow


def _write_tiny_conf(tmp_path, **over):
    opt = yaml.safe_load(open("confs/LOL.yml"))
    opt["name"] = "tdcnauto"
    opt["datasets"]["train"]["GT_size"] = 32
    opt["network_G"]["flow"]["K"] = 2
    # small codebook: model init cost only (ch must stay 128 — the AFT
    # decoder's mid_feat taps are 128/256-channel by architecture)
    opt["network_VQGAN"].update(n_embed=64, attn_resolutions=[8])
    opt["path"] = {"pretrain_model_G": None, "pretrained_vqgan": None,
                   "strict_load": False, "resume_state": None}
    opt["use_dp"] = False
    for k, v in over.items():
        node = opt
        ks = k.split(".")
        for kk in ks[:-1]:
            node = node.setdefault(kk, {})
        node[ks[-1]] = v
    p = tmp_path / "tdcnauto.yml"
    yaml.safe_dump(opt, open(p, "w"))
    return str(p)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from glare_tpu.options import parse, dict_to_nonedict
    from glare_tpu.models import create_model

    conf = _write_tiny_conf(
        tmp_path_factory.mktemp("dcnauto"),
        **{"network_G.dcn_impl": "chain", "network_G.dcn_max_offset": 2},
    )
    opt = dict_to_nonedict(parse(conf, is_train=False))
    return create_model(opt)


def _set_conv_offset_bias(params, value):
    """Push every DCNv2Pack conv_offset bias to ``value`` in place.

    conv_offset's kernel is zero-init, so with bias b every o1/o2 tap reads
    exactly b px — a deterministic out-of-band regime for the audit.
    """
    n = [0]

    def walk(tree):
        for k, v in tree.items():
            if k == "conv_offset" and isinstance(v, dict) and "bias" in v:
                v["bias"] = jnp.full_like(v["bias"], value)
                n[0] += 1
            elif isinstance(v, dict):
                walk(v)

    walk(params)
    assert n[0] > 0, "no conv_offset modules found"
    return n[0]


class TestAutoConfigureDCN:
    def test_audit_reports_offset_stats(self, model):
        lq = jnp.asarray(
            np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
        stats = model.audit_dcn_offsets(lq)
        for key in ("tap_p99", "tap_max", "tap_frac_exceed",
                    "pix_frac_exceed", "rowblk_frac_exceed"):
            assert key in stats, key
        # fresh init: conv_offset is zero-init -> all offsets exactly 0
        assert stats["tap_max"] == 0.0
        assert stats["tap_frac_exceed"][2] == 0.0

    def test_in_band_offsets_keep_clamped_impl(self, model):
        lq = jnp.asarray(
            np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
        stats = model.auto_configure_dcn(lq)
        assert model.netG.dcn_impl == "chain"
        assert stats["action"].startswith("kept")

    def test_out_of_band_offsets_switch_to_hybrid(self, model):
        # simulate a reference-trained checkpoint whose offsets reach 5 px:
        # > R=2 (clamped semantics deviate), <= 8 (cascade tail covers it)
        _set_conv_offset_bias(model.params, 5.0)
        lq = jnp.asarray(
            np.random.RandomState(2).rand(1, 32, 32, 3), jnp.float32)
        stats = model.auto_configure_dcn(lq)
        assert model.netG.dcn_impl == "hybrid", stats["action"]
        # smallest tail radius covering tap max 5.0 from the (4, 8, 16) menu
        assert model.netG.dcn_hybrid_tail_offset == 8
        # every row block is out of band -> capacity saturates at the cap
        assert model.netG.dcn_hybrid_capacity == 0.5
        assert stats["tap_max"] == pytest.approx(5.0, abs=1e-5)
        # the cloned module must still run (jit cache was invalidated)
        sr = model.get_sr(lq)
        assert np.isfinite(np.asarray(sr)).all()

    def test_retune_existing_hybrid(self, model):
        # now the model runs 'hybrid'; a second audit retunes capacity
        _set_conv_offset_bias(model.params, 3.0)
        lq = jnp.asarray(
            np.random.RandomState(3).rand(1, 32, 32, 3), jnp.float32)
        stats = model.auto_configure_dcn(lq)
        assert model.netG.dcn_impl == "hybrid"
        assert "retuned" in stats["action"]
        # tap max 3.0 fits the smallest tail radius above R=2
        assert model.netG.dcn_hybrid_tail_offset == 4
