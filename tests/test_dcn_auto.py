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


def _fake_warp_stats(tap_max, blk_frac, tail_frac=None, radii=(1, 2, 4, 8, 16)):
    """Fabricated per-warp audit stats: tap_max with uniform block/pixel
    fractions at every radius below tap_max (0 above)."""
    return {
        "tap_p99": tap_max * 0.9,
        "tap_max": tap_max,
        "tap_frac_exceed": {
            r: (tail_frac if tail_frac is not None else
                (0.05 if r < tap_max else 0.0)) if r < tap_max else 0.0
            for r in radii},
        "pix_frac_exceed": {
            r: (0.1 if r < tap_max else 0.0) for r in radii},
        "rowblk_frac_exceed_by_rpb": {
            rpb: {r: (blk_frac if r < tap_max else 0.0) for r in radii}
            for rpb in (8, 16)},
    }


class TestAutoConfigureDCN:
    def test_audit_reports_offset_stats(self, model):
        lq = jnp.asarray(
            np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
        stats = model.audit_dcn_offsets(lq)
        for key in ("tap_p99", "tap_max", "tap_frac_exceed",
                    "pix_frac_exceed", "rowblk_frac_exceed", "warps"):
            assert key in stats, key
        # fresh init: conv_offset is zero-init -> all offsets exactly 0
        assert stats["tap_max"] == 0.0
        assert stats["tap_frac_exceed"][2] == 0.0
        # per-warp stats present for both AFT warps
        assert sorted(stats["warps"]) == ["warp_0", "warp_1"]
        for ws in stats["warps"].values():
            assert ws["tap_max"] == 0.0

    def test_in_band_offsets_keep_clamped_impl(self, model):
        # fresh init: conv_offset is zero-init, so every tap max is 0 and
        # the audit's cost competition tightens the clamp to R=1 (9 cells
        # vs 25; exact for any input since the offsets are identically 0).
        # Round-5 change: "kept" is an option, not an early return — a >15%
        # cheaper exact config wins (the hysteresis guard keeps marginal
        # ones from churning recompiles).
        lq = jnp.asarray(
            np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
        stats = model.auto_configure_dcn(lq)
        assert model.netG.dcn_impl == "chain"
        assert model.netG.dcn_max_offset == 1, stats["action"]
        assert "plain clamp R=1" in stats["action"]
        sr = model.get_sr(lq)
        assert np.isfinite(np.asarray(sr)).all()

    def test_out_of_band_offsets_pick_min_cost_exact(self, model):
        # simulate a reference-trained checkpoint whose offsets reach 5 px
        # EVERYWHERE (conv_offset bias): every row block is out of band, so
        # the cascade's capacity saturates at 1.0 (cost 25 + 289) and the
        # cheaper exact config is the plain band kernel clamped at
        # ceil(5 + 1 px margin) = 6 (cost 169)
        _set_conv_offset_bias(model.params, 5.0)
        lq = jnp.asarray(
            np.random.RandomState(2).rand(1, 32, 32, 3), jnp.float32)
        stats = model.auto_configure_dcn(lq)
        # on the CPU test backend the plain clamp is the dense select-chain
        # ('pallas' band kernel needs Mosaic hardware)
        assert model.netG.dcn_impl == "chain", stats["action"]
        assert model.netG.dcn_max_offset == 6, stats["action"]
        assert stats["tap_max"] == pytest.approx(5.0, abs=1e-5)
        # the cloned module must still run (jit cache was invalidated)
        sr = model.get_sr(lq)
        assert np.isfinite(np.asarray(sr)).all()

    def test_per_warp_decisions_from_fabricated_stats(self, model,
                                                      monkeypatch):
        """warp_0 drifted with a THIN block tail -> cascade wins there;
        warp_1 in band -> keeps the clamped impl. The knobs become per-warp
        tuples (OFFSET_HIST_r05 measures exactly this warp asymmetry)."""
        model.netG = model.netG.clone(dcn_impl="chain", dcn_max_offset=2)
        stats = {
            "tap_p99": 1.0, "tap_max": 6.4,
            "tap_frac_exceed": {r: 0.0 for r in (1, 2, 4, 8, 16)},
            "pix_frac_exceed": {r: 0.0 for r in (1, 2, 4, 8, 16)},
            "rowblk_frac_exceed": {r: 0.0 for r in (1, 2, 4, 8, 16)},
            "rowblk_frac_exceed_by_rpb": {
                rpb: {r: 0.0 for r in (1, 2, 4, 8, 16)} for rpb in (8, 16)},
            "warps": {
                # cascade cost 25 + 4*0.02*289 = 48 < plain R=8 cost 289
                "warp_0": _fake_warp_stats(6.4, blk_frac=0.02),
                "warp_1": _fake_warp_stats(0.5, blk_frac=0.0),
            },
        }
        monkeypatch.setattr(model, "audit_dcn_offsets",
                            lambda lq, radii=None: stats)
        out = model.auto_configure_dcn(jnp.zeros((1, 32, 32, 3)))
        assert model.netG.dcn_impl == ("hybrid", "chain"), out["action"]
        tails = model.netG.dcn_hybrid_tail_offset
        assert (tails[0] if isinstance(tails, tuple) else tails) == 8
        assert model.netG.dcn_hybrid_capacity[0] == pytest.approx(0.08)
        assert out["decisions"]["warp_1"]["note"].startswith("kept")

    def test_last_dcn_overflow_counts_only_overflow_sows(self, model):
        """Regression: the mutable intermediates collection in get_sr also
        records the audit's [B,H,W,G,K,2] "offsets" sows; the overflow
        accumulator must skip them (summing them raised a broadcast error
        and would otherwise corrupt the two counters)."""
        model.netG = model.netG.clone(dcn_impl="hybrid",
                                      dcn_max_offset=2,
                                      dcn_hybrid_tail_offset=8,
                                      dcn_hybrid_capacity=0.25)
        model._jit_cache.clear()
        lq = jnp.asarray(
            np.random.RandomState(4).rand(1, 32, 32, 3), jnp.float32)
        model.get_sr(lq)
        ov = model.last_dcn_overflow()
        assert set(ov) == {"overflow_blocks", "taps_beyond_tail"}
        # bias 5.0 offsets (prior test) with tail_offset 8 and in-capacity
        # blocks: taps are within R_tail, so the tap counter must be exactly
        # 0 — any pollution from the offsets sows would make it huge
        assert ov["taps_beyond_tail"] == 0, ov
        assert 0 <= ov["overflow_blocks"] < 10_000, ov

    def test_reconfigure_after_weight_change(self, model):
        # offsets now reach 3 px everywhere: plain clamp at ceil(3+1)=4
        # (cost 81) beats the saturated-capacity cascade (25 + 289)
        _set_conv_offset_bias(model.params, 3.0)
        lq = jnp.asarray(
            np.random.RandomState(3).rand(1, 32, 32, 3), jnp.float32)
        stats = model.auto_configure_dcn(lq)
        assert model.netG.dcn_impl == "chain", stats["action"]
        assert model.netG.dcn_max_offset == 4
