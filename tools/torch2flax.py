"""Torch-checkpoint -> flax-params converters.

Maps reference GLARE state_dicts onto glare_tpu param trees:
  * vqgan.pkl (VQModel, lightning-saved)      -> VQModel params
  * net_G.pth stage-2 (LLFlowVQGAN2)          -> LLFlowVQGAN2 params
  * net_G.pth stage-3 (VQLLFLOWDeformable)    -> VQLLFLOWDeformable params
  * torchvision VGG16 features / LPIPS-alex   -> npz for the loss/metric nets

Layout rules:
  conv weight  OIHW -> HWIO;  1x1 'conv' weights likewise
  per-channel [1, C, 1, 1] actnorm params -> [C]
  Conv2dZeros logs [C, 1, 1] -> [C]
  DCN conv_offset channels: torch packs cat(o1, o2) with per-group
  interleaved (dy, dx) pairs (deform_conv.py:362-370; CUDA indexing
  deform_conv_cuda_kernel.cu) while glare_tpu uses [dy(G*K) | dx(G*K) |
  mask(G*K)] blocks -- `dcn_offset_permutation` builds the channel map.

CLI:
  python tools/torch2flax.py --kind vqgan --src vqgan.pkl --dst vqgan.flax
  python tools/torch2flax.py --kind stage2 --src net_G.pth --dst net_G.flax
  python tools/torch2flax.py --kind stage3 --src net_G.pth --dst net_G.flax
  python tools/torch2flax.py --kind vgg16 --dst vgg16.npz    (needs torchvision)
"""

from __future__ import annotations

import argparse
import re
from typing import Dict

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def conv_w(t):
    """OIHW -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def vec(t):
    return _np(t).reshape(-1)


def set_path(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def dcn_offset_permutation(G=4, K=9):
    """torch conv_offset output channel -> glare_tpu channel map.

    Returns `perm` such that ours[c] = torch[perm[c]] for the 3*G*K output
    channels ordered [dy(G*K) | dx(G*K) | mask(G*K)] on our side.
    """
    perm = np.zeros(3 * G * K, np.int64)
    for g in range(G):
        for k in range(K):
            perm[g * K + k] = g * 2 * K + 2 * k            # dy
            perm[G * K + g * K + k] = g * 2 * K + 2 * k + 1  # dx
            perm[2 * G * K + g * K + k] = 2 * G * K + g * K + k  # mask
    return perm


# ---------------- encoder / decoder (ldm blocks) ----------------

_GN = lambda: None  # marker


def _convert_resblock(sd, prefix, out):
    """torch ResnetBlock -> flax ResnetBlock subtree."""
    t = {}
    t["norm1"] = {"GroupNorm_0": {"scale": vec(sd[f"{prefix}.norm1.weight"]),
                                  "bias": vec(sd[f"{prefix}.norm1.bias"])}}
    t["conv1"] = {"kernel": conv_w(sd[f"{prefix}.conv1.weight"]),
                  "bias": vec(sd[f"{prefix}.conv1.bias"])}
    t["norm2"] = {"GroupNorm_0": {"scale": vec(sd[f"{prefix}.norm2.weight"]),
                                  "bias": vec(sd[f"{prefix}.norm2.bias"])}}
    t["conv2"] = {"kernel": conv_w(sd[f"{prefix}.conv2.weight"]),
                  "bias": vec(sd[f"{prefix}.conv2.bias"])}
    if f"{prefix}.nin_shortcut.weight" in sd:
        t["nin_shortcut"] = {"kernel": conv_w(sd[f"{prefix}.nin_shortcut.weight"]),
                             "bias": vec(sd[f"{prefix}.nin_shortcut.bias"])}
    if f"{prefix}.conv_shortcut.weight" in sd:
        t["conv_shortcut"] = {"kernel": conv_w(sd[f"{prefix}.conv_shortcut.weight"]),
                              "bias": vec(sd[f"{prefix}.conv_shortcut.bias"])}
    return t


def _convert_attn(sd, prefix):
    t = {"norm": {"GroupNorm_0": {"scale": vec(sd[f"{prefix}.norm.weight"]),
                                  "bias": vec(sd[f"{prefix}.norm.bias"])}}}
    for n in ["q", "k", "v", "proj_out"]:
        t[n] = {"kernel": conv_w(sd[f"{prefix}.{n}.weight"]),
                "bias": vec(sd[f"{prefix}.{n}.bias"])}
    return t


def convert_ldm_encoder(sd, prefix="encoder", num_resolutions=3, num_res_blocks=2):
    """reference Encoder (encoder_decoder.py:342) -> flax Encoder params."""
    out = {}
    out["conv_in"] = {"kernel": conv_w(sd[f"{prefix}.conv_in.weight"]),
                      "bias": vec(sd[f"{prefix}.conv_in.bias"])}
    for i in range(num_resolutions):
        for j in range(num_res_blocks):
            out[f"down_{i}_block_{j}"] = _convert_resblock(sd, f"{prefix}.down.{i}.block.{j}", out)
            if f"{prefix}.down.{i}.attn.{j}.norm.weight" in sd:
                out[f"down_{i}_attn_{j}"] = _convert_attn(sd, f"{prefix}.down.{i}.attn.{j}")
        if f"{prefix}.down.{i}.downsample.conv.weight" in sd:
            out[f"down_{i}_downsample"] = {"conv": {
                "kernel": conv_w(sd[f"{prefix}.down.{i}.downsample.conv.weight"]),
                "bias": vec(sd[f"{prefix}.down.{i}.downsample.conv.bias"])}}
    out["mid_block_1"] = _convert_resblock(sd, f"{prefix}.mid.block_1", out)
    out["mid_attn_1"] = _convert_attn(sd, f"{prefix}.mid.attn_1")
    out["mid_block_2"] = _convert_resblock(sd, f"{prefix}.mid.block_2", out)
    out["norm_out"] = {"GroupNorm_0": {"scale": vec(sd[f"{prefix}.norm_out.weight"]),
                                       "bias": vec(sd[f"{prefix}.norm_out.bias"])}}
    out["conv_out"] = {"kernel": conv_w(sd[f"{prefix}.conv_out.weight"]),
                       "bias": vec(sd[f"{prefix}.conv_out.bias"])}
    return out


def convert_ldm_decoder(sd, prefix="decoder", num_resolutions=3, num_res_blocks=2):
    out = {}
    out["conv_in"] = {"kernel": conv_w(sd[f"{prefix}.conv_in.weight"]),
                      "bias": vec(sd[f"{prefix}.conv_in.bias"])}
    out["mid_block_1"] = _convert_resblock(sd, f"{prefix}.mid.block_1", out)
    out["mid_attn_1"] = _convert_attn(sd, f"{prefix}.mid.attn_1")
    out["mid_block_2"] = _convert_resblock(sd, f"{prefix}.mid.block_2", out)
    for i in range(num_resolutions):
        for j in range(num_res_blocks + 1):
            out[f"up_{i}_block_{j}"] = _convert_resblock(sd, f"{prefix}.up.{i}.block.{j}", out)
            if f"{prefix}.up.{i}.attn.{j}.norm.weight" in sd:
                out[f"up_{i}_attn_{j}"] = _convert_attn(sd, f"{prefix}.up.{i}.attn.{j}")
        if f"{prefix}.up.{i}.upsample.conv.weight" in sd:
            out[f"up_{i}_upsample"] = {"conv": {
                "kernel": conv_w(sd[f"{prefix}.up.{i}.upsample.conv.weight"]),
                "bias": vec(sd[f"{prefix}.up.{i}.upsample.conv.bias"])}}
    out["norm_out"] = {"GroupNorm_0": {"scale": vec(sd[f"{prefix}.norm_out.weight"]),
                                       "bias": vec(sd[f"{prefix}.norm_out.bias"])}}
    out["conv_out"] = {"kernel": conv_w(sd[f"{prefix}.conv_out.weight"]),
                       "bias": vec(sd[f"{prefix}.conv_out.bias"])}
    return out


# ---------------- flow ----------------

def convert_actnorm(sd, prefix):
    return {"bias": vec(sd[f"{prefix}.bias"]), "logs": vec(sd[f"{prefix}.logs"])}


def convert_fnet(sd, prefix):
    """flow F net: Sequential(Conv2d+actnorm, ReLU, Conv2d+actnorm, ReLU,
    Conv2dZeros) -> FNet subtree (conv_in / conv_hidden_0 / conv_zeros)."""
    out = {
        "conv_in": {"kernel": conv_w(sd[f"{prefix}.0.weight"]),
                    "actnorm": convert_actnorm(sd, f"{prefix}.0.actnorm")},
        "conv_hidden_0": {"kernel": conv_w(sd[f"{prefix}.2.weight"]),
                          "actnorm": convert_actnorm(sd, f"{prefix}.2.actnorm")},
        "conv_zeros": {"kernel": conv_w(sd[f"{prefix}.4.weight"]),
                       "bias": vec(sd[f"{prefix}.4.bias"]),
                       "logs": vec(sd[f"{prefix}.4.logs"])},
    }
    return out


def convert_flow_step(sd, prefix, has_coupling=True):
    out = {
        "actnorm": convert_actnorm(sd, f"{prefix}.actnorm"),
        "invconv": {"weight": _np(sd[f"{prefix}.invconv.weight"])},
    }
    if has_coupling and f"{prefix}.affine.fFeatures.0.weight" in sd:
        out["affine"] = {
            "fFeatures": convert_fnet(sd, f"{prefix}.affine.fFeatures"),
            "fAffine": convert_fnet(sd, f"{prefix}.affine.fAffine"),
        }
    return out


def convert_flow_upsampler(sd, prefix="flowUpsamplerNet", n_layers=None):
    if n_layers is None:  # infer from the checkpoint (e.g. 28 for K=12, L=2)
        pat = re.compile(re.escape(prefix) + r"\.layers\.(\d+)\.")
        idxs = {int(m.group(1)) for k in sd for m in [pat.match(k)] if m}
        assert idxs, f"no {prefix}.layers.* keys in checkpoint"
        n_layers = max(idxs) + 1
    out = {}
    for i in range(n_layers):
        out[f"layers_{i}"] = convert_flow_step(sd, f"{prefix}.layers.{i}")
    return out


def convert_cond_encoder(sd, prefix="RRDB"):
    out = {"encoder": convert_ldm_encoder(sd, f"{prefix}.encoder")}
    out["cond_conv"] = {"kernel": conv_w(sd[f"{prefix}.cond_conv.0.weight"]),
                        "bias": vec(sd[f"{prefix}.cond_conv.0.bias"])}
    out["color_conv"] = {"kernel": conv_w(sd[f"{prefix}.color_conv.weight"]),
                         "bias": vec(sd[f"{prefix}.color_conv.bias"])}
    return out


# ---------------- top-level checkpoints ----------------

def convert_vqgan(sd):
    """vqgan.pkl state_dict -> flax VQModel params."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    out = {
        "encoder": convert_ldm_encoder(sd, "encoder"),
        "decoder": convert_ldm_decoder(sd, "decoder"),
        "quantize": {"embedding": _np(sd["quantize.embedding.weight"])},
        "quant_conv": {"kernel": conv_w(sd["quant_conv.weight"]),
                       "bias": vec(sd["quant_conv.bias"])},
        "post_quant_conv": {"kernel": conv_w(sd["post_quant_conv.weight"]),
                            "bias": vec(sd["post_quant_conv.bias"])},
    }
    return out


def convert_stage2(sd, n_layers=None):
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return {
        "RRDB": convert_cond_encoder(sd, "RRDB"),
        "flowUpsamplerNet": convert_flow_upsampler(sd, "flowUpsamplerNet", n_layers),
    }


def convert_dcnpack(sd, prefix, G=4, K=9):
    perm = dcn_offset_permutation(G, K)
    co_w = conv_w(sd[f"{prefix}.conv_offset.weight"])[:, :, :, perm]
    co_b = vec(sd[f"{prefix}.conv_offset.bias"])[perm]
    return {
        "conv_offset": {"kernel": co_w, "bias": co_b},
        "weight": conv_w(sd[f"{prefix}.weight"]),
        "bias": vec(sd[f"{prefix}.bias"]),
    }


def convert_aft_decoder(sd, prefix="deformable_decoder", num_resolutions=3,
                        num_res_blocks=2):
    out = {}
    out["conv_in"] = {"kernel": conv_w(sd[f"{prefix}.conv_in.weight"]),
                      "bias": vec(sd[f"{prefix}.conv_in.bias"])}
    out["mid_block_1"] = _convert_resblock(sd, f"{prefix}.mid.block_1", out)
    out["mid_attn_1"] = _convert_attn(sd, f"{prefix}.mid.attn_1")
    out["mid_block_2"] = _convert_resblock(sd, f"{prefix}.mid.block_2", out)
    for i in range(num_resolutions):
        for j in range(num_res_blocks + 1):
            out[f"up_{i}_block_{j}"] = _convert_resblock(sd, f"{prefix}.up.{i}.block.{j}", out)
            if f"{prefix}.up.{i}.attn.{j}.norm.weight" in sd:
                out[f"up_{i}_attn_{j}"] = _convert_attn(sd, f"{prefix}.up.{i}.attn.{j}")
        if f"{prefix}.up.{i}.upsample.conv.weight" in sd:
            out[f"up_{i}_upsample"] = {"conv": {
                "kernel": conv_w(sd[f"{prefix}.up.{i}.upsample.conv.weight"]),
                "bias": vec(sd[f"{prefix}.up.{i}.upsample.conv.bias"])}}
    for w in range(2):
        out[f"warp_{w}"] = {
            "offset": {"kernel": conv_w(sd[f"{prefix}.warp.{w}.offset.weight"]),
                       "bias": vec(sd[f"{prefix}.warp.{w}.offset.bias"])},
            "dcn": convert_dcnpack(sd, f"{prefix}.warp.{w}.dcn"),
        }
        out[f"mix_{w}"] = {"w": vec(sd[f"{prefix}.mix.{w}.w"])}
    out["norm_out"] = {"GroupNorm_0": {"scale": vec(sd[f"{prefix}.norm_out.weight"]),
                                       "bias": vec(sd[f"{prefix}.norm_out.bias"])}}
    out["residual_conv"] = {"kernel": conv_w(sd[f"{prefix}.residual_conv.weight"]),
                            "bias": vec(sd[f"{prefix}.residual_conv.bias"])}
    return out


def convert_stage3(sd, n_layers=None):
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return {
        "RRDB": convert_cond_encoder(sd, "RRDB"),
        "flowUpsamplerNet": convert_flow_upsampler(sd, "flowUpsamplerNet", n_layers),
        "deformable_decoder": convert_aft_decoder(sd),
    }


def dense_w(t):
    """torch Linear [out, in] -> flax Dense kernel [in, out]."""
    return _np(t).T


def convert_swinir(sd, depths=None):
    """Full-SwinIR state dict (network_swinir.py:619 SwinIR) ->
    glare_tpu.sr.archs.swinir_arch.SwinIR params. Handles all four
    reconstruction heads and '1conv'/'3conv' residual connections."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    if depths is None:
        li = {int(k.split(".")[1]) for k in sd if k.startswith("layers.")}
        depths = []
        for i in sorted(li):
            bj = {int(k.split(".")[4]) for k in sd
                  if k.startswith(f"layers.{i}.residual_group.blocks.")}
            depths.append(max(bj) + 1)
    out = {}

    def conv(dst, src):
        out[dst] = {"kernel": conv_w(sd[f"{src}.weight"]),
                    "bias": vec(sd[f"{src}.bias"])}

    conv("conv_first", "conv_first")
    if "patch_embed.norm.weight" in sd:
        out["patch_norm"] = {"scale": vec(sd["patch_embed.norm.weight"]),
                             "bias": vec(sd["patch_embed.norm.bias"])}
    if "absolute_pos_embed" in sd:
        out["absolute_pos_embed"] = _np(sd["absolute_pos_embed"])
    for i, depth in enumerate(depths):
        layer = {"residual_group": {}}
        for j in range(depth):
            p = f"layers.{i}.residual_group.blocks.{j}"
            layer["residual_group"][f"block_{j}"] = {
                "norm1": {"scale": vec(sd[f"{p}.norm1.weight"]),
                          "bias": vec(sd[f"{p}.norm1.bias"])},
                "attn": {
                    "relative_position_bias_table":
                        _np(sd[f"{p}.attn.relative_position_bias_table"]),
                    "qkv": {"kernel": dense_w(sd[f"{p}.attn.qkv.weight"]),
                            "bias": vec(sd[f"{p}.attn.qkv.bias"])},
                    "proj": {"kernel": dense_w(sd[f"{p}.attn.proj.weight"]),
                             "bias": vec(sd[f"{p}.attn.proj.bias"])},
                },
                "norm2": {"scale": vec(sd[f"{p}.norm2.weight"]),
                          "bias": vec(sd[f"{p}.norm2.bias"])},
                "mlp": {"fc1": {"kernel": dense_w(sd[f"{p}.mlp.fc1.weight"]),
                                "bias": vec(sd[f"{p}.mlp.fc1.bias"])},
                        "fc2": {"kernel": dense_w(sd[f"{p}.mlp.fc2.weight"]),
                                "bias": vec(sd[f"{p}.mlp.fc2.bias"])}},
            }
        if f"layers.{i}.conv.weight" in sd:
            layer["conv"] = {"kernel": conv_w(sd[f"layers.{i}.conv.weight"]),
                             "bias": vec(sd[f"layers.{i}.conv.bias"])}
        else:  # '3conv' Sequential indices 0/2/4
            for n, idx in enumerate((0, 2, 4)):
                layer[f"conv_{n}"] = {
                    "kernel": conv_w(sd[f"layers.{i}.conv.{idx}.weight"]),
                    "bias": vec(sd[f"layers.{i}.conv.{idx}.bias"])}
        out[f"layer_{i}"] = layer
    out["norm"] = {"scale": vec(sd["norm.weight"]),
                   "bias": vec(sd["norm.bias"])}
    if "conv_after_body.weight" in sd:
        conv("conv_after_body", "conv_after_body")
    else:  # '3conv' Sequential indices 0/2/4
        conv("cab_conv0", "conv_after_body.0")
        conv("cab_conv1", "conv_after_body.2")
        conv("cab_conv2", "conv_after_body.4")
    if "conv_before_upsample.0.weight" in sd:
        conv("conv_before_upsample", "conv_before_upsample.0")
    # pixelshuffle head: upsample.{0,2,...} convs interleaved with shuffles
    ups = sorted({int(k.split(".")[1]) for k in sd
                  if k.startswith("upsample.") and k.endswith(".weight")})
    if ups:
        first = f"upsample.{ups[0]}"
        if f"{first}.weight" in sd and "conv_before_upsample.0.weight" in sd:
            out["upsample"] = {}
            # arch_util.Upsample names its convs conv{n} (shared with the
            # EDSR-style upsampler; one module, one naming)
            for n, idx in enumerate(ups):
                out["upsample"][f"conv{n}"] = {
                    "kernel": conv_w(sd[f"upsample.{idx}.weight"]),
                    "bias": vec(sd[f"upsample.{idx}.bias"])}
        else:  # pixelshuffledirect: UpsampleOneStep conv
            conv("upsample_conv", f"upsample.{ups[0]}")
    for name in ("conv_up1", "conv_up2", "conv_hr", "conv_last"):
        if f"{name}.weight" in sd:
            conv(name, name)
    return out


def convert_vgg16_npz(dst, src=None):
    """Export the first 16 torchvision-VGG16 feature layers' convs to npz.

    src: optional local state-dict drop (torch-hub format,
    ``features.N.weight`` keys — e.g. vgg16-397923af.pth) for offline
    images without torchvision; otherwise torchvision's pretrained model.
    """
    if src is not None:
        import torch

        sd = torch.load(src, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
        # conv layer indices inside features[:16] of torchvision VGG16
        conv_layers = [0, 2, 5, 7, 10, 12, 14]
        data = {}
        for conv_idx, li in enumerate(conv_layers):
            data[f"conv_{conv_idx}.weight"] = _np(sd[f"features.{li}.weight"])
            data[f"conv_{conv_idx}.bias"] = _np(sd[f"features.{li}.bias"])
        np.savez(dst, **data)
        return

    import torchvision

    vgg = torchvision.models.vgg16(pretrained=True).features[:16]
    data = {}
    conv_idx = 0
    for layer in vgg:
        if layer.__class__.__name__ == "Conv2d":
            data[f"conv_{conv_idx}.weight"] = _np(layer.weight)
            data[f"conv_{conv_idx}.bias"] = _np(layer.bias)
            conv_idx += 1
    np.savez(dst, **data)


def main():
    import torch
    from flax import serialization

    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", required=True,
                        choices=["vqgan", "stage2", "stage3", "vgg16", "swinir"])
    parser.add_argument("--src", default=None)
    parser.add_argument("--dst", required=True)
    args = parser.parse_args()

    if args.kind == "vgg16":
        convert_vgg16_npz(args.dst, src=args.src)
        print(f"wrote {args.dst}")
        return

    sd = torch.load(args.src, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    params = {"vqgan": convert_vqgan, "stage2": convert_stage2,
              "stage3": convert_stage3, "swinir": convert_swinir}[args.kind](sd)
    with open(args.dst, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
