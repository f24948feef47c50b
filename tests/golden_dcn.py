"""CPU golden oracle for modulated deformable conv, transcribed from the
reference CUDA kernels' *indexing* (not their code):

  modulated_deformable_im2col_gpu_kernel
      /root/reference/code/models/modules/ops/dcn/src/deform_conv_cuda_kernel.cu:571-632
  dmcn_im2col_bilinear (border handling)
      deform_conv_cuda_kernel.cu:468-497
  im2col + GEMM driver
      deform_conv_cuda.cpp:490-570 (modulated_deform_conv_cuda_forward)

Everything here uses the *torch/CUDA* layouts — NCHW images, the
concatenated conv_offset channel packing, OIHW weights — so that a test
comparing against glare_tpu's NHWC op exercises both the op math and the
checkpoint channel permutation (tools/torch2flax.py:dcn_offset_permutation)
end to end. The reference extension AT_ERRORs on CPU, so this file is the
only executable stand-in for its numerics in a GPU-less image.
"""

from __future__ import annotations

import numpy as np


def _dmcn_im2col_bilinear(im_c, H, W, h, w):
    """deform_conv_cuda_kernel.cu:468 — zero-padded bilinear on one channel.

    im_c: [H, W] single channel. Caller guarantees (-1 < h < H, -1 < w < W).
    """
    h_low = int(np.floor(h))
    w_low = int(np.floor(w))
    h_high = h_low + 1
    w_high = w_low + 1
    lh = h - h_low
    lw = w - w_low
    hh, hw = 1.0 - lh, 1.0 - lw
    v1 = im_c[h_low, w_low] if (h_low >= 0 and w_low >= 0) else 0.0
    v2 = im_c[h_low, w_high] if (h_low >= 0 and w_high <= W - 1) else 0.0
    v3 = im_c[h_high, w_low] if (h_high <= H - 1 and w_low >= 0) else 0.0
    v4 = im_c[h_high, w_high] if (h_high <= H - 1 and w_high <= W - 1) else 0.0
    return hh * hw * v1 + hh * lw * v2 + lh * hw * v3 + lh * lw * v4


def modulated_deform_conv_golden(
    x, offset, mask, weight, bias=None, stride=1, padding=1, dilation=1,
    deformable_groups=1,
):
    """Torch-layout golden DCNv2 forward with CUDA im2col buffer semantics.

    x       [B, C, H, W]
    offset  [B, 2*G*K, Ho, Wo]  — raw conv_offset packing: the CUDA kernel
            reads it as [B, G, 2K, Ho, Wo] with channel g*2K + 2k = dy of
            tap k, g*2K + 2k + 1 = dx (deform_conv_cuda_kernel.cu:602-608)
    mask    [B, G*K, Ho, Wo]    — already sigmoid-ed (deform_conv.py:368)
    weight  [O, C, kh, kw]
    returns [B, O, Ho, Wo]
    """
    x = np.asarray(x, np.float64)
    offset = np.asarray(offset, np.float64)
    mask = np.asarray(mask, np.float64)
    weight = np.asarray(weight, np.float64)
    B, C, H, W = x.shape
    O, Cw, kh, kw = weight.shape
    assert Cw == C
    K = kh * kw
    G = deformable_groups
    assert offset.shape[1] == 2 * G * K, offset.shape
    assert mask.shape[1] == G * K, mask.shape
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    assert offset.shape[2:] == (Ho, Wo)
    ch_per_group = C // G

    off_g = offset.reshape(B, G, 2 * K, Ho, Wo)
    mask_g = mask.reshape(B, G, K, Ho, Wo)

    # data_col layout per the kernel's pointer walk: [C*K, B, Ho, Wo]
    # (data_col_ptr starts at c_col*B*Ho*Wo + ... and advances by B*Ho*Wo
    # per tap, deform_conv_cuda_kernel.cu:596,629)
    col = np.zeros((C * K, B, Ho, Wo))
    for b in range(B):
        for c_im in range(C):
            g = c_im // ch_per_group
            for h_col in range(Ho):
                for w_col in range(Wo):
                    h_in = h_col * stride - padding
                    w_in = w_col * stride - padding
                    for i in range(kh):
                        for j in range(kw):
                            k = i * kw + j
                            off_h = off_g[b, g, 2 * k, h_col, w_col]
                            off_w = off_g[b, g, 2 * k + 1, h_col, w_col]
                            m = mask_g[b, g, k, h_col, w_col]
                            h_im = h_in + i * dilation + off_h
                            w_im = w_in + j * dilation + off_w
                            val = 0.0
                            if -1 < h_im < H and -1 < w_im < W:
                                val = _dmcn_im2col_bilinear(
                                    x[b, c_im], H, W, h_im, w_im)
                            col[c_im * K + k, b, h_col, w_col] = val * m

    # GEMM driver: output = weight.view(O, C*K) @ col (deform_conv_cuda.cpp:545-556)
    out = np.einsum(
        "oq,qbp->bop",
        weight.reshape(O, C * K),
        col.reshape(C * K, B, Ho * Wo),
    ).reshape(B, O, Ho, Wo)
    if bias is not None:
        out = out + np.asarray(bias, np.float64)[None, :, None, None]
    return out


def modulated_deform_conv_golden_fast(
    x, offset, mask, weight, bias=None, stride=1, padding=1, dilation=1,
    deformable_groups=1,
):
    """Vectorized-numpy golden DCNv2 — same layouts and CUDA boundary
    semantics as :func:`modulated_deform_conv_golden` (which it is asserted
    against at small shapes in tests/test_dcn.py), fast enough for
    protocol-geometry (620x420, C>=128) parity runs where the per-pixel
    literal transcription would take hours.

    Independent of glare_tpu's jax op: numpy, torch layouts (NCHW /
    interleaved conv_offset packing), float64 accumulation.
    """
    x = np.asarray(x, np.float64)
    offset = np.asarray(offset, np.float64)
    mask = np.asarray(mask, np.float64)
    weight = np.asarray(weight, np.float64)
    B, C, H, W = x.shape
    O, Cw, kh, kw = weight.shape
    assert Cw == C
    K = kh * kw
    G = deformable_groups
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    Cg = C // G

    off_g = offset.reshape(B, G, K, 2, Ho, Wo)  # [..., 0]=dy, [..., 1]=dx
    mask_g = mask.reshape(B, G, K, Ho, Wo)

    base_h = (np.arange(Ho) * stride - padding)[:, None]  # [Ho, 1]
    base_w = (np.arange(Wo) * stride - padding)[None, :]  # [1, Wo]

    out = np.zeros((B, O, Ho, Wo))
    w_kg = weight.reshape(O, G, Cg, kh, kw)
    for b in range(B):
        for g in range(G):
            xg = x[b, g * Cg:(g + 1) * Cg]  # [Cg, H, W]
            for i in range(kh):
                for j in range(kw):
                    k = i * kw + j
                    py = base_h + i * dilation + off_g[b, g, k, 0]  # [Ho,Wo]
                    px = base_w + j * dilation + off_g[b, g, k, 1]
                    in_rng = (py > -1) & (py < H) & (px > -1) & (px < W)
                    y0 = np.floor(py).astype(np.int64)
                    x0 = np.floor(px).astype(np.int64)
                    ly, lx = py - y0, px - x0
                    acc = np.zeros((Cg, Ho, Wo))
                    for dy, wy in ((0, 1.0 - ly), (1, ly)):
                        for dx, wx in ((0, 1.0 - lx), (1, lx)):
                            yy, xx = y0 + dy, x0 + dx
                            ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
                            yc = np.clip(yy, 0, H - 1)
                            xc = np.clip(xx, 0, W - 1)
                            v = xg[:, yc, xc]  # [Cg, Ho, Wo]
                            acc += v * (wy * wx * ok)
                    samp = acc * (mask_g[b, g, k] * in_rng)  # [Cg, Ho, Wo]
                    out[b] += np.einsum(
                        "oc,cp->op", w_kg[:, g, :, i, j],
                        samp.reshape(Cg, Ho * Wo)).reshape(O, Ho, Wo)
    if bias is not None:
        out = out + np.asarray(bias, np.float64)[None, :, None, None]
    return out
