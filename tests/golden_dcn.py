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
