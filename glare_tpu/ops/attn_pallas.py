"""Fused single-head attention (flash/online-softmax) Pallas TPU kernel.

Target: the ten 16k-token AttnBlocks in the VQGAN encoder/decoder at the
620x420 protocol resolution (reference encoder_decoder.py:140-192 computes
a dense [n, n] torch.bmm + softmax). Our default large-n path is a query-
chunk loop whose [qc, n] score blocks round-trip HBM; the profile
(PROFILE_r03.json) shows that softmax traffic bandwidth-saturated at
760 GB/s, costing ~8 ms/img on top of the matmuls. This kernel keeps the
score block entirely in VMEM: one grid step computes QK^T for a
[bq, bk] tile, updates the online-softmax statistics (m, l) and the f32
output accumulator in scratch, and only the final [bq, c] result ever
touches HBM.

Layout: q/k/v arrive [B, N, C] (the natural reshape of the NHWC feature
map — no transposed copies). N is zero-padded outside the kernel to the
block multiples; padded KEY tokens are masked to -inf before the softmax
update (padded QUERY rows compute garbage and are sliced away by the
caller).

Numerics: scores and softmax statistics are f32 in-kernel (no HBM
materialization, so full precision is free — tighter than the chunked
path's bf16 score storage); the probs are cast to v.dtype for the AV MXU
pass, matching the chunked path's `attn.astype(v.dtype)` semantics.

The stock `jax.experimental.pallas.ops.tpu.flash_attention` was measured
a ~30% e2e regression (round-3 PERF_NOTES) — it wants a leading head axis
(transposed copies in/out), 512-multiple segment-id masking, and
multi-head block shapes that fit this single-head 16k x 512 problem
poorly. This kernel exists because the shape is known and fixed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, kmask_ref, o_ref, m_ref, l_ref, acc_ref, *,
            masked):
    ik = pl.program_id(2)
    n_kblk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # [bq, c]
    k = k_ref[0]                                   # [bk, c]
    # softmax in the base-2 domain: the caller folds scale*log2(e) into q
    # BEFORE the kernel (an [n, c] multiply instead of an [n, n] one — the
    # kernel is VPU-chain-bound, so every [bq, bk] pass counts); p/corr use
    # the hardware exp2 unit. Statistics m/l are base-2 too — mathematically
    # identical softmax.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [bq, bk] f32, log2-scaled

    # padded-key masking: a precomputed [1, bk] additive row (0 real,
    # -inf padded) — ONE broadcast-add pass, vs the iota+compare+select
    # three-pass formulation this replaces. Skipped entirely (traced out)
    # when the caller didn't pad.
    if masked:
        s = s + kmask_ref[0]

    m_prev = m_ref[:, :1]                          # [bq, 1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp2(m_prev - m_new)                # [bq, 1]
    p = jnp.exp2(s - m_new)                        # [bq, bk] f32
    l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)

    v = v_ref[0]                                   # [bk, c]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [bq, c] f32
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(ik == n_kblk - 1)
    def _emit():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _kernel_pipe(q_ref, k_ref, v_ref, kmask_ref, o_ref, m_ref, l_ref,
                 acc_ref, s_buf, *, masked):
    """Software-pipelined variant: step ik PRODUCES the score tile for
    k-block ik (pure MXU) and CONSUMES the tile produced at ik-1 (the
    softmax VPU chain + the AV matmul). The two halves touch different
    s_buf slots and different k/v blocks, so the vector unit's online-
    softmax chain can run under the matrix unit's QK^T instead of
    serializing after it — the serial chain is what held the one-pass
    kernel at 136.5 TFLOP/s vs the convs' 166.6 (PROFILE_r04.json).
    Grid is one step longer (n_kblk + 1): step 0 only produces, the last
    step only consumes and emits."""
    ik = pl.program_id(2)
    n_kblk = pl.num_programs(2) - 1

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(ik < n_kblk)
    def _produce():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [bq, bk] f32, log2-scaled
        if masked:
            s = s + kmask_ref[0]
        s_buf[jax.lax.rem(ik, 2)] = s

    @pl.when(ik > 0)
    def _consume():
        s = s_buf[jax.lax.rem(ik - 1, 2)]
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        corr = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0]                               # k/v specs lag one block
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:, :1] = m_new
        l_ref[:, :1] = l_new

        @pl.when(ik == n_kblk)
        def _emit():
            o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "n_true",
                                              "interpret", "pipeline"))
def flash_attention_nhc(q, k, v, *, bq=None, bk=1024, n_true=None,
                        interpret=False, pipeline=False):
    """Softmax(q k^T / sqrt(c)) v for [B, N, C] single-head inputs.

    bq=None picks the largest q block in {4096, 2048, 1024} that does not
    increase padding over a 1024-granular pad — measured best at the B=8
    16k-token c=512 decoder shape: (4096, 1024) = 30.1 ms / 144.0 TFLOP/s
    vs (1024, 1024)'s 30.7 / 141.5 and (8192, 1024)'s VMEM OOM (108 MB >
    100 MB scoped limit). The round-5 sweep (tools/bench_attn_sweep.py)
    shows a ~138-144 TFLOP/s plateau across shapes and the software-
    pipelined variant measurably SLOWER (132.8 at (1024,1024) —
    double-buffered score tiles cost more than the overlap wins), so 73%
    of bf16 peak is the practical wall for the one-pass kernel here; a
    two-pass scheme is provably worse (1.5x MXU flops needs an effective
    >212 TFLOP/s on a 197-peak part). Numbers: PERF_NOTES round 5.

    Scores/statistics f32 in VMEM; output dtype follows q. N is padded to
    the block multiples internally and the result sliced back. Callers that
    already carry block-multiple-padded tokens (e.g. AttnBlock pads ONCE
    before its qkv projections instead of 3x after) pass the real token
    count as `n_true`: keys/values beyond it are masked in-kernel, padded
    query rows compute garbage and stay in the (padded) output for the
    caller to slice.
    """
    b, n, c = q.shape
    if n_true is None:
        n_true = n
    if bq is None:
        pad1k = -(-n // 1024) * 1024
        bq = next(cand for cand in (4096, 2048, 1024)
                  if -(-n // cand) * cand == pad1k)
    # 1/sqrt(c) softmax scale x log2(e), folded into q OUTSIDE the kernel:
    # an [n, c] multiply here replaces an [n, n] per-tile multiply inside
    # the VPU-bound kernel (see _kernel). max/exp2 commute with the
    # positive scale, so the math is identical.
    scale = float(c) ** -0.5 * 1.4426950408889634
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    nq_pad = -(-n // bq) * bq
    nk_pad = -(-n // bk) * bk
    qp = jnp.pad(q, ((0, 0), (0, nq_pad - n), (0, 0))) if nq_pad != n else q
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - n), (0, 0))) if nk_pad != n else k
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - n), (0, 0))) if nk_pad != n else v
    n_kblk = nk_pad // bk
    masked = n_true < nk_pad
    # additive key mask row: 0 for real tokens, -inf for padding
    kmask = jnp.where(jnp.arange(nk_pad) < n_true, 0.0, _NEG_INF)[
        None, :
    ].astype(jnp.float32)

    if pipeline:
        # one extra k-step; k/kmask feed the PRODUCE half (block ik,
        # clamped on the final consume-only step), v feeds the CONSUME
        # half (block ik-1, clamped on the produce-only first step)
        grid = (b, nq_pad // bq, n_kblk + 1)
        last = n_kblk - 1
        kernel = functools.partial(_kernel_pipe, masked=masked)
        k_spec = pl.BlockSpec(
            (1, bk, c), lambda ib, iq, ik: (ib, jnp.minimum(ik, last), 0))
        v_spec = pl.BlockSpec(
            (1, bk, c), lambda ib, iq, ik: (ib, jnp.maximum(ik - 1, 0), 0))
        km_spec = pl.BlockSpec(
            (1, bk), lambda ib, iq, ik: (0, jnp.minimum(ik, last)))
        scratch = [
            pltpu.VMEM((bq, 128), jnp.float32),    # running max
            pltpu.VMEM((bq, 128), jnp.float32),    # running sum
            pltpu.VMEM((bq, c), jnp.float32),      # output accumulator
            pltpu.VMEM((2, bq, bk), jnp.float32),  # double-buffered scores
        ]
    else:
        grid = (b, nq_pad // bq, n_kblk)
        kernel = functools.partial(_kernel, masked=masked)
        k_spec = pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0))
        v_spec = pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0))
        km_spec = pl.BlockSpec((1, bk), lambda ib, iq, ik: (0, ik))
        scratch = [
            pltpu.VMEM((bq, 128), jnp.float32),    # running max
            pltpu.VMEM((bq, 128), jnp.float32),    # running sum
            pltpu.VMEM((bq, c), jnp.float32),      # output accumulator
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
            k_spec,
            v_spec,
            km_spec,
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, c), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # default 16 MB VMEM rejects the larger tiles; bigger (bq, bk)
            # means fewer grid steps (per-step overhead) and fewer m/l/acc
            # rescale passes per flop
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq_pad * nk_pad * c,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * nq_pad * nk_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp, kmask)
    return out[:, :n] if nq_pad != n else out
