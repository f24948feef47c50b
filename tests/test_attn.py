"""AttnBlock path equivalence: dense vs chunked (lax.map) vs unrolled.

The reference computes one dense [n, n] attention matrix
(/root/reference/code/models/modules/encoder_decoder_arch.py AttnBlock,
torch.bmm + softmax). Our large-n paths (query-chunk loop, optional
unroll) must be numerically identical to the dense path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glare_tpu.nn.layers import AttnBlock


def _run(x, **kw):
    m = AttnBlock(**kw)
    params = m.init(jax.random.PRNGKey(0), x)
    return np.asarray(m.apply(params, x))


@pytest.fixture(scope="module")
def x():
    # 12x20 = 240 tokens, c=64
    return jax.random.normal(jax.random.PRNGKey(1), (2, 12, 20, 64), jnp.float32)


class TestAttnPaths:
    def test_chunked_matches_dense(self, x):
        dense = _run(x, chunk_threshold=100000)
        chunked = _run(x, chunk_threshold=16, q_chunk=64)
        np.testing.assert_allclose(chunked, dense, atol=1e-5, rtol=1e-5)

    def test_unrolled_matches_dense(self, x):
        dense = _run(x, chunk_threshold=100000)
        # 240 tokens / 64 per chunk -> 4 chunks, fully unrolled
        unrolled = _run(x, chunk_threshold=16, q_chunk=64, unroll_chunks=8)
        np.testing.assert_allclose(unrolled, dense, atol=1e-5, rtol=1e-5)

    def test_unroll_threshold_respected(self, x):
        # n_chunks=4 > unroll_chunks=2 -> falls back to lax.map; still exact
        dense = _run(x, chunk_threshold=100000)
        mapped = _run(x, chunk_threshold=16, q_chunk=64, unroll_chunks=2)
        np.testing.assert_allclose(mapped, dense, atol=1e-5, rtol=1e-5)

    def test_ragged_tail_chunk(self, x):
        # q_chunk that doesn't divide n=240 -> pad + slice path
        dense = _run(x, chunk_threshold=100000)
        ragged = _run(x, chunk_threshold=16, q_chunk=100, unroll_chunks=8)
        np.testing.assert_allclose(ragged, dense, atol=1e-5, rtol=1e-5)

    def test_chunked_grad_matches_dense(self, x):
        # the fori_loop body uses dynamic_update_slice into a carried
        # buffer; static trip count -> scan lowering, so reverse AD must
        # produce the same gradients as the dense path (stage-1 GAN
        # training differentiates through the VQGAN attention blocks).
        params = AttnBlock(chunk_threshold=100000).init(jax.random.PRNGKey(0), x)

        def loss(p, m):
            return jnp.sum(m.apply(p, x) ** 2)

        g_dense = jax.grad(loss)(params, AttnBlock(chunk_threshold=100000))
        g_chunk = jax.grad(loss)(params, AttnBlock(chunk_threshold=16, q_chunk=64))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4),
            g_dense, g_chunk)


class TestSoftmaxBf16:
    """The chunked path's full-bf16 score storage (auto default on bf16
    networks): the [qc, n] score block comes off the QK^T pass in bf16 and
    the softmax'd probs are stored bf16, stats f32-accumulated
    (glare_tpu/nn/layers.py AttnBlock.softmax_bf16; measured +14% e2e)."""

    def test_bf16_scores_match_dense_within_rounding(self, x):
        xb = x.astype(jnp.bfloat16)
        m = AttnBlock(dtype=jnp.bfloat16, chunk_threshold=100000)
        params = m.init(jax.random.PRNGKey(0), xb)
        dense = np.asarray(m.apply(params, xb), np.float64)
        chunked = np.asarray(
            AttnBlock(dtype=jnp.bfloat16, chunk_threshold=16, q_chunk=64,
                      softmax_bf16=True).apply(params, xb), np.float64)
        rel = np.max(np.abs(chunked - dense)) / (np.max(np.abs(dense)) + 1e-12)
        assert rel < 2e-2, rel  # bf16 rounding of the scores, not a bug

    def test_auto_defaults(self, x):
        # f32 inputs keep f32 scores under the auto default: the chunked
        # path must remain EXACTLY equal to the dense f32 path.
        assert AttnBlock().softmax_bf16 is None
        dense = _run(x, chunk_threshold=100000)
        chunked = _run(x, chunk_threshold=16, q_chunk=64)  # auto, f32 input
        np.testing.assert_allclose(chunked, dense, atol=1e-5, rtol=1e-5)

    def test_forced_off_on_bf16_net(self, x):
        # GLARE_ATTN_MAT_BF16=0 semantics: softmax_bf16=False on a bf16
        # network gives the f32-score chunked path (the old default).
        xb = x.astype(jnp.bfloat16)
        m_ref = AttnBlock(dtype=jnp.bfloat16, chunk_threshold=16, q_chunk=64,
                          softmax_bf16=False)
        params = m_ref.init(jax.random.PRNGKey(0), xb)
        ref = np.asarray(m_ref.apply(params, xb), np.float64)
        on = np.asarray(
            AttnBlock(dtype=jnp.bfloat16, chunk_threshold=16, q_chunk=64,
                      softmax_bf16=True).apply(params, xb), np.float64)
        rel = np.max(np.abs(on - ref)) / (np.max(np.abs(ref)) + 1e-12)
        assert rel < 2e-2, rel


class TestFusedKernel:
    """ops/attn_pallas.py: the bespoke fused online-softmax kernel must
    match the dense reference (interpret mode on CPU). The kernel keeps
    f32 scores in VMEM, so f32 agreement is tight — tighter than the
    chunked bf16-score path."""

    def _oracle(self, q, k, v):
        c = q.shape[-1]
        s = np.einsum("bqc,bkc->bqk", np.asarray(q, np.float64),
                      np.asarray(k, np.float64)) * float(c) ** -0.5
        p = np.exp(s - s.max(-1, keepdims=True))
        return np.einsum("bqk,bkc->bqc", p / p.sum(-1, keepdims=True),
                         np.asarray(v, np.float64))

    def test_matches_oracle_f32(self):
        from glare_tpu.ops.attn_pallas import flash_attention_nhc
        b, n, c = 2, 700, 128  # ragged n: exercises q AND k padding+mask
        q, k, v = [jax.random.normal(jax.random.PRNGKey(i), (b, n, c),
                                     jnp.float32) for i in range(3)]
        out = np.asarray(flash_attention_nhc(q, k, v, bq=256, bk=256,
                                             interpret=True), np.float64)
        ref = self._oracle(q, k, v)
        assert np.max(np.abs(out - ref)) < 1e-5

    def test_matches_oracle_bf16(self):
        from glare_tpu.ops.attn_pallas import flash_attention_nhc
        b, n, c = 1, 300, 128
        q, k, v = [jax.random.normal(jax.random.PRNGKey(i), (b, n, c),
                                     jnp.bfloat16) for i in range(3)]
        out = np.asarray(
            flash_attention_nhc(q, k, v, bq=128, bk=256, interpret=True)
            .astype(np.float32), np.float64)
        ref = self._oracle(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32))
        rel = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
        assert rel < 2e-2, rel

    def test_block_size_invariance(self):
        from glare_tpu.ops.attn_pallas import flash_attention_nhc
        b, n, c = 1, 512, 128
        q, k, v = [jax.random.normal(jax.random.PRNGKey(i), (b, n, c),
                                     jnp.float32) for i in range(3)]
        a = flash_attention_nhc(q, k, v, bq=512, bk=512, interpret=True)
        bb = flash_attention_nhc(q, k, v, bq=128, bk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-6, rtol=1e-5)

    def test_auto_default_off_cpu_and_f32(self, x):
        # fused AUTO requires TPU + bf16 + large n: on CPU the chunked
        # path must still be chosen (no pallas_call in the lowered graph).
        m = AttnBlock(chunk_threshold=16, q_chunk=64)
        assert m.use_fused is None
        params = m.init(jax.random.PRNGKey(0), x)
        dense = _run(x, chunk_threshold=100000)
        np.testing.assert_allclose(np.asarray(m.apply(params, x)), dense,
                                   atol=1e-5, rtol=1e-5)
