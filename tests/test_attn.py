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
