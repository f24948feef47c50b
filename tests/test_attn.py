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
