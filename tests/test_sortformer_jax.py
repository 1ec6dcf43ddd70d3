"""Streaming Sortformer architecture: shapes, state machine, bounded memory."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperlivekit_tpu.diarization import sortformer_jax as S


@pytest.fixture(scope="module")
def setup():
    dims = S.DEV_TINY
    params = S.init_params(dims, jax.random.PRNGKey(0))
    return dims, params


def test_forward_shapes(setup):
    dims, params = setup
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, dims.n_mels)), jnp.float32)
    probs = S.forward(params, mel, dims)
    assert probs.shape == (2, 64 // dims.subsampling, dims.max_speakers)
    p = np.asarray(probs)
    assert np.all((p >= 0) & (p <= 1))


def test_streaming_step_shapes_and_state(setup):
    dims, params = setup
    B = 2
    state = S.init_state(dims, B)
    rng = np.random.default_rng(1)
    for step in range(12):
        chunk = jnp.asarray(
            rng.standard_normal((B, dims.chunk_len * dims.subsampling, dims.n_mels)),
            jnp.float32,
        )
        probs, state = S.streaming_step(params, state, chunk, dims)
        assert probs.shape == (B, dims.chunk_len, dims.max_speakers)
        # bounded state: fifo/cache lengths never exceed capacity
        assert int(jnp.max(state.fifo_len)) <= dims.fifo_len
        assert int(jnp.max(state.spkcache_len)) <= dims.spkcache_len
    # after many chunks the fifo must have filled and spilled into the cache
    assert int(jnp.min(state.fifo_len)) == dims.fifo_len
    assert int(jnp.min(state.spkcache_len)) > 0


def test_streaming_state_is_pytree_batchable(setup):
    dims, params = setup
    state = S.init_state(dims, 3)
    leaves = jax.tree.leaves(state)
    assert all(l.shape[0] == 3 for l in leaves)


def test_step_deterministic(setup):
    dims, params = setup
    rng = np.random.default_rng(2)
    chunk = jnp.asarray(
        rng.standard_normal((1, dims.chunk_len * dims.subsampling, dims.n_mels)), jnp.float32
    )
    s1 = S.init_state(dims, 1)
    p1, _ = S.streaming_step(params, s1, chunk, dims)
    s2 = S.init_state(dims, 1)
    p2, _ = S.streaming_step(params, s2, chunk, dims)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
