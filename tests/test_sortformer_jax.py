"""Streaming Sortformer: architecture shapes, bounded state machine, NeMo
checkpoint conversion (synthetic state dict with NeMo naming — the real
.nemo is not downloadable on zero-egress hosts; mapping completeness, shape
compatibility and batch-norm folding are pinned here), and the session
backend contract (reference diarization/sortformer_backend.py:130-336)."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperlivekit_tpu.diarization import sortformer_jax as S
from whisperlivekit_tpu.diarization.sortformer import (
    SortformerDiarization,
    SortformerDiarizationOnline,
    nemo_log_mel,
)


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


def test_streaming_step_bounded_state(setup):
    dims, params = setup
    B = 2
    state = S.init_state(dims, B)
    rng = np.random.default_rng(1)
    T = dims.left_ctx_mel_frames + dims.chunk_mel_frames
    n_chunk = None
    for step in range(12):
        mel = jnp.asarray(rng.standard_normal((B, T, dims.n_mels)), jnp.float32)
        probs, state = S.streaming_step(
            params, state, mel, dims, ctx_frames=dims.left_ctx_mel_frames
        )
        if n_chunk is None:
            n_chunk = probs.shape[1]
            assert n_chunk >= dims.chunk_mel_frames // dims.subsampling - 1
        assert probs.shape == (B, n_chunk, dims.max_speakers)
        assert int(jnp.max(state.fifo_len)) <= dims.fifo_len
        assert int(jnp.max(state.spkcache_len)) <= dims.spkcache_len
    # after many chunks the fifo filled and spilled into the speaker cache
    assert int(jnp.min(state.fifo_len)) == dims.fifo_len
    assert int(jnp.min(state.spkcache_len)) > 0


def test_step_deterministic(setup):
    dims, params = setup
    rng = np.random.default_rng(2)
    T = dims.left_ctx_mel_frames + dims.chunk_mel_frames
    mel = jnp.asarray(rng.standard_normal((1, T, dims.n_mels)), jnp.float32)
    p1, _ = S.streaming_step(params, S.init_state(dims, 1), mel, dims,
                             ctx_frames=dims.left_ctx_mel_frames)
    p2, _ = S.streaming_step(params, S.init_state(dims, 1), mel, dims,
                             ctx_frames=dims.left_ctx_mel_frames)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_rel_shift_matches_naive():
    """The Transformer-XL shift must route score (s, rel) -> key position
    t = s - (T-1) + rel ... i.e. x[b,h,s,t] = bd[b,h,s, T-1 - s + t]."""
    rng = np.random.default_rng(0)
    B, H, T = 1, 2, 5
    bd = jnp.asarray(rng.standard_normal((B, H, T, 2 * T - 1)), jnp.float32)
    shifted = np.asarray(S._rel_shift(bd))[..., :T]
    want = np.zeros((B, H, T, T), np.float32)
    bdn = np.asarray(bd)
    for s in range(T):
        for t in range(T):
            want[:, :, s, t] = bdn[:, :, s, (T - 1) - s + t]
    np.testing.assert_allclose(shifted, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# NeMo conversion
# ---------------------------------------------------------------------------


def synthetic_nemo_state_dict(dims: S.SortformerDims, seed=0):
    """A state dict with NeMo's key naming and shapes (torch conventions)."""
    rng = np.random.default_rng(seed)
    sd = {}

    def w(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.05

    C, d, ff = dims.subsampling_channels, dims.d_encoder, dims.encoder_ff
    f_sub = dims.n_mels
    for _ in range(3):
        f_sub = -(-f_sub // 2)
    w("encoder.pre_encode.conv.0.weight", C, 1, 3, 3)
    w("encoder.pre_encode.conv.0.bias", C)
    for stage in (2, 5):
        w(f"encoder.pre_encode.conv.{stage}.weight", C, 1, 3, 3)       # depthwise
        w(f"encoder.pre_encode.conv.{stage}.bias", C)
        w(f"encoder.pre_encode.conv.{stage + 1}.weight", C, C, 1, 1)   # pointwise
        w(f"encoder.pre_encode.conv.{stage + 1}.bias", C)
    w("encoder.pre_encode.out.weight", d, C * f_sub)
    w("encoder.pre_encode.out.bias", d)

    for i in range(dims.encoder_layers):
        p = f"encoder.layers.{i}"
        for mod, a, b in (
            ("feed_forward1.linear1", ff, d), ("feed_forward1.linear2", d, ff),
            ("feed_forward2.linear1", ff, d), ("feed_forward2.linear2", d, ff),
            ("self_attn.linear_q", d, d), ("self_attn.linear_k", d, d),
            ("self_attn.linear_v", d, d), ("self_attn.linear_out", d, d),
        ):
            w(f"{p}.{mod}.weight", a, b)
            w(f"{p}.{mod}.bias", a)
        w(f"{p}.self_attn.linear_pos.weight", d, d)
        w(f"{p}.self_attn.pos_bias_u", dims.encoder_heads, d // dims.encoder_heads)
        w(f"{p}.self_attn.pos_bias_v", dims.encoder_heads, d // dims.encoder_heads)
        for nrm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                    "norm_feed_forward2", "norm_out"):
            w(f"{p}.{nrm}.weight", d)
            w(f"{p}.{nrm}.bias", d)
        w(f"{p}.conv.pointwise_conv1.weight", 2 * d, d, 1)
        w(f"{p}.conv.pointwise_conv1.bias", 2 * d)
        w(f"{p}.conv.depthwise_conv.weight", d, 1, dims.conv_kernel)
        w(f"{p}.conv.depthwise_conv.bias", d)
        w(f"{p}.conv.pointwise_conv2.weight", d, d, 1)
        w(f"{p}.conv.pointwise_conv2.bias", d)
        sd[f"{p}.conv.batch_norm.weight"] = np.abs(rng.standard_normal(d)).astype(np.float32) + 0.5
        w(f"{p}.conv.batch_norm.bias", d)
        w(f"{p}.conv.batch_norm.running_mean", d)
        sd[f"{p}.conv.batch_norm.running_var"] = np.abs(rng.standard_normal(d)).astype(np.float32) + 1.0
        sd[f"{p}.conv.batch_norm.num_batches_tracked"] = np.asarray(100)

    dm, hf = dims.d_model, dims.head_ff
    w("sortformer_modules.encoder_proj.weight", dm, d)
    w("sortformer_modules.encoder_proj.bias", dm)
    for i in range(dims.head_layers):
        p = f"transformer_encoder.layers.{i}"
        for mod in ("query_net", "key_net", "value_net", "out_projection"):
            w(f"{p}.first_sub_layer.{mod}.weight", dm, dm)
            w(f"{p}.first_sub_layer.{mod}.bias", dm)
        w(f"{p}.second_sub_layer.dense_in.weight", hf, dm)
        w(f"{p}.second_sub_layer.dense_in.bias", hf)
        w(f"{p}.second_sub_layer.dense_out.weight", dm, hf)
        w(f"{p}.second_sub_layer.dense_out.bias", dm)
        for nrm in ("layer_norm_1", "layer_norm_2"):
            w(f"{p}.{nrm}.weight", dm)
            w(f"{p}.{nrm}.bias", dm)

    w("sortformer_modules.first_hidden_to_hidden.weight", dm, dm)
    w("sortformer_modules.first_hidden_to_hidden.bias", dm)
    w("sortformer_modules.hidden_to_spks.weight", dims.max_speakers, dm)
    w("sortformer_modules.hidden_to_spks.bias", dims.max_speakers)
    return sd


def test_nemo_conversion_and_forward():
    base = S.DEV_TINY
    sd = synthetic_nemo_state_dict(base)
    params, dims = S.convert_nemo_state_dict(sd)
    assert dims.d_encoder == base.d_encoder
    assert dims.encoder_layers == base.encoder_layers
    assert dims.d_model == base.d_model
    assert dims.max_speakers == base.max_speakers

    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 48, dims.n_mels)), jnp.float32
    )
    probs = S.forward(params, mel, dims)
    assert np.all(np.isfinite(np.asarray(probs)))


def test_bn_folding_math():
    """Folded batch norm must equal (x - mean)/sqrt(var+eps)*gamma + beta."""
    base = S.DEV_TINY
    sd = synthetic_nemo_state_dict(base)
    params, dims = S.convert_nemo_state_dict(sd)
    d = dims.d_encoder
    gamma = sd["encoder.layers.0.conv.batch_norm.weight"]
    beta = sd["encoder.layers.0.conv.batch_norm.bias"]
    mean = sd["encoder.layers.0.conv.batch_norm.running_mean"]
    var = sd["encoder.layers.0.conv.batch_norm.running_var"]
    x = np.random.default_rng(2).standard_normal(d).astype(np.float32)
    want = (x - mean) / np.sqrt(var + 1e-5) * gamma + beta
    scale = np.asarray(params["conformer"]["conv_bn_scale"][0])
    bias = np.asarray(params["conformer"]["conv_bn_bias"][0])
    np.testing.assert_allclose(x * scale + bias, want, rtol=1e-5, atol=1e-5)


def test_conversion_rejects_unknown_keys():
    sd = synthetic_nemo_state_dict(S.DEV_TINY)
    sd["encoder.layers.0.mystery.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        S.convert_nemo_state_dict(sd)


# ---------------------------------------------------------------------------
# Session backend
# ---------------------------------------------------------------------------


def test_online_session_end_to_end():
    dims = S.DEV_TINY
    params = S.init_params(dims, jax.random.PRNGKey(0))
    shared = SortformerDiarization(params, dims)
    sess = shared.new_session()
    assert isinstance(sess, SortformerDiarizationOnline)

    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 200 * t) + 0.05 * rng.standard_normal(len(t))).astype(np.float32)

    async def run():
        segs = []
        sess.insert_audio_chunk(audio)
        while True:
            out = await sess.diarize()
            if not out:
                break
            segs.extend(out)
        return segs

    segs = asyncio.run(run())
    assert segs, "chunks of audio must yield speaker segments"
    for seg in segs:
        assert 0 <= seg.speaker < dims.max_speakers
        assert seg.end > seg.start
    # time continuity across chunk boundary
    assert segs[0].start == 0.0

    sess.insert_silence(3.0)
    sess.insert_audio_chunk(audio[: sess.chunk_samples])
    segs2 = asyncio.run(run.__wrapped__() if hasattr(run, "__wrapped__") else sess.diarize())
    if segs2:
        assert segs2[0].start >= 3.0  # offset advanced past the silence
    sess.close()


def test_nemo_mel_shapes():
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16000)), jnp.float32)
    mel = nemo_log_mel(audio)
    assert mel.shape[0] == 1 and mel.shape[2] == 128
    assert abs(mel.shape[1] - 100) <= 2  # ~10 ms frames over 1 s


def test_fifo_receives_first_chunk(setup):
    """Regression: chunk embeddings must land at fifo[0:n] on the FIRST step
    (the pre-fix code wrote them past the static buffer and dropped them)."""
    dims, params = setup
    state = S.init_state(dims, 1)
    rng = np.random.default_rng(5)
    T = dims.left_ctx_mel_frames + dims.chunk_mel_frames
    mel = jnp.asarray(rng.standard_normal((1, T, dims.n_mels)), jnp.float32)
    probs, state = S.streaming_step(params, state, mel, dims,
                                    ctx_frames=dims.left_ctx_mel_frames)
    n = probs.shape[1]
    fifo = np.asarray(state.fifo[0])
    assert int(state.fifo_len[0]) == n
    assert np.abs(fifo[:n]).max() > 0, "first chunk must enter the FIFO"
    assert np.abs(fifo[n:]).max() == 0, "beyond fifo_len stays empty"
