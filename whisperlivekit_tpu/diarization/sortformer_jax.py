"""Streaming Sortformer diarization architecture in JAX.

End-to-end speaker diarization with arrival-order speaker outputs
(Sortformer, arXiv:2409.06656; streaming variant used by the reference via
NeMo, reference diarization/sortformer_backend.py:50-128). Architecture:

    mel (128 bands, 10 ms) → conv subsampling (×8) → conformer encoder
    → projection → sortformer transformer → sigmoid heads for ≤4 speakers

Streaming (arrival-order speaker cache): each step runs the model over
``[spkcache | fifo | chunk]`` frames; the chunk's predictions are emitted,
the chunk enters the FIFO, and when the FIFO fills, its highest-confidence
frames per speaker are compressed into the speaker cache — bounded state,
unbounded streams. The state is an explicit pytree (cache/fifo + lengths),
so the step is one jitted call and sessions batch the same way ASR lanes do.

Weights: random init works for the state-machine tests; loading the NVIDIA
checkpoint requires NeMo-format conversion (`convert_nemo_state_dict`,
pending a downloadable checkpoint — zero-egress hosts can't fetch it).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SortformerDims:
    n_mels: int = 128
    subsampling: int = 8
    d_encoder: int = 512
    encoder_layers: int = 17
    encoder_heads: int = 8
    encoder_ff: int = 2048
    conv_kernel: int = 9
    d_model: int = 192
    transformer_layers: int = 18
    transformer_heads: int = 8
    transformer_ff: int = 768
    max_speakers: int = 4
    # streaming window (in encoder frames, 80 ms each)
    spkcache_len: int = 188
    fifo_len: int = 188
    chunk_len: int = 12


DEV_TINY = SortformerDims(
    n_mels=128, d_encoder=64, encoder_layers=2, encoder_heads=4, encoder_ff=128,
    d_model=32, transformer_layers=2, transformer_heads=4, transformer_ff=64,
    spkcache_len=16, fifo_len=16, chunk_len=4,
)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def _lin(key, i, o, dtype):
    return {
        "w": (jax.random.normal(key, (i, o)) * (i**-0.5)).astype(dtype),
        "b": jnp.zeros((o,), dtype),
    }


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _mha(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {p: _lin(k, d, d, dtype) for p, k in zip("qkvo", ks)}


def _conformer_layer(key, dims: SortformerDims, dtype):
    ks = jax.random.split(key, 6)
    d = dims.d_encoder
    return {
        "ff1_ln": _ln(d, dtype),
        "ff1_a": _lin(ks[0], d, dims.encoder_ff, dtype),
        "ff1_b": _lin(ks[1], dims.encoder_ff, d, dtype),
        "attn_ln": _ln(d, dtype),
        "attn": _mha(ks[2], d, dtype),
        "conv_ln": _ln(d, dtype),
        "conv_pw1": _lin(ks[3], d, 2 * d, dtype),
        "conv_dw": (jax.random.normal(ks[4], (dims.conv_kernel, d)) * 0.1).astype(dtype),
        "conv_pw2": _lin(ks[5], d, d, dtype),
        "ff2_ln": _ln(d, dtype),
        "ff2_a": _lin(ks[0], d, dims.encoder_ff, dtype),
        "ff2_b": _lin(ks[1], dims.encoder_ff, d, dtype),
        "final_ln": _ln(d, dtype),
    }


def _transformer_layer(key, dims: SortformerDims, dtype):
    ks = jax.random.split(key, 3)
    d = dims.d_model
    return {
        "attn_ln": _ln(d, dtype),
        "attn": _mha(ks[0], d, dtype),
        "ff_ln": _ln(d, dtype),
        "ff_a": _lin(ks[1], d, dims.transformer_ff, dtype),
        "ff_b": _lin(ks[2], dims.transformer_ff, d, dtype),
    }


def init_params(dims: SortformerDims, key, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 8)
    stack = lambda items: jax.tree.map(lambda *xs: jnp.stack(xs), *items)
    return {
        "sub1": (jax.random.normal(ks[0], (3, 3, 1, dims.d_encoder // 4)) * 0.1).astype(dtype),
        "sub2": (jax.random.normal(ks[1], (3, 3, dims.d_encoder // 4, dims.d_encoder // 4)) * 0.1).astype(dtype),
        "sub3": (jax.random.normal(ks[2], (3, 3, dims.d_encoder // 4, dims.d_encoder // 4)) * 0.1).astype(dtype),
        "sub_out": _lin(ks[3], dims.d_encoder // 4 * (dims.n_mels // 8), dims.d_encoder, dtype),
        "conformer": stack(
            [_conformer_layer(k, dims, dtype) for k in jax.random.split(ks[4], dims.encoder_layers)]
        ),
        "proj": _lin(ks[5], dims.d_encoder, dims.d_model, dtype),
        "transformer": stack(
            [_transformer_layer(k, dims, dtype) for k in jax.random.split(ks[6], dims.transformer_layers)]
        ),
        "head1": _lin(ks[7], dims.d_model, dims.d_model, dtype),
        "head2": _lin(jax.random.split(ks[7])[0], dims.d_model, dims.max_speakers, dtype),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    out = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(xf.var(-1, keepdims=True) + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    return (jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]).astype(x.dtype)


def _attend(x, p, n_head, mask=None):
    B, T, d = x.shape
    dh = d // n_head
    q = _dense(x, p["q"]).reshape(B, T, n_head, dh)
    k = _dense(x, p["k"]).reshape(B, T, n_head, dh)
    v = _dense(x, p["v"]).reshape(B, T, n_head, dh)
    scores = jnp.einsum("bshd,bthd->bhst", q, k).astype(jnp.float32) * (dh**-0.5)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhst,bthd->bshd", probs, v).reshape(B, T, d)
    return _dense(out, p["o"])


def subsample(params, mel: jnp.ndarray, dims: SortformerDims) -> jnp.ndarray:
    """mel [B, T, n_mels] → features [B, T//8, d_encoder] (3 stride-2 convs)."""
    x = mel[..., None]  # NHWC: [B, T, mels, 1]
    for kern in (params["sub1"], params["sub2"], params["sub3"]):
        x = jax.lax.conv_general_dilated(
            x, kern, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x)
    B, T8, M8, C = x.shape
    return _dense(x.reshape(B, T8, M8 * C), params["sub_out"])


def conformer(params, x: jnp.ndarray, dims: SortformerDims) -> jnp.ndarray:
    n_head = dims.encoder_heads
    K = dims.conv_kernel

    def layer(x, p):
        x = x + 0.5 * _dense(jax.nn.silu(_dense(_layer_norm(x, p["ff1_ln"]), p["ff1_a"])), p["ff1_b"])
        x = x + _attend(_layer_norm(x, p["attn_ln"]), p["attn"], n_head)
        # conv module: pointwise GLU → depthwise → pointwise
        h = _layer_norm(x, p["conv_ln"])
        h = _dense(h, p["conv_pw1"])
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)
        # depthwise conv over time
        pad = K // 2
        hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
        windows = jnp.stack([hp[:, i : i + h.shape[1]] for i in range(K)], axis=-1)
        h = jnp.einsum("btdk,kd->btd", windows, p["conv_dw"].T.swapaxes(0, 1))
        h = jax.nn.silu(h)
        x = x + _dense(h, p["conv_pw2"])
        x = x + 0.5 * _dense(jax.nn.silu(_dense(_layer_norm(x, p["ff2_ln"]), p["ff2_a"])), p["ff2_b"])
        return _layer_norm(x, p["final_ln"]), None

    x, _ = jax.lax.scan(layer, x, params["conformer"])
    return x


def sortformer_head(params, x: jnp.ndarray, dims: SortformerDims) -> jnp.ndarray:
    """features [B, T, d_encoder] → speaker probabilities [B, T, max_speakers]."""
    x = _dense(x, params["proj"])

    def layer(x, p):
        x = x + _attend(_layer_norm(x, p["attn_ln"]), p["attn"], dims.transformer_heads)
        x = x + _dense(jax.nn.relu(_dense(_layer_norm(x, p["ff_ln"]), p["ff_a"])), p["ff_b"])
        return x, None

    x, _ = jax.lax.scan(layer, x, params["transformer"])
    h = jax.nn.relu(_dense(x, params["head1"]))
    return jax.nn.sigmoid(_dense(h, params["head2"]).astype(jnp.float32))


def forward(params, mel: jnp.ndarray, dims: SortformerDims) -> jnp.ndarray:
    """mel [B, T, n_mels] → [B, T//subsampling, max_speakers] probabilities."""
    feats = subsample(params, mel, dims)
    feats = conformer(params, feats, dims)
    return sortformer_head(params, feats, dims)


# ---------------------------------------------------------------------------
# Streaming state machine (arrival-order speaker cache)
# ---------------------------------------------------------------------------


class StreamingState(NamedTuple):
    spkcache: jnp.ndarray      # [B, spkcache_len, n_mels*sub] packed mel frames
    spkcache_len: jnp.ndarray  # [B] valid frames
    fifo: jnp.ndarray          # [B, fifo_len, n_mels*sub]
    fifo_len: jnp.ndarray      # [B]


def init_state(dims: SortformerDims, batch: int, dtype=jnp.float32) -> StreamingState:
    fw = dims.n_mels * dims.subsampling
    return StreamingState(
        spkcache=jnp.zeros((batch, dims.spkcache_len, fw), dtype),
        spkcache_len=jnp.zeros((batch,), jnp.int32),
        fifo=jnp.zeros((batch, dims.fifo_len, fw), dtype),
        fifo_len=jnp.zeros((batch,), jnp.int32),
    )


@partial(jax.jit, static_argnames=("dims",))
def streaming_step(
    params,
    state: StreamingState,
    chunk_mel: jnp.ndarray,  # [B, chunk_len*subsampling, n_mels]
    dims: SortformerDims,
) -> Tuple[jnp.ndarray, StreamingState]:
    """One streaming step: returns chunk speaker probs [B, chunk_len, S].

    Runs the model over [spkcache | fifo | chunk] (mel domain), emits the
    chunk's predictions, appends the chunk to the FIFO, and when the FIFO
    overflows, compresses its most speaker-confident frames into the cache.
    """
    B = chunk_mel.shape[0]
    fw = dims.n_mels * dims.subsampling
    chunk_packed = chunk_mel.reshape(B, dims.chunk_len, fw)

    # assemble [cache | fifo | chunk] with validity masks
    full = jnp.concatenate([state.spkcache, state.fifo, chunk_packed], axis=1)
    mel_seq = full.reshape(B, -1, dims.n_mels)
    probs = forward(params, mel_seq, dims)  # [B, total, S]

    chunk_probs = probs[:, -dims.chunk_len :]

    # --- update FIFO: append chunk; on overflow, spill oldest into cache ---
    cat = jnp.concatenate([state.fifo, chunk_packed], axis=1)  # [B, F+C, fw]
    new_fifo_len = state.fifo_len + dims.chunk_len
    overflow = jnp.maximum(new_fifo_len - dims.fifo_len, 0)  # [B]

    idx = jnp.arange(dims.fifo_len)[None, :] + overflow[:, None]
    fifo = jnp.take_along_axis(cat, idx[..., None], axis=1)

    # spilled frames (up to chunk_len per step) go to the speaker cache,
    # importance-weighted by their max speaker confidence
    spill_idx = jnp.arange(dims.chunk_len)[None, :]
    spill_valid = spill_idx < overflow[:, None]
    spilled = cat[:, : dims.chunk_len]
    fifo_probs = probs[:, dims.spkcache_len : dims.spkcache_len + dims.chunk_len]
    conf = jnp.max(fifo_probs, axis=-1) * spill_valid  # [B, chunk_len]

    # cache insert: keep top-(spkcache_len) frames by confidence among
    # existing cache (confidence decayed) + spilled frames
    cache_conf = jnp.where(
        jnp.arange(dims.spkcache_len)[None, :] < state.spkcache_len[:, None], 0.5, -1.0
    )
    all_frames = jnp.concatenate([state.spkcache, spilled], axis=1)
    all_conf = jnp.concatenate([cache_conf, jnp.where(spill_valid, conf, -1.0)], axis=1)
    top_conf, top_idx = jax.lax.top_k(all_conf, dims.spkcache_len)
    # preserve arrival order within the cache
    order = jnp.sort(jnp.where(top_conf > 0, top_idx, 2**30), axis=1)
    safe = jnp.minimum(order, all_frames.shape[1] - 1)
    spkcache = jnp.take_along_axis(all_frames, safe[..., None], axis=1)
    spkcache = jnp.where((order < 2**30)[..., None], spkcache, 0.0)
    spkcache_len = jnp.sum(order < 2**30, axis=1).astype(jnp.int32)

    new_state = StreamingState(
        spkcache=spkcache,
        spkcache_len=spkcache_len,
        fifo=fifo,
        fifo_len=jnp.minimum(new_fifo_len, dims.fifo_len),
    )
    return chunk_probs, new_state


def convert_nemo_state_dict(sd: Dict[str, np.ndarray], dims: SortformerDims):
    """NeMo diar_streaming_sortformer_4spk-v2 → this pytree. Pending: the
    checkpoint is not downloadable on zero-egress hosts; the mapping will be
    completed against the real state dict (keys: preprocessor.*,
    encoder.layers.N.*, sortformer_modules.*, transformer_encoder.*)."""
    raise NotImplementedError("requires the NeMo checkpoint to finalize key mapping")
