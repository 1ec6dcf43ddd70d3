"""Streaming Sortformer diarization in JAX (NeMo-faithful architecture).

End-to-end speaker diarization with arrival-order speaker outputs
(Sortformer, arXiv:2409.06656; the streaming variant the reference runs via
NeMo — reference diarization/sortformer_backend.py:50-128 configuration,
:130-336 per-chunk streaming). Architecture mirrors NVIDIA
``diar_streaming_sortformer_4spk-v2`` so its checkpoint converts directly:

    mel (128 bands, 10 ms) → dw-striding conv subsampling (×8)
    → conformer encoder (rel-pos MHA, GLU conv module w/ batch-norm)
    → encoder_proj (512→192) → post-LN transformer over
      [speaker-cache | FIFO | chunk] embeddings → sigmoid heads (≤4 spk)

Streaming: the conformer runs ONLY on each new chunk (with mel left
context); 192-d chunk embeddings append to a FIFO; on overflow the popped
frames compress into a bounded speaker cache by per-speaker confidence
quota (arrival order preserved), silence frames average into a running
silence embedding used as cache padding. State is an explicit pytree, so
the step is one jitted call and lanes batch like ASR lanes do.

Weight conversion: ``convert_nemo_state_dict`` maps the NeMo checkpoint
(``model_weights.ckpt`` inside the ``.nemo`` tar; no NeMo install needed) —
batch-norm is folded into the conv module at load. Unmappable keys raise.
Numerical parity vs NeMo requires the real checkpoint (zero-egress hosts
can't fetch it); the tests pin shapes, mapping completeness, BN folding,
determinism and the bounded-state machine.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SortformerDims:
    n_mels: int = 128
    subsampling: int = 8
    subsampling_channels: int = 256
    d_encoder: int = 512
    encoder_layers: int = 18
    encoder_heads: int = 8
    encoder_ff: int = 2048
    conv_kernel: int = 9
    d_model: int = 192            # fc_d_model: transformer-head hidden
    head_layers: int = 18
    head_heads: int = 8
    head_ff: int = 768
    max_speakers: int = 4
    # streaming geometry (reference sortformer_backend.py:117-124)
    spkcache_len: int = 188
    fifo_len: int = 188
    spkcache_update_period: int = 144
    chunk_mel_frames: int = 100   # 1.0 s chunks at 10 ms hop
    left_ctx_mel_frames: int = 99 # mel left context carried between chunks


DEV_TINY = SortformerDims(
    n_mels=64, subsampling_channels=16, d_encoder=32, encoder_layers=2,
    encoder_heads=4, encoder_ff=64, d_model=16, head_layers=2, head_heads=4,
    head_ff=32, spkcache_len=16, fifo_len=12, spkcache_update_period=8,
    chunk_mel_frames=40, left_ctx_mel_frames=23,
)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def _lin(key, i, o, dtype, bias=True):
    p = {"w": (jax.random.normal(key, (i, o)) * (i**-0.5)).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((o,), dtype)
    return p


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _conformer_layer(key, dims: SortformerDims, dtype):
    ks = jax.random.split(key, 10)
    d, dh = dims.d_encoder, dims.d_encoder // dims.encoder_heads
    return {
        "ff1_ln": _ln(d, dtype),
        "ff1_in": _lin(ks[0], d, dims.encoder_ff, dtype),
        "ff1_out": _lin(ks[1], dims.encoder_ff, d, dtype),
        "attn_ln": _ln(d, dtype),
        "attn": {
            "q": _lin(ks[2], d, d, dtype),
            "k": _lin(ks[3], d, d, dtype),
            "v": _lin(ks[4], d, d, dtype),
            "o": _lin(ks[5], d, d, dtype),
            "pos": _lin(ks[6], d, d, dtype, bias=False),
            "bias_u": jnp.zeros((dims.encoder_heads, dh), dtype),
            "bias_v": jnp.zeros((dims.encoder_heads, dh), dtype),
        },
        "conv_ln": _ln(d, dtype),
        "conv_pw1": _lin(ks[7], d, 2 * d, dtype),
        "conv_dw": {
            "w": (jax.random.normal(ks[8], (dims.conv_kernel, d)) * 0.1).astype(dtype),
            "b": jnp.zeros((d,), dtype),
        },
        # batch norm folded at load; identity at init
        "conv_bn_scale": jnp.ones((d,), dtype),
        "conv_bn_bias": jnp.zeros((d,), dtype),
        "conv_pw2": _lin(ks[9], d, d, dtype),
        "ff2_ln": _ln(d, dtype),
        "ff2_in": _lin(ks[0], d, dims.encoder_ff, dtype),
        "ff2_out": _lin(ks[1], dims.encoder_ff, d, dtype),
        "out_ln": _ln(d, dtype),
    }


def _head_layer(key, dims: SortformerDims, dtype):
    ks = jax.random.split(key, 6)
    d = dims.d_model
    return {
        "attn": {p: _lin(k, d, d, dtype) for p, k in zip("qkvo", ks[:4])},
        "ln1": _ln(d, dtype),
        "ff_in": _lin(ks[4], d, dims.head_ff, dtype),
        "ff_out": _lin(ks[5], dims.head_ff, d, dtype),
        "ln2": _ln(d, dtype),
    }


def init_params(dims: SortformerDims, key, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 10)
    C = dims.subsampling_channels
    stack = lambda items: jax.tree.map(lambda *xs: jnp.stack(xs), *items)
    f_sub = dims.n_mels
    for _ in range(3):
        f_sub = -(-f_sub // 2)  # ceil div per stride-2 stage
    return {
        # dw-striding subsampling (NeMo ConvSubsampling): full conv, then
        # two (depthwise, pointwise) stages, ReLU between
        "sub0": {"w": (jax.random.normal(ks[0], (3, 3, 1, C)) * 0.2).astype(dtype),
                 "b": jnp.zeros((C,), dtype)},
        "sub1_dw": {"w": (jax.random.normal(ks[1], (3, 3, 1, C)) * 0.2).astype(dtype),
                    "b": jnp.zeros((C,), dtype)},
        "sub1_pw": {"w": (jax.random.normal(ks[2], (1, 1, C, C)) * (C**-0.5)).astype(dtype),
                    "b": jnp.zeros((C,), dtype)},
        "sub2_dw": {"w": (jax.random.normal(ks[3], (3, 3, 1, C)) * 0.2).astype(dtype),
                    "b": jnp.zeros((C,), dtype)},
        "sub2_pw": {"w": (jax.random.normal(ks[4], (1, 1, C, C)) * (C**-0.5)).astype(dtype),
                    "b": jnp.zeros((C,), dtype)},
        "sub_out": _lin(ks[5], C * f_sub, dims.d_encoder, dtype),
        "conformer": stack(
            [_conformer_layer(k, dims, dtype) for k in jax.random.split(ks[6], dims.encoder_layers)]
        ),
        "proj": _lin(ks[7], dims.d_encoder, dims.d_model, dtype),
        "head": stack(
            [_head_layer(k, dims, dtype) for k in jax.random.split(ks[8], dims.head_layers)]
        ),
        "spk_mid": _lin(ks[9], dims.d_model, dims.d_model, dtype),
        "spk_out": _lin(jax.random.split(ks[9])[0], dims.d_model, dims.max_speakers, dtype),
    }


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    out = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(xf.var(-1, keepdims=True) + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _conv2d(x, p, stride, groups=1, pad=0):
    # NeMo's dw-striding stack uses EXPLICIT symmetric padding
    # (nn.Conv2d(..., padding=1)), not XLA SAME: for even lengths SAME pads
    # (0,1) while torch pads (1,1) — a one-frame alignment difference that
    # would silently break checkpoint parity.
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def subsample(params, mel: jnp.ndarray, dims: SortformerDims) -> jnp.ndarray:
    """mel [B, T, n_mels] → [B, ceil(T/8), d_encoder] (dw-striding ×8).

    Mirrors NeMo ConvSubsampling(subsampling='dw_striding') exactly: 3×3
    stride-2 convs with padding=1, ReLU after the full conv and after each
    pointwise, and the output flattened CHANNEL-major (torch
    ``x.transpose(1, 2).reshape(b, t, -1)``) before the out linear —
    pinned by tests/test_sortformer_layout_spec.py against torch.nn.functional.
    """
    C = dims.subsampling_channels
    x = mel[..., None]  # [B, T, mels, 1]
    x = jax.nn.relu(_conv2d(x, params["sub0"], 2, pad=1))
    x = _conv2d(x, params["sub1_dw"], 2, groups=C, pad=1)
    x = jax.nn.relu(_conv2d(x, params["sub1_pw"], 1))
    x = _conv2d(x, params["sub2_dw"], 2, groups=C, pad=1)
    x = jax.nn.relu(_conv2d(x, params["sub2_pw"], 1))
    B, T8, M8, _ = x.shape
    x = jnp.swapaxes(x, 2, 3).reshape(B, T8, C * M8)  # c-major like torch
    return _dense(x, params["sub_out"])


def _relpos_table(length: int, d: int) -> np.ndarray:
    """NeMo RelPositionalEncoding: interleaved sin/cos for positions
    length-1 … -(length-1), shape [2*length-1, d]."""
    pos = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(math.log(10000.0) / d))
    pe = np.zeros((2 * length - 1, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,T,2T-1] → [B,H,T,2T-1] with the Transformer-XL index shift."""
    b, h, t, p2 = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, p2 + 1, t)[:, :, 1:]
    return x.reshape(b, h, t, p2)


def _relpos_attend(x, p, pos_emb, n_head):
    """NeMo RelPositionMultiHeadAttention (Transformer-XL scoring)."""
    B, T, d = x.shape
    dh = d // n_head
    q = _dense(x, p["q"]).reshape(B, T, n_head, dh)
    k = _dense(x, p["k"]).reshape(B, T, n_head, dh)
    v = _dense(x, p["v"]).reshape(B, T, n_head, dh)
    pe = _dense(pos_emb, p["pos"]).reshape(1, -1, n_head, dh)  # [1, 2T-1, H, dh]

    q_u = q + p["bias_u"].astype(q.dtype)[None, None]
    q_v = q + p["bias_v"].astype(q.dtype)[None, None]
    ac = jnp.einsum("bshd,bthd->bhst", q_u, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("bshd,xthd->bhst", q_v, pe, preferred_element_type=jnp.float32)
    bd = _rel_shift(bd)[..., :T]
    scores = (ac + bd) * (dh**-0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhst,bthd->bshd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return _dense(out.reshape(B, T, d), p["o"])


def conformer(params, x: jnp.ndarray, dims: SortformerDims) -> jnp.ndarray:
    """[B, T, d_encoder] → same shape; NeMo ConformerLayer ordering."""
    n_head = dims.encoder_heads
    K = dims.conv_kernel
    x = x * math.sqrt(dims.d_encoder)  # NeMo xscale on the pos-enc input
    pos_emb = jnp.asarray(_relpos_table(x.shape[1], dims.d_encoder)).astype(x.dtype)

    def layer(x, p):
        x = x + 0.5 * _dense(jax.nn.silu(_dense(_layer_norm(x, p["ff1_ln"]), p["ff1_in"])), p["ff1_out"])
        x = x + _relpos_attend(_layer_norm(x, p["attn_ln"]), p["attn"], pos_emb, n_head)
        # conv module: pointwise GLU → depthwise → (folded) BN → swish → pointwise
        h = _layer_norm(x, p["conv_ln"])
        h = _dense(h, p["conv_pw1"])
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)
        pad = K // 2
        hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
        windows = jnp.stack([hp[:, i : i + h.shape[1]] for i in range(K)], axis=-1)
        h = jnp.einsum("btdk,kd->btd", windows, p["conv_dw"]["w"]) + p["conv_dw"]["b"]
        h = h * p["conv_bn_scale"] + p["conv_bn_bias"]
        h = jax.nn.silu(h)
        x = x + _dense(h, p["conv_pw2"])
        x = x + 0.5 * _dense(jax.nn.silu(_dense(_layer_norm(x, p["ff2_ln"]), p["ff2_in"])), p["ff2_out"])
        return _layer_norm(x, p["out_ln"]), None

    x, _ = jax.lax.scan(layer, x, params["conformer"])
    return x


def encode_chunk(params, mel: jnp.ndarray, dims: SortformerDims) -> jnp.ndarray:
    """mel chunk [B, T_mel, n_mels] → projected embeddings [B, T_mel/8, d_model]."""
    feats = subsample(params, mel, dims)
    feats = conformer(params, feats, dims)
    return _dense(feats, params["proj"])


def head_predict(
    params, emb: jnp.ndarray, dims: SortformerDims,
    valid: Optional[jnp.ndarray] = None,  # [B, T] bool — attendable positions
) -> jnp.ndarray:
    """192-d embeddings [B, T, d_model] → speaker probs [B, T, S]
    (post-LN transformer + 2-layer sigmoid head). ``valid`` masks the
    static-shape padding inside [spkcache | fifo | chunk] out of attention."""
    attn_mask = None
    if valid is not None:
        attn_mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[:, None, None, :]

    def layer(x, p):
        B, T, d = x.shape
        dh = d // dims.head_heads
        q = _dense(x, p["attn"]["q"]).reshape(B, T, dims.head_heads, dh)
        k = _dense(x, p["attn"]["k"]).reshape(B, T, dims.head_heads, dh)
        v = _dense(x, p["attn"]["v"]).reshape(B, T, dims.head_heads, dh)
        scores = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
        scores = scores * (dh**-0.5)
        if attn_mask is not None:
            scores = scores + attn_mask
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum(
            "bhst,bthd->bshd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        attn = _dense(attn.reshape(B, T, d), p["attn"]["o"])
        x = _layer_norm(x + attn, p["ln1"])
        ff = _dense(jax.nn.relu(_dense(x, p["ff_in"])), p["ff_out"])
        return _layer_norm(x + ff, p["ln2"]), None

    x, _ = jax.lax.scan(layer, emb, params["head"])
    h = jax.nn.relu(_dense(x, params["spk_mid"]))
    return jax.nn.sigmoid(_dense(h, params["spk_out"]).astype(jnp.float32))


def forward(params, mel: jnp.ndarray, dims: SortformerDims) -> jnp.ndarray:
    """Offline: mel [B, T, n_mels] → [B, T/8, S] speaker probabilities."""
    return head_predict(params, encode_chunk(params, mel, dims), dims)


# ---------------------------------------------------------------------------
# Streaming state machine (embedding-domain cache/FIFO, NeMo semantics)
# ---------------------------------------------------------------------------


class StreamingState(NamedTuple):
    spkcache: jnp.ndarray       # [B, spkcache_len, d_model]
    spkcache_preds: jnp.ndarray # [B, spkcache_len, S]
    spkcache_len: jnp.ndarray   # [B]
    fifo: jnp.ndarray           # [B, fifo_len, d_model]
    fifo_len: jnp.ndarray       # [B]
    mean_sil_emb: jnp.ndarray   # [B, d_model]
    n_sil_frames: jnp.ndarray   # [B]


def init_state(dims: SortformerDims, batch: int, dtype=jnp.float32) -> StreamingState:
    return StreamingState(
        spkcache=jnp.zeros((batch, dims.spkcache_len, dims.d_model), dtype),
        spkcache_preds=jnp.zeros((batch, dims.spkcache_len, dims.max_speakers), jnp.float32),
        spkcache_len=jnp.zeros((batch,), jnp.int32),
        fifo=jnp.zeros((batch, dims.fifo_len, dims.d_model), dtype),
        fifo_len=jnp.zeros((batch,), jnp.int32),
        mean_sil_emb=jnp.zeros((batch, dims.d_model), dtype),
        n_sil_frames=jnp.zeros((batch,), jnp.int32),
    )


def _compress_into_cache(state: StreamingState, popped, popped_preds, popped_valid, dims):
    """Merge popped FIFO frames into the bounded speaker cache: per-speaker
    confidence quota over [cache | popped], arrival order preserved; frames
    confidently silent feed the running silence embedding."""
    B = popped.shape[0]
    S = dims.max_speakers
    Lc, Lp = dims.spkcache_len, popped.shape[1]
    L = Lc + Lp

    cache_valid = jnp.arange(Lc)[None, :] < state.spkcache_len[:, None]
    cand = jnp.concatenate([state.spkcache, popped], axis=1)              # [B,L,D]
    cand_preds = jnp.concatenate([state.spkcache_preds, popped_preds], axis=1)
    valid = jnp.concatenate([cache_valid, popped_valid], axis=1)          # [B,L]

    # silence bookkeeping: popped frames with no confident speaker
    sil = popped_valid & (jnp.max(popped_preds, axis=-1) < 0.5)
    sil_sum = jnp.einsum("bl,bld->bd", sil.astype(popped.dtype), popped)
    n_sil = state.n_sil_frames + jnp.sum(sil, axis=1).astype(jnp.int32)
    mean_sil = jnp.where(
        (n_sil > 0)[:, None],
        (state.mean_sil_emb * state.n_sil_frames[:, None].astype(popped.dtype) + sil_sum)
        / jnp.maximum(n_sil, 1)[:, None].astype(popped.dtype),
        state.mean_sil_emb,
    )

    # per-speaker quota selection
    quota = max(dims.spkcache_len // S, 1)
    keep = jnp.zeros((B, L), bool)
    for s in range(S):
        score = jnp.where(valid, cand_preds[..., s], -jnp.inf)
        _, idx = jax.lax.top_k(score, quota)
        ok = jnp.take_along_axis(score, idx, axis=1) > 0.05  # ignore near-zero
        onehot = jnp.zeros((B, L), bool).at[jnp.arange(B)[:, None], idx].max(ok)
        keep = keep | onehot

    # arrival order: sort kept indices, take the first spkcache_len
    pos = jnp.where(keep, jnp.arange(L)[None, :], L + 1)
    order = jnp.sort(pos, axis=1)[:, : Lc]
    safe = jnp.minimum(order, L - 1)
    new_cache = jnp.take_along_axis(cand, safe[..., None], axis=1)
    new_preds = jnp.take_along_axis(cand_preds, safe[..., None], axis=1)
    kept = order <= L
    n_kept = jnp.sum(kept, axis=1).astype(jnp.int32)
    # pad with the mean silence embedding (NeMo pads the cache with it)
    new_cache = jnp.where(kept[..., None], new_cache, mean_sil[:, None, :])
    new_preds = jnp.where(kept[..., None], new_preds, 0.0)

    return StreamingState(
        spkcache=new_cache,
        spkcache_preds=new_preds,
        spkcache_len=n_kept,
        fifo=state.fifo,
        fifo_len=state.fifo_len,
        mean_sil_emb=mean_sil,
        n_sil_frames=n_sil,
    )


@partial(jax.jit, static_argnames=("dims", "ctx_frames"))
def streaming_step(
    params,
    state: StreamingState,
    mel: jnp.ndarray,   # [B, ctx+chunk mel frames, n_mels]
    dims: SortformerDims,
    ctx_frames: int = 0,  # leading mel frames to drop from the outputs
) -> Tuple[jnp.ndarray, StreamingState]:
    """One streaming step. Returns (chunk speaker probs [B, n_chunk, S],
    new state). The conformer runs only on [left ctx | chunk]; the head runs
    over [spkcache | fifo | chunk] embeddings."""
    emb_all = encode_chunk(params, mel, dims)           # [B, T8, d_model]
    drop = _ceil_div3(ctx_frames)
    chunk_emb = emb_all[:, drop:]
    n_chunk = chunk_emb.shape[1]
    B = mel.shape[0]
    Lc, Lf = dims.spkcache_len, dims.fifo_len

    # static-shape padding inside [cache | fifo | chunk] is masked out of the
    # head's attention (valid = filled cache rows + filled fifo rows + chunk)
    pos_c = jnp.arange(Lc)[None, :] < state.spkcache_len[:, None]
    pos_f = jnp.arange(Lf)[None, :] < state.fifo_len[:, None]
    valid = jnp.concatenate(
        [pos_c, pos_f, jnp.ones((B, n_chunk), bool)], axis=1
    )
    seq = jnp.concatenate([state.spkcache, state.fifo, chunk_emb], axis=1)
    preds = head_predict(params, seq, dims, valid=valid)  # [B, Lc+Lf+n, S]
    chunk_preds = preds[:, -n_chunk:]
    fifo_preds = preds[:, Lc : Lc + Lf]

    # append the chunk AT fifo_len (valid-timeline semantics): output slot i
    # holds valid position i+overflow of [old fifo | chunk]; the first
    # `overflow` valid positions pop into the speaker cache
    new_len = state.fifo_len + n_chunk
    overflow = jnp.maximum(new_len - Lf, 0)  # [B], <= n_chunk
    src = jnp.arange(Lf)[None, :] + overflow[:, None]          # [B, Lf]
    from_old = src < state.fifo_len[:, None]
    old_vals = jnp.take_along_axis(
        state.fifo, jnp.minimum(src, Lf - 1)[..., None], axis=1
    )
    chunk_src = jnp.clip(src - state.fifo_len[:, None], 0, n_chunk - 1)
    chunk_vals = jnp.take_along_axis(chunk_emb, chunk_src[..., None], axis=1)
    in_range = src < new_len[:, None]
    fifo = jnp.where(
        from_old[..., None], old_vals,
        jnp.where(in_range[..., None], chunk_vals, 0.0),
    )

    pop_idx = jnp.arange(n_chunk)[None, :]
    popped_valid = pop_idx < overflow[:, None]
    # popped frames are the oldest valid fifo rows (slots 0..overflow)
    popped = state.fifo[:, :n_chunk]
    popped_preds = fifo_preds[:, :n_chunk]

    state = StreamingState(
        spkcache=state.spkcache,
        spkcache_preds=state.spkcache_preds,
        spkcache_len=state.spkcache_len,
        fifo=fifo,
        fifo_len=jnp.minimum(new_len, dims.fifo_len),
        mean_sil_emb=state.mean_sil_emb,
        n_sil_frames=state.n_sil_frames,
    )
    state = jax.lax.cond(
        jnp.any(popped_valid),
        lambda st: _compress_into_cache(st, popped, popped_preds, popped_valid, dims),
        lambda st: st,
        state,
    )
    return chunk_preds, state


def _ceil_div3(t: int) -> int:
    for _ in range(3):
        t = -(-t // 2)
    return t


# ---------------------------------------------------------------------------
# NeMo checkpoint conversion
# ---------------------------------------------------------------------------


def read_nemo_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load model_weights.ckpt from a .nemo tar (or a bare .ckpt) without
    NeMo: it is a plain torch state dict."""
    import io
    import tarfile

    import torch

    if str(path).endswith(".nemo"):
        with tarfile.open(path) as tar:
            member = next(
                m for m in tar.getmembers() if m.name.endswith("model_weights.ckpt")
            )
            data = tar.extractfile(member).read()
        sd = torch.load(io.BytesIO(data), map_location="cpu", weights_only=True)
    else:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def dims_from_state_dict(sd: Dict[str, np.ndarray]) -> SortformerDims:
    """Infer model geometry from checkpoint shapes."""
    d_enc = sd["encoder.layers.0.self_attn.linear_q.weight"].shape[0]
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.layers\.(\d+)\.", k))
    )
    ff = sd["encoder.layers.0.feed_forward1.linear1.weight"].shape[0]
    kern = sd["encoder.layers.0.conv.depthwise_conv.weight"].shape[-1]
    sub_c = sd["encoder.pre_encode.conv.0.weight"].shape[0]
    n_mels = sd["encoder.pre_encode.out.weight"].shape[1] // sub_c * 8
    proj_key = next(k for k in sd if k.endswith("encoder_proj.weight"))
    d_model = sd[proj_key].shape[0]
    head_layers = 1 + max(
        (int(m.group(1)) for k in sd
         if (m := re.match(r"transformer_encoder\.layers\.(\d+)\.", k))),
        default=-1,
    )
    head_ff_keys = [k for k in sd if re.match(r"transformer_encoder\.layers\.0\..*dense_in.*weight", k)]
    head_ff = sd[head_ff_keys[0]].shape[0] if head_ff_keys else 4 * d_model
    spk_key = next(
        (k for k in sd if k.startswith("sortformer_modules") and k.endswith(".weight")
         and sd[k].shape[0] <= 8 and sd[k].ndim == 2),
        None,
    )
    n_spk = sd[spk_key].shape[0] if spk_key else 4
    heads = sd["encoder.layers.0.self_attn.pos_bias_u"].shape[0]
    return SortformerDims(
        n_mels=n_mels, subsampling_channels=sub_c, d_encoder=d_enc,
        encoder_layers=n_layers, encoder_heads=heads, encoder_ff=ff,
        conv_kernel=kern, d_model=d_model,
        head_layers=max(head_layers, 0) or 18,
        head_heads=8 if d_model % 8 == 0 else 4,
        head_ff=head_ff, max_speakers=n_spk,
    )


def convert_nemo_state_dict(
    sd: Dict[str, np.ndarray], dims: Optional[SortformerDims] = None, dtype=jnp.float32
) -> Tuple[Dict, SortformerDims]:
    """NeMo ``diar_streaming_sortformer_4spk-v2`` state dict → this pytree.

    Batch norm (conv module) folds into scale/shift; depthwise/pointwise
    convs reshape into the dense forms above. Unmapped parameter keys raise.
    """
    if dims is None:
        dims = dims_from_state_dict(sd)
    used = set()

    def take(name):
        used.add(name)
        return np.asarray(sd[name])

    def lin(prefix, bias=True):
        p = {"w": jnp.asarray(take(f"{prefix}.weight").T, dtype)}
        if bias and f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(take(f"{prefix}.bias"), dtype)
        return p

    def ln(prefix):
        return {"scale": jnp.asarray(take(f"{prefix}.weight"), dtype),
                "bias": jnp.asarray(take(f"{prefix}.bias"), dtype)}

    def conv2d_nhwc(name, depthwise=False):
        w = take(f"{name}.weight")  # torch [O, I/g, kH, kW]
        if depthwise:
            w = w.transpose(2, 3, 1, 0)  # [kH,kW,1,O] → HWIO with groups=O
        else:
            w = w.transpose(2, 3, 1, 0)  # [kH,kW,I,O]
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(take(f"{name}.bias"), dtype)}

    layers = []
    for i in range(dims.encoder_layers):
        p = f"encoder.layers.{i}"
        # fold BN: y = (x - mean)/sqrt(var+eps) * gamma + beta
        gamma = take(f"{p}.conv.batch_norm.weight")
        beta = take(f"{p}.conv.batch_norm.bias")
        mean = take(f"{p}.conv.batch_norm.running_mean")
        var = take(f"{p}.conv.batch_norm.running_var")
        used.add(f"{p}.conv.batch_norm.num_batches_tracked")
        inv = gamma / np.sqrt(var + 1e-5)
        dw = take(f"{p}.conv.depthwise_conv.weight")  # [d, 1, K]
        dw_b = (
            take(f"{p}.conv.depthwise_conv.bias")
            if f"{p}.conv.depthwise_conv.bias" in sd
            else np.zeros(dw.shape[0], np.float32)
        )
        layers.append({
            "ff1_ln": ln(f"{p}.norm_feed_forward1"),
            "ff1_in": lin(f"{p}.feed_forward1.linear1"),
            "ff1_out": lin(f"{p}.feed_forward1.linear2"),
            "attn_ln": ln(f"{p}.norm_self_att"),
            "attn": {
                "q": lin(f"{p}.self_attn.linear_q"),
                "k": lin(f"{p}.self_attn.linear_k"),
                "v": lin(f"{p}.self_attn.linear_v"),
                "o": lin(f"{p}.self_attn.linear_out"),
                "pos": lin(f"{p}.self_attn.linear_pos", bias=False),
                "bias_u": jnp.asarray(take(f"{p}.self_attn.pos_bias_u"), dtype),
                "bias_v": jnp.asarray(take(f"{p}.self_attn.pos_bias_v"), dtype),
            },
            "conv_ln": ln(f"{p}.norm_conv"),
            # pointwise convs are [O, I, 1] → dense [I, O]
            "conv_pw1": {
                "w": jnp.asarray(take(f"{p}.conv.pointwise_conv1.weight")[:, :, 0].T, dtype),
                "b": jnp.asarray(take(f"{p}.conv.pointwise_conv1.bias"), dtype),
            },
            "conv_dw": {
                "w": jnp.asarray(dw[:, 0, :].T, dtype),  # [K, d]
                "b": jnp.asarray(dw_b, dtype),
            },
            "conv_bn_scale": jnp.asarray(inv, dtype),
            "conv_bn_bias": jnp.asarray(beta - mean * inv, dtype),
            "conv_pw2": {
                "w": jnp.asarray(take(f"{p}.conv.pointwise_conv2.weight")[:, :, 0].T, dtype),
                "b": jnp.asarray(take(f"{p}.conv.pointwise_conv2.bias"), dtype),
            },
            "ff2_ln": ln(f"{p}.norm_feed_forward2"),
            "ff2_in": lin(f"{p}.feed_forward2.linear1"),
            "ff2_out": lin(f"{p}.feed_forward2.linear2"),
            "out_ln": ln(f"{p}.norm_out"),
        })

    head_layers = []
    for i in range(dims.head_layers):
        p = f"transformer_encoder.layers.{i}"
        head_layers.append({
            "attn": {
                "q": lin(f"{p}.first_sub_layer.query_net"),
                "k": lin(f"{p}.first_sub_layer.key_net"),
                "v": lin(f"{p}.first_sub_layer.value_net"),
                "o": lin(f"{p}.first_sub_layer.out_projection"),
            },
            "ln1": ln(f"{p}.layer_norm_1"),
            "ff_in": lin(f"{p}.second_sub_layer.dense_in"),
            "ff_out": lin(f"{p}.second_sub_layer.dense_out"),
            "ln2": ln(f"{p}.layer_norm_2"),
        })

    # sortformer head linears located by shape (naming drifts across NeMo
    # versions): the [n_spk, d] matrix is the speaker head; a [d, d] matrix
    # under sortformer_modules (not encoder_proj) is the hidden layer.
    proj_key = next(k for k in sd if k.endswith("encoder_proj.weight"))
    proj_prefix = proj_key[: -len(".weight")]
    spk_out_key = None
    spk_mid_key = None
    for k in sd:
        if not k.startswith("sortformer_modules") or not k.endswith(".weight"):
            continue
        if k == proj_key or sd[k].ndim != 2:
            continue
        if sd[k].shape[0] == dims.max_speakers:
            spk_out_key = k[: -len(".weight")]
        elif sd[k].shape == (dims.d_model, dims.d_model):
            spk_mid_key = k[: -len(".weight")]
    if spk_out_key is None:
        raise ValueError("speaker output head not found under sortformer_modules.*")

    stack = lambda items: jax.tree.map(lambda *xs: jnp.stack(xs), *items)
    params = {
        "sub0": conv2d_nhwc("encoder.pre_encode.conv.0"),
        "sub1_dw": conv2d_nhwc("encoder.pre_encode.conv.2", depthwise=True),
        "sub1_pw": conv2d_nhwc("encoder.pre_encode.conv.3"),
        "sub2_dw": conv2d_nhwc("encoder.pre_encode.conv.5", depthwise=True),
        "sub2_pw": conv2d_nhwc("encoder.pre_encode.conv.6"),
        "sub_out": lin("encoder.pre_encode.out"),
        "conformer": stack(layers),
        "proj": lin(proj_prefix),
        "head": stack(head_layers),
        "spk_mid": lin(spk_mid_key) if spk_mid_key else {
            "w": jnp.eye(dims.d_model, dtype=dtype), "b": jnp.zeros((dims.d_model,), dtype)
        },
        "spk_out": lin(spk_out_key),
    }

    leftover = sorted(
        k for k in sd
        if k not in used
        and not any(s in k for s in ("preprocessor", "loss", "_fifo", "position"))
    )
    if leftover:
        raise ValueError(
            f"unmapped checkpoint keys ({len(leftover)}): {leftover[:10]}"
        )
    return params, dims
