"""Whisper encoder/decoder as pure JAX functions over a parameter pytree.

TPU-first redesign of the reference's torch module (reference
whisper/model.py:25-408). Key inversions:

- **State out of the model**: the KV cache is an explicit pytree argument
  with per-lane write positions, so one jitted ``decode`` serves many
  concurrent sessions at different decode depths (the multi-session batch
  scheduler packs lanes; reference keeps a python dict cache per session).
- **Stacked layers + lax.scan**: all transformer blocks live in one pytree
  with a leading layer axis; the forward scans over it, so compile time and
  code size are O(1) in depth (32-layer large-v3 compiles like tiny).
- **Alignment attention in-graph**: instead of returning every layer's
  cross-attention (reference ``return_cross_attn`` plumbing,
  whisper/model.py:281-332), the registered alignment heads' post-softmax
  probabilities are accumulated into a fixed [K,B,S,T] buffer inside the
  layer scan — the only attention that ever leaves the device.
- Static shapes everywhere: mel is [B, n_mels, 3000], encoder output
  [B, 1500, D], cache [L, B, n_text_ctx, H, Dh]; per-lane masks handle
  ragged reality.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dims import ModelDimensions

Params = Dict[str, jnp.ndarray]

#: lax.scan unroll factors for the layer loops — unrolling lets XLA overlap
#: one layer's weight/cross-KV HBM streaming with the previous layer's
#: compute (the decode step measured ~2x its bandwidth floor without it).
#: Module-level so perf scripts can sweep them before tracing.
ENCODER_SCAN_UNROLL = 1
DECODER_SCAN_UNROLL = 1

#: Use the Pallas flash self-attention kernel in the encoder on TPU. XLA
#: materializes [B,H,T,T] f32 scores per layer (~4.3 GB at large-v3 B=24
#: full-window), which makes the anchor encode run ~2.5x its matmul floor;
#: the kernel keeps score tiles in VMEM (ops/flash_encoder.py).
ENCODER_FLASH_ATTN = True


def _flash_attn_available(T: int, dh: int) -> bool:
    """Kernel preconditions: TPU backend, lane-aligned T, supported head dim."""
    if not ENCODER_FLASH_ATTN or jax.default_backend() != "tpu":
        return False
    return T % 128 == 0 and dh in (64, 128)


# ---------------------------------------------------------------------------
# Parameter initialization (tests / benchmarks; real weights come from load.py)
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, dtype, bias=True):
    k1, _ = jax.random.split(key)
    w = jax.random.normal(k1, (d_in, d_out), dtype=jnp.float32) * (d_in**-0.5)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _attn_params(key, d, dtype):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": _linear(kq, d, d, dtype),
        "k": _linear(kk, d, d, dtype, bias=False),
        "v": _linear(kv, d, d, dtype),
        "o": _linear(ko, d, d, dtype),
    }


def _block_params(key, d, dtype, cross: bool):
    keys = jax.random.split(key, 4)
    p = {
        "attn_ln": _ln(d, dtype),
        "attn": _attn_params(keys[0], d, dtype),
        "mlp_ln": _ln(d, dtype),
        "mlp": {
            "fc1": _linear(keys[1], d, 4 * d, dtype),
            "fc2": _linear(keys[2], 4 * d, d, dtype),
        },
    }
    if cross:
        p["cross_ln"] = _ln(d, dtype)
        p["cross"] = _attn_params(keys[3], d, dtype)
    return p


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def init_params(dims: ModelDimensions, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-initialized parameter pytree with the production layout."""
    ke, kd, kc1, kc2, kt = jax.random.split(key, 5)
    d_a, d_t = dims.n_audio_state, dims.n_text_state

    enc_blocks = _stack(
        [
            _block_params(k, d_a, dtype, cross=False)
            for k in jax.random.split(ke, dims.n_audio_layer)
        ]
    )
    dec_blocks = _stack(
        [
            _block_params(k, d_t, dtype, cross=True)
            for k in jax.random.split(kd, dims.n_text_layer)
        ]
    )
    conv_scale = (3 * dims.n_mels) ** -0.5
    return {
        "encoder": {
            "conv1": {
                "w": (jax.random.normal(kc1, (d_a, dims.n_mels, 3)) * conv_scale).astype(dtype),
                "b": jnp.zeros((d_a,), dtype),
            },
            "conv2": {
                "w": (jax.random.normal(kc2, (d_a, d_a, 3)) * (3 * d_a) ** -0.5).astype(dtype),
                "b": jnp.zeros((d_a,), dtype),
            },
            "blocks": enc_blocks,
            "ln_post": _ln(d_a, dtype),
        },
        "decoder": {
            "tok_emb": (jax.random.normal(kt, (dims.n_vocab, d_t)) * 0.02).astype(dtype),
            "pos_emb": jnp.zeros((dims.n_text_ctx, d_t), dtype),
            "blocks": dec_blocks,
            "ln": _ln(d_t, dtype),
        },
    }


def quantize_decoder_f8(params: Params) -> Params:
    """Quantize the decoder blocks' linear weights to float8_e4m3fn with
    per-output-channel scales (weight-only; activations stay bf16/f32).

    The decode loop is HBM-bandwidth-bound at S=1 — it streams ~1.7 GB of
    decoder weights per step at large-v3 (docs/perf/README.md "Remaining
    wall") — so halving the weight bytes attacks the per-step floor the
    same way the f8 cross-KV pool does. Only the per-layer block linears
    (self q/k/v/o, cross q/o, mlp fc1/fc2) are converted: cross k/v run
    once per anchor (not hot) and tok_emb doubles as the unembed where
    logit fidelity matters most. ``dense`` consumes the {w, w_scale}
    form transparently. Quality impact is measured, not assumed:
    scripts/probe_decoder_f8.py reports step time + token agreement.
    """
    F8_MAX = 448.0  # e4m3fn finite max

    def quant(p: Params) -> Params:
        w = p["w"].astype(jnp.float32)  # [L, I, O]
        amax = jnp.max(jnp.abs(w), axis=-2)  # per (layer, out-channel)
        scale = jnp.maximum(amax / F8_MAX, 1e-12)
        w8 = (w / scale[..., None, :]).astype(jnp.float8_e4m3fn)
        out = {"w": w8, "w_scale": scale}
        if "b" in p:
            out["b"] = p["b"]
        return out

    blocks = dict(params["decoder"]["blocks"])
    blocks["attn"] = {k: quant(v) for k, v in blocks["attn"].items()}
    blocks["cross"] = {
        k: (quant(v) if k in ("q", "o") else v) for k, v in blocks["cross"].items()
    }
    blocks["mlp"] = {k: quant(v) for k, v in blocks["mlp"].items()}
    decoder = {**params["decoder"], "blocks": blocks}
    return {**params, "decoder": decoder}


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def dense(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    w = p["w"]
    if w.dtype == jnp.float8_e4m3fn:
        # weight-only f8 storage (quantize_decoder_f8): halve the per-step
        # HBM weight read; the MXU dot runs in the compute dtype and the
        # per-output-channel scale folds in AFTER the dot, so the wide
        # [I,O] matrix is never multiplied elementwise.
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        y = y * p["w_scale"]
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, n_head, d // n_head)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, s, h, dh = x.shape
    return x.reshape(b, s, h * dh)


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Sinusoidal position embeddings (reference whisper/model.py sinusoids)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def _attend(q, k, v, mask=None):
    """Materializing attention for short query blocks.

    q:[B,S,H,Dh] k,v:[B,T,H,Dh] mask:[B,S,T] additive or None -> [B,S,H,Dh].
    Softmax in f32 for stability regardless of compute dtype.
    """
    dh = q.shape[-1]
    scores = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
    scores = scores * (dh**-0.5)
    if mask is not None:
        scores = scores + mask[:, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype), probs


def _attend_t(q, k, v, mask=None):
    """Attention over *transposed* KV storage [B,H,Dh,T] (T on lanes).

    q: [B,S,H,Dh] -> ([B,S,H,Dh], probs [B,H,S,T]). Serves both the S=1
    decode step (where the layout is 2.5x faster than the default — see
    cross_kv docstring) and the prefill over the same buffers.
    """
    dh = q.shape[-1]
    scores = jnp.einsum("bshd,bhdt->bhst", q, k, preferred_element_type=jnp.float32)
    scores = scores * (dh**-0.5)
    if mask is not None:
        scores = scores + mask[:, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bhdt->bshd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype), probs


def _attend_chunked(q, k, v, chunk: int = 256):
    """Flash-style online-softmax attention scanned over query chunks.

    Bounds memory to O(chunk*T) per head instead of O(S*T): used by the
    encoder where S=T=1500 and batch is large. q,k,v: [B,S,H,Dh].
    """
    b, s, h, dh = q.shape
    scale = dh**-0.5
    n_chunks = (s + chunk - 1) // chunk
    pad = n_chunks * chunk - s
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qc = q.reshape(b, n_chunks, chunk, h, dh).transpose(1, 0, 2, 3, 4)

    def body(carry, q_blk):
        scores = jnp.einsum("bshd,bthd->bhst", q_blk, k, preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhst,bthd->bshd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return carry, out.astype(v.dtype)

    _, outs = jax.lax.scan(body, None, qc)
    out = outs.transpose(1, 0, 2, 3, 4).reshape(b, n_chunks * chunk, h, dh)
    return out[:, :s]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv1d(x, p, stride: int):
    # x: [B, C_in, T], w: [C_out, C_in, K] with SAME-1 padding like torch pad=1
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"][None, :, None].astype(jnp.float32)).astype(x.dtype)


def encode(
    params: Params,
    mel: jnp.ndarray,
    dims: ModelDimensions,
    pos_start: Optional[jnp.ndarray] = None,
    flash: Optional[bool] = None,
) -> jnp.ndarray:
    """mel [B, n_mels, 2*F] -> encoder features [B, F, D].

    ``pos_start`` ([B] int32) offsets the sinusoidal position table per lane —
    the incremental-encoding path encodes only a window *tail* whose frames
    must carry their absolute positions within the 30 s window (frames are
    cached across ticks; see streaming/alignatt.py EncPool).
    """
    p = params["encoder"]
    x = mel.astype(p["conv1"]["w"].dtype)
    x = jax.nn.gelu(_conv1d(x, p["conv1"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, p["conv2"], 2), approximate=False)
    x = x.transpose(0, 2, 1)  # [B, T, D]
    pos = jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state))
    if pos_start is None:
        x = (x + pos[: x.shape[1]].astype(x.dtype)).astype(x.dtype)
    else:
        idx = jnp.minimum(
            pos_start[:, None] + jnp.arange(x.shape[1], dtype=jnp.int32)[None, :],
            dims.n_audio_ctx - 1,
        )
        x = (x + pos[idx].astype(x.dtype)).astype(x.dtype)

    n_head = dims.n_audio_head
    T0 = x.shape[1]
    # `flash` forces the path: the Pallas kernel has no VJP, so the training
    # step (parallel/train.py) passes flash=False to stay differentiable.
    use_flash = (
        _flash_attn_available(
            ((T0 + 127) // 128) * 128, dims.n_audio_state // n_head
        )
        if flash is None
        else flash
    )
    if use_flash and T0 % 128 != 0:
        # lane-align the sequence for the kernel; padded KEY columns are
        # masked by t_valid, padded rows carry garbage and are sliced off.
        x = jnp.pad(x, ((0, 0), (0, ((T0 + 127) // 128) * 128 - T0), (0, 0)))

    def block(x, bp):
        h = layer_norm(x, bp["attn_ln"])
        q = _split_heads(dense(h, bp["attn"]["q"]), n_head)
        k = _split_heads(dense(h, bp["attn"]["k"]), n_head)
        v = _split_heads(dense(h, bp["attn"]["v"]), n_head)
        if use_flash:
            # VMEM-tiled flash kernel: XLA otherwise materializes the
            # [B,H,T,T] f32 scores (786 -> ~350 ms full-window encode at
            # large-v3 B=24; ops/flash_encoder.py).
            from ...ops.flash_encoder import flash_encoder_attn

            attn = flash_encoder_attn(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 3, 1),
                v.transpose(0, 2, 1, 3),
                t_valid=T0,
            ).transpose(0, 2, 1, 3)
        else:
            # Full materialized attention when the score tensor fits
            # comfortably; online-softmax chunking as the memory fallback
            # for very large batch x heads.
            score_bytes = x.shape[0] * n_head * x.shape[1] * x.shape[1] * 2
            if score_bytes > 6e9:
                attn = _attend_chunked(q, k, v)
            else:
                attn, _ = _attend(q, k, v)
        x = x + dense(_merge_heads(attn), bp["attn"]["o"])
        h = layer_norm(x, bp["mlp_ln"])
        h = jax.nn.gelu(dense(h, bp["mlp"]["fc1"]), approximate=False)
        x = x + dense(h, bp["mlp"]["fc2"])
        return x, None

    x, _ = jax.lax.scan(block, x, p["blocks"], unroll=ENCODER_SCAN_UNROLL)
    if x.shape[1] != T0:
        x = x[:, :T0]
    return layer_norm(x, p["ln_post"])


# ---------------------------------------------------------------------------
# Decoder with explicit KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Self-attention cache: [L, B, n_text_ctx, H, Dh] keys/values."""

    k: jnp.ndarray
    v: jnp.ndarray


class CrossKV(NamedTuple):
    """Per-layer encoder keys/values: [L, B, T_enc, H, Dh] (computed once per
    encode; the reference caches these per-session in a python dict,
    whisper/model.py:126-146)."""

    k: jnp.ndarray
    v: jnp.ndarray


def init_cache(
    dims: ModelDimensions, batch: int, dtype=jnp.float32, width: Optional[int] = None
) -> KVCache:
    """``width`` bounds the cache timeline; the streaming tick needs only
    prefix_bucket + max_steps slots, not the full n_text_ctx — at large-v3
    x B=16 that is ~2.5 GB of HBM back."""
    w = min(width or dims.n_text_ctx, dims.n_text_ctx)
    shape = (dims.n_text_layer, batch, w, dims.n_text_head, dims.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def cross_kv(
    params: Params,
    enc: jnp.ndarray,
    dims: ModelDimensions,
    out_dtype=None,
    transposed: bool = False,
) -> CrossKV:
    """``out_dtype`` (e.g. f8_e4m3) casts per layer INSIDE the scan so the
    full-width tensor never materializes — at large-v3 x B=32 the bf16
    transient alone is ~8 GB.

    ``transposed`` stores per-layer K/V as [B, H, Dh, T] (T on lanes): no
    (·,64)-minor tile padding, contiguous per-head streams, and clean
    MXU-shaped contractions for the S=1 decode step. Measured 6.0 ms/step
    vs 11.9 (f8+cast) / 15.0 (default layout) at large-v3 B=16 on v5e
    (scripts/probe_xattn_tpu.py; a hand-written Pallas kernel lost to this
    XLA path — small-matmul issue latency — and was dropped)."""
    n_head = dims.n_text_head

    if transposed:
        # One batched matmul over all layers (weights are stacked [L,D,D])
        # instead of a 32-iteration scan of per-layer projections: a single
        # [B*T, D] x [D, L*2D] contraction keeps the MXU fed and reads enc
        # once instead of once per layer.
        blocks = params["decoder"]["blocks"]
        kw = blocks["cross"]["k"]["w"]  # [L, D, D_out]
        vw = blocks["cross"]["v"]["w"]
        vb = blocks["cross"]["v"]["b"]  # [L, D_out]
        B_, T_, _ = enc.shape
        L = kw.shape[0]

        def project(w, bias):
            out = jnp.einsum(
                "btD,lDk->lbkt", enc, w, preferred_element_type=jnp.float32
            )
            if bias is not None:
                out = out + bias.astype(jnp.float32)[:, None, :, None]
            out = out.astype(out_dtype or enc.dtype)
            dh = out.shape[2] // n_head
            return out.reshape(L, B_, n_head, dh, T_)

        return CrossKV(k=project(kw, None), v=project(vw, vb))

    def per_layer(_, bp):
        k = _split_heads(dense(enc, bp["cross"]["k"]), n_head)
        v = _split_heads(dense(enc, bp["cross"]["v"]), n_head)
        if out_dtype is not None:
            k = k.astype(out_dtype)
            v = v.astype(out_dtype)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(per_layer, None, params["decoder"]["blocks"])
    return CrossKV(k=ks, v=vs)


def cross_kv_into_pool(
    params: Params,
    enc: jnp.ndarray,   # [G, T, D]
    pool_k: jnp.ndarray,  # [L, G, H, Dh, T] (donated by the caller's jit)
    pool_v: jnp.ndarray,
    dims: ModelDimensions,
    active: Optional[jnp.ndarray] = None,  # [G] bool — rows to (re)write
) -> CrossKV:
    """Project the full-window cross-KV directly INTO a group pool, one layer
    at a time (transposed layout).

    The whole-group anchor cannot afford ``cross_kv`` + a scatter: the dense
    [L,G,H,Dh,T] intermediate doubles the footprint next to the donated pool
    (OOM at large-v3 G=24 bf16 on 16 GB v5e). Scanning layers bounds the
    transient to one layer's K+V (~0.4 GB) and updates the pool in place."""
    n_head = dims.n_text_head
    G, T_, _ = enc.shape
    Tp = pool_k.shape[-1]
    # XLA:CPU's DotThunk rejects BF16xBF16=F32 for some dot shapes
    if jax.default_backend() != "tpu" and enc.dtype == jnp.bfloat16:
        enc = enc.astype(jnp.float32)

    def project_one(w, bias):
        w = w.astype(enc.dtype)
        out = jnp.einsum("btD,Dk->bkt", enc, w, preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)[None, :, None]
        dh = out.shape[1] // n_head
        out = out.reshape(G, n_head, dh, T_)
        if Tp > T_:  # full-width row writes keep the per-layer DUS in place
            out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, Tp - T_)))
        return out

    sel = None if active is None else active[None, :, None, None, None]

    def body(carry, layer_in):
        pk, pv, l = carry
        bp = layer_in
        k_l = project_one(bp["cross"]["k"]["w"], None).astype(pk.dtype)
        v_l = project_one(bp["cross"]["v"]["w"], bp["cross"]["v"]["b"]).astype(pv.dtype)
        if sel is not None:  # keep inactive slots' cached rows intact
            cur_k = jax.lax.dynamic_slice(pk, (l, 0, 0, 0, 0), k_l[None].shape)
            cur_v = jax.lax.dynamic_slice(pv, (l, 0, 0, 0, 0), v_l[None].shape)
            k_l = jnp.where(sel, k_l[None], cur_k)[0]
            v_l = jnp.where(sel, v_l[None], cur_v)[0]
        pk = jax.lax.dynamic_update_slice(pk, k_l[None], (l, 0, 0, 0, 0))
        pv = jax.lax.dynamic_update_slice(pv, v_l[None], (l, 0, 0, 0, 0))
        return (pk, pv, l + 1), None

    (pool_k, pool_v, _), _ = jax.lax.scan(
        body, (pool_k, pool_v, jnp.int32(0)), params["decoder"]["blocks"]
    )
    return CrossKV(k=pool_k, v=pool_v)


class AlignSpec(NamedTuple):
    """Static alignment-head routing: K entries of (layer, head)."""

    layers: jnp.ndarray  # [K] int32
    heads: jnp.ndarray  # [K] int32

    @classmethod
    def from_pairs(cls, pairs) -> "AlignSpec":
        arr = np.asarray(pairs, dtype=np.int32).reshape(-1, 2)
        return cls(layers=jnp.asarray(arr[:, 0]), heads=jnp.asarray(arr[:, 1]))

    @property
    def count(self) -> int:
        return self.layers.shape[0]


def decode(
    params: Params,
    tokens: jnp.ndarray,  # [B, S] int32 — the new tokens to process
    pos: jnp.ndarray,  # [B] int32 — current cache fill per lane
    xkv: CrossKV,
    cache: KVCache,
    dims: ModelDimensions,
    align: Optional[AlignSpec] = None,
    enc_mask: Optional[jnp.ndarray] = None,  # [B, T_enc] bool — valid frames
    align_reduce: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    xkv_transposed: bool = False,
    t_valid: Optional[int] = None,
    positions_override: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], KVCache]:
    """Teacher-forced step over S new tokens for every lane.

    Returns (logits [B,S,V] f32, align_probs [K,B,S,T_enc] f32 | None,
    updated cache). Works for prefill (S = prompt length, pos = 0) and for
    incremental block-decode (S = decode_block_tokens, per-lane pos).

    ``align_reduce=(w_sum [B,S], w_last [B,S])`` switches the alignment
    output to in-scan row reductions — (asum, asq, last) each [B,K,T] —
    instead of materializing [K,B,S,T]: at prefill width the full buffer
    costs ~2x its size in HBM traffic per layer, which dominates large-model
    prefill (the gate only ever consumes these three reductions).

    ``xkv_transposed`` declares the [B,H,Dh,T] cross-KV layout (see
    cross_kv) and routes cross-attention through ``_attend_t``. This is the
    decode-loop fast path: 6.0 ms/step vs 11.9 (f8+cast) / 15.0 (bf16
    default layout) at large-v3 B=16 on v5e (scripts/probe_xattn_tpu.py).

    ``t_valid`` (static) masks cross-attention columns >= t_valid: the
    group cross-KV pools pad T to a 128-multiple so the splice DMA can land
    on tile boundaries; the padding columns must never receive attention.
    """
    dec = params["decoder"]
    B, S = tokens.shape
    n_head = dims.n_text_head
    W = cache.k.shape[2]  # cache timeline width (<= n_text_ctx)

    # ``positions_override`` [B,S] decodes NON-CONTIGUOUS rows (the self-KV
    # pool's per-tick refresh: the sot row for no_speech + the last prefix
    # rows for fresh gate/logits against the updated cross-KV). Each row's
    # causal mask and cache write slot follow its own position; a scratch
    # position (cache width - 1, above any legitimate fill) parks padding
    # rows where no query ever attends.
    if positions_override is not None:
        raw_pos = positions_override
    else:
        raw_pos = pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # [B,S]
    emb_pos = jnp.minimum(raw_pos, dims.n_text_ctx - 1)
    positions = jnp.minimum(raw_pos, W - 1)  # cache write slots
    x = dec["tok_emb"][tokens] + dec["pos_emb"][emb_pos]

    # Self-attention mask over the cache timeline: key j visible to query s
    # iff j <= pos + s (strict causality with per-lane offsets).
    key_idx = jnp.arange(W, dtype=jnp.int32)[None, None, :]  # [1,1,W]
    self_mask = jnp.where(key_idx <= positions[:, :, None], 0.0, -jnp.inf).astype(jnp.float32)

    T_enc_in = xkv.k.shape[-1] if xkv_transposed else xkv.k.shape[2]
    cross_mask = None
    if enc_mask is not None:
        cross_mask = jnp.where(enc_mask[:, None, :], 0.0, -jnp.inf).astype(jnp.float32)
    if t_valid is not None and t_valid < T_enc_in:
        pad_mask = jnp.where(
            jnp.arange(T_enc_in)[None, None, :] < t_valid, 0.0, -jnp.inf
        ).astype(jnp.float32)
        cross_mask = pad_mask if cross_mask is None else cross_mask + pad_mask

    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]  # [B,1]

    T_enc = xkv.k.shape[-1] if xkv_transposed else xkv.k.shape[2]
    # Prefill (S>1) cross-attention through the flash kernel when its probs
    # output is not needed: with align_reduce the gate statistics come from
    # the K-head recompute, and without align nothing reads probs.
    use_flash_prefill = (
        xkv_transposed
        and S > 1
        and S % 8 == 0
        and enc_mask is None
        and (align is None or align_reduce is not None)
        and ENCODER_FLASH_ATTN
        and jax.default_backend() == "tpu"
    )
    flash_t_valid = min(t_valid or T_enc_in, T_enc_in)
    if align is not None and align_reduce is not None:
        align_acc = (
            jnp.zeros((B, align.count, T_enc), jnp.float32),
            jnp.zeros((B, align.count, T_enc), jnp.float32),
            jnp.zeros((B, align.count, T_enc), jnp.float32),
        )
    elif align is not None:
        align_acc = jnp.zeros((align.count, B, S, T_enc), dtype=jnp.float32)
    else:
        align_acc = None

    def block(carry, layer_in):
        x, align_acc, layer_i = carry
        bp, ck, cv, xk, xv = layer_in

        # -- self attention over cache --
        h = layer_norm(x, bp["attn_ln"])
        q = _split_heads(dense(h, bp["attn"]["q"]), n_head)
        k_new = _split_heads(dense(h, bp["attn"]["k"]), n_head)
        v_new = _split_heads(dense(h, bp["attn"]["v"]), n_head)
        ck = ck.at[batch_idx, positions].set(k_new)
        cv = cv.at[batch_idx, positions].set(v_new)
        attn, _ = _attend(q, ck, cv, mask=self_mask)
        x = x + dense(_merge_heads(attn), bp["attn"]["o"])

        # -- cross attention over encoder features --
        h = layer_norm(x, bp["cross_ln"])
        qx = _split_heads(dense(h, bp["cross"]["q"]), n_head)
        # cross-KV may be stored narrow (f8) to halve the per-step HBM read;
        # the cast happens per layer inside the scan.
        xk = xk.astype(x.dtype)
        xv = xv.astype(x.dtype)
        if use_flash_prefill:
            # VMEM-tiled kernel: XLA's einsum prefill materializes the
            # [B,H,S,T] f32 scores + probs per layer; probs aren't consumed
            # here (align stats come from the K-head recompute below).
            from ...ops.flash_encoder import flash_encoder_attn

            xattn = flash_encoder_attn(
                qx.transpose(0, 2, 1, 3), xk, xv,
                t_valid=flash_t_valid, v_transposed=True,
            ).transpose(0, 2, 1, 3)
            xprobs = None
        elif xkv_transposed:
            xattn, xprobs = _attend_t(qx, xk, xv, mask=cross_mask)
        else:
            xattn, xprobs = _attend(qx, xk, xv, mask=cross_mask)  # xprobs [B,H,S,T]
        x = x + dense(_merge_heads(xattn), bp["cross"]["o"])

        if align_acc is not None and align_reduce is not None:
            # Prefill path: recompute scores for ONLY the K registered heads
            # and reduce — identical f32 math on the same bf16 operands, but
            # the attention's [B,H,S,T] f32 probs never feed per-layer
            # gathers (-26 ms at large-v3 B=24; the recompute is ~4
            # GFLOP/layer and reads ~K/H of xk again, amortized over S
            # prefill rows). At S=1 re-reading k_sel per step measured
            # SLOWER than the gather (36 vs 18 ms/step) — steps gather.
            # Query rows are processed in chunks of <=64: softmax is
            # row-local and the three reductions are row-sums, so chunking
            # is EXACT, and it bounds the [B,K,S,T] f32 score/softmax
            # transient at chunk width — un-chunked it scales the tick
            # program's temp linearly with the prefix bucket (measured
            # 2.4G at P=64 -> 11.9G at P=384, an HBM OOM at serving
            # shapes; scripts/probe_tick_mem.py).
            sel = (align.layers == layer_i).astype(jnp.float32)  # [K]
            q_sel = qx[:, :, align.heads]                        # [B,S,K,Dh]
            if xkv_transposed:
                k_sel = xk[:, align.heads]                       # [B,K,Dh,T]
            else:
                k_sel = xk[:, :, align.heads]                    # [B,T,K,Dh]
            w_sum, w_last = align_reduce
            scale = qx.shape[-1] ** -0.5
            S_rows = q_sel.shape[1]
            CH = 64 if S_rows % 64 == 0 else S_rows

            def _chunk_stats(c0):
                q_c = jax.lax.dynamic_slice_in_dim(q_sel, c0, CH, axis=1)
                if xkv_transposed:
                    s_c = jnp.einsum(
                        "bskd,bkdt->bkst", q_c, k_sel,
                        preferred_element_type=jnp.float32,
                    )
                else:
                    s_c = jnp.einsum(
                        "bskd,btkd->bkst", q_c, k_sel,
                        preferred_element_type=jnp.float32,
                    )
                s_c = s_c * scale
                if cross_mask is not None:
                    # [B,1,T]: row axis is broadcast, no slicing needed
                    s_c = s_c + cross_mask[:, None, :, :]
                g = jax.nn.softmax(s_c, axis=-1)                 # [B,K,CH,T]
                ws = jax.lax.dynamic_slice_in_dim(w_sum, c0, CH, axis=1)
                wl = jax.lax.dynamic_slice_in_dim(w_last, c0, CH, axis=1)
                return (
                    jnp.einsum("bkst,bs->bkt", g, ws),
                    jnp.einsum("bkst,bs->bkt", g * g, ws),
                    jnp.einsum("bkst,bs->bkt", g, wl),
                )

            if S_rows == CH:
                g_sum, g_sq, g_last = _chunk_stats(0)
            else:
                stacked = jax.lax.map(
                    _chunk_stats,
                    jnp.arange(0, S_rows, CH, dtype=jnp.int32),
                )
                g_sum, g_sq, g_last = (x.sum(0) for x in stacked)
            asum, asq, alast = align_acc
            selk = sel[None, :, None]
            align_acc = (
                asum + selk * g_sum, asq + selk * g_sq, alast + selk * g_last
            )
        elif align_acc is not None:
            # Step path (S=1): gather the registered heads' probability rows.
            sel = (align.layers == layer_i).astype(jnp.float32)  # [K]
            gathered = xprobs[:, align.heads]  # [B,K,S,T]
            align_acc = align_acc + sel[:, None, None, None] * gathered.transpose(1, 0, 2, 3)

        # -- mlp --
        h = layer_norm(x, bp["mlp_ln"])
        x = x + dense(jax.nn.gelu(dense(h, bp["mlp"]["fc1"]), approximate=False), bp["mlp"]["fc2"])
        return (x, align_acc, layer_i + 1), (ck, cv)

    (x, align_acc, _), (new_k, new_v) = jax.lax.scan(
        block,
        (x, align_acc, jnp.int32(0)),
        (params["decoder"]["blocks"], cache.k, cache.v, xkv.k, xkv.v),
        unroll=DECODER_SCAN_UNROLL,
    )

    x = layer_norm(x, dec["ln"])
    logits = jnp.dot(
        x, dec["tok_emb"].T.astype(x.dtype), preferred_element_type=jnp.float32
    )
    if align_acc is not None and t_valid is not None and t_valid < T_enc_in:
        # padded pool columns carry zero attention; return T-true stats
        if isinstance(align_acc, tuple):
            align_acc = tuple(a[..., :t_valid] for a in align_acc)
        else:
            align_acc = align_acc[..., :t_valid]
    return logits, align_acc, KVCache(k=new_k, v=new_v)


# ---------------------------------------------------------------------------
# Jit entry points (static over dims / shapes)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("dims",))
def encode_jit(params, mel, dims):
    return encode(params, mel, dims)


@partial(jax.jit, static_argnames=("dims",))
def cross_kv_jit(params, enc, dims):
    return cross_kv(params, enc, dims)


@partial(jax.jit, static_argnames=("dims",), donate_argnames=("cache",))
def decode_jit(params, tokens, pos, xkv, cache, dims, align=None, enc_mask=None):
    return decode(params, tokens, pos, xkv, cache, dims, align=align, enc_mask=enc_mask)
