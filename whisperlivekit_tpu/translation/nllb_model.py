"""NLLB-200 (M2M100 architecture) encoder-decoder in pure JAX.

The in-process translation backend (role of the reference's external `nllw`
package, reference core.py:261-289 / translation.py:18-47), built TPU-first
like models/whisper: stacked-layer pytrees + lax.scan, explicit KV cache
with per-lane positions, jitted incremental greedy decode.

Architecture facts (public NLLB/M2M100): pre-LN transformer, ReLU FFN,
sinusoidal positions with fairseq offset 2 (padding_idx 1), scaled
embeddings (sqrt d), tied input/output embeddings.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NLLBDims:
    vocab_size: int = 256206
    d_model: int = 1024
    encoder_layers: int = 12
    decoder_layers: int = 12
    heads: int = 16
    ffn_dim: int = 4096
    max_positions: int = 1024
    pad_token_id: int = 1

    @property
    def head_dim(self) -> int:
        return self.d_model // self.heads


NLLB_SIZES = {
    "600M": NLLBDims(),
    "1.3B": NLLBDims(encoder_layers=24, decoder_layers=24, ffn_dim=8192),
    "dev-tiny": NLLBDims(vocab_size=512, d_model=64, encoder_layers=2,
                         decoder_layers=2, heads=4, ffn_dim=128, max_positions=128),
}

HF_NLLB_REPOS = {
    "600M": "facebook/nllb-200-distilled-600M",
    "1.3B": "facebook/nllb-200-distilled-1.3B",
}


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def _lin(key, d_in, d_out, dtype):
    w = jax.random.normal(key, (d_in, d_out)) * (d_in**-0.5)
    return {"w": w.astype(dtype), "b": jnp.zeros((d_out,), dtype)}


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _attn(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": _lin(ks[0], d, d, dtype),
        "k": _lin(ks[1], d, d, dtype),
        "v": _lin(ks[2], d, d, dtype),
        "o": _lin(ks[3], d, d, dtype),
    }


def _layer(key, dims: NLLBDims, cross: bool, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "attn_ln": _ln(dims.d_model, dtype),
        "attn": _attn(ks[0], dims.d_model, dtype),
        "ffn_ln": _ln(dims.d_model, dtype),
        "fc1": _lin(ks[1], dims.d_model, dims.ffn_dim, dtype),
        "fc2": _lin(ks[2], dims.ffn_dim, dims.d_model, dtype),
    }
    if cross:
        kc = jax.random.split(ks[0], 2)[1]
        p["cross_ln"] = _ln(dims.d_model, dtype)
        p["cross"] = _attn(kc, dims.d_model, dtype)
    return p


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def init_params(dims: NLLBDims, key, dtype=jnp.float32) -> Dict:
    ke, kd, kt = jax.random.split(key, 3)
    return {
        "emb": (jax.random.normal(kt, (dims.vocab_size, dims.d_model)) * 0.02).astype(dtype),
        "encoder": {
            "blocks": _stack(
                [_layer(k, dims, False, dtype) for k in jax.random.split(ke, dims.encoder_layers)]
            ),
            "ln": _ln(dims.d_model, dtype),
        },
        "decoder": {
            "blocks": _stack(
                [_layer(k, dims, True, dtype) for k in jax.random.split(kd, dims.decoder_layers)]
            ),
            "ln": _ln(dims.d_model, dtype),
        },
    }


# ---------------------------------------------------------------------------
# Ops
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _heads(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h)


def _merge(x):
    b, s, h, dh = x.shape
    return x.reshape(b, s, h * dh)


def _attend(q, k, v, mask=None):
    dh = q.shape[-1]
    scores = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32) * (dh**-0.5)
    if mask is not None:
        scores = scores + mask[:, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def sinusoidal_table(dims: NLLBDims) -> np.ndarray:
    """fairseq/M2M100 sinusoidal embedding table with padding_idx zeroed."""
    n_pos = dims.max_positions + 2
    d = dims.d_model
    half = d // 2
    emb = math.log(10000) / (half - 1)
    freq = np.exp(np.arange(half) * -emb)
    pos = np.arange(n_pos)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1).astype(np.float32)
    if d % 2 == 1:
        table = np.concatenate([table, np.zeros((n_pos, 1), np.float32)], axis=1)
    table[dims.pad_token_id] = 0.0
    return table


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def encode(params, tokens: jnp.ndarray, dims: NLLBDims, pad_mask: Optional[jnp.ndarray] = None):
    """tokens [B,S] -> features [B,S,D]. pad_mask [B,S] True=real."""
    d = dims.d_model
    x = params["emb"][tokens] * math.sqrt(d)
    table = jnp.asarray(sinusoidal_table(dims))
    positions = jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :] + 2
    x = (x + table[positions].astype(x.dtype)).astype(x.dtype)

    mask = None
    if pad_mask is not None:
        mask = jnp.where(pad_mask[:, None, :], 0.0, -jnp.inf).astype(jnp.float32)

    def block(x, bp):
        h = _layer_norm(x, bp["attn_ln"])
        q = _heads(_dense(h, bp["attn"]["q"]), dims.heads)
        k = _heads(_dense(h, bp["attn"]["k"]), dims.heads)
        v = _heads(_dense(h, bp["attn"]["v"]), dims.heads)
        x = x + _dense(_merge(_attend(q, k, v, mask)), bp["attn"]["o"])
        h = _layer_norm(x, bp["ffn_ln"])
        h = jax.nn.relu(_dense(h, bp["fc1"]))
        x = x + _dense(h, bp["fc2"])
        return x, None

    x, _ = jax.lax.scan(block, x, params["encoder"]["blocks"])
    return _layer_norm(x, params["encoder"]["ln"])


class NLLBCache(NamedTuple):
    k: jnp.ndarray  # [L,B,T,H,Dh]
    v: jnp.ndarray


def init_cache(dims: NLLBDims, batch: int, max_len: int, dtype=jnp.float32) -> NLLBCache:
    shape = (dims.decoder_layers, batch, max_len, dims.heads, dims.head_dim)
    return NLLBCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def cross_kv(params, enc, dims: NLLBDims):
    def per_layer(_, bp):
        k = _heads(_dense(enc, bp["cross"]["k"]), dims.heads)
        v = _heads(_dense(enc, bp["cross"]["v"]), dims.heads)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(per_layer, None, params["decoder"]["blocks"])
    return ks, vs


def decode(
    params,
    tokens: jnp.ndarray,  # [B,S]
    pos: jnp.ndarray,  # [B]
    xk,
    xv,
    cache: NLLBCache,
    dims: NLLBDims,
    enc_pad_mask: Optional[jnp.ndarray] = None,
):
    B, S = tokens.shape
    T_ctx = cache.k.shape[2]
    d = dims.d_model
    x = params["emb"][tokens] * math.sqrt(d)
    table = jnp.asarray(sinusoidal_table(dims))
    positions = pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    x = (x + table[jnp.minimum(positions + 2, table.shape[0] - 1)].astype(x.dtype)).astype(x.dtype)

    key_idx = jnp.arange(T_ctx, dtype=jnp.int32)[None, None, :]
    self_mask = jnp.where(key_idx <= positions[:, :, None], 0.0, -jnp.inf).astype(jnp.float32)
    cross_mask = None
    if enc_pad_mask is not None:
        cross_mask = jnp.where(enc_pad_mask[:, None, :], 0.0, -jnp.inf).astype(jnp.float32)

    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    write_pos = jnp.minimum(positions, T_ctx - 1)

    def block(x, layer_in):
        bp, ck, cv, lxk, lxv = layer_in
        h = _layer_norm(x, bp["attn_ln"])
        q = _heads(_dense(h, bp["attn"]["q"]), dims.heads)
        k_new = _heads(_dense(h, bp["attn"]["k"]), dims.heads)
        v_new = _heads(_dense(h, bp["attn"]["v"]), dims.heads)
        ck = ck.at[batch_idx, write_pos].set(k_new)
        cv = cv.at[batch_idx, write_pos].set(v_new)
        x = x + _dense(_merge(_attend(q, ck, cv, self_mask)), bp["attn"]["o"])

        h = _layer_norm(x, bp["cross_ln"])
        qx = _heads(_dense(h, bp["cross"]["q"]), dims.heads)
        x = x + _dense(_merge(_attend(qx, lxk, lxv, cross_mask)), bp["cross"]["o"])

        h = _layer_norm(x, bp["ffn_ln"])
        x = x + _dense(jax.nn.relu(_dense(h, bp["fc1"])), bp["fc2"])
        return x, (ck, cv)

    x, (nk, nv) = jax.lax.scan(
        block, x, (params["decoder"]["blocks"], cache.k, cache.v, xk, xv)
    )
    x = _layer_norm(x, params["decoder"]["ln"])
    logits = jnp.dot(x, params["emb"].T.astype(x.dtype), preferred_element_type=jnp.float32)
    return logits, NLLBCache(nk, nv)


# ---------------------------------------------------------------------------
# Greedy translate (jitted loop)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("dims", "max_len"))
def greedy_translate(
    params,
    src_tokens: jnp.ndarray,   # [B,S] right-padded with pad id
    src_mask: jnp.ndarray,     # [B,S] bool
    bos: jnp.ndarray,          # [B] forced first token (target lang id)
    eos: int,
    dims: NLLBDims,
    max_len: int,
):
    B = src_tokens.shape[0]
    enc = encode(params, src_tokens, dims, pad_mask=src_mask)
    xk, xv = cross_kv(params, enc, dims)
    dtype = params["emb"].dtype
    cache = init_cache(dims, B, max_len + 2, dtype=dtype)

    # decoder_start = eos token (M2M100 convention), then forced lang id
    start = jnp.full((B, 1), eos, jnp.int32)
    logits, cache = decode(params, start, jnp.zeros((B,), jnp.int32), xk, xv, cache, dims, src_mask)
    _, cache = logits, cache
    tok = bos.astype(jnp.int32)

    out = jnp.full((B, max_len), eos, jnp.int32)
    out = out.at[:, 0].set(tok)

    def body(s):
        k, tok, out, cache, done = s
        logits, cache = decode(
            params, tok[:, None], jnp.full((B,), k + 1, jnp.int32), xk, xv, cache, dims, src_mask
        )
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos, nxt)
        done = done | (nxt == eos)
        out = out.at[:, k + 1].set(nxt)
        return (k + 1, nxt, out, cache, done)

    def cond(s):
        k, _, _, _, done = s
        return (k < max_len - 1) & ~jnp.all(done)

    _, _, out, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tok, out, cache, jnp.zeros((B,), bool))
    )
    return out
