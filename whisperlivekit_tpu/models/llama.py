"""Llama-family decoder in pure JAX (RMSNorm, RoPE, GQA, SiLU MLP).

The text tower for Voxtral (reference voxtral_mlx/model.py role) and any
future LLM-decoder ASR backend. Same design rules as models/whisper/model.py:
stacked layers + lax.scan, explicit KV cache with per-lane positions, bf16
params with f32 softmax/norms.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LlamaDims:
    vocab_size: int
    hidden_size: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    intermediate_size: int
    head_dim: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_positions: int = 8192
    tie_embeddings: bool = False
    qk_norm: bool = False  # Qwen3: per-head-dim RMSNorm on q/k before RoPE


def _lin(key, i, o, dtype):
    return (jax.random.normal(key, (i, o)) * (i**-0.5)).astype(dtype)


def init_params(dims: LlamaDims, key, dtype=jnp.float32) -> Dict:
    def layer(k):
        ks = jax.random.split(k, 7)
        d, h, kv, dh = dims.hidden_size, dims.n_heads, dims.n_kv_heads, dims.head_dim
        extra = (
            {"q_norm": jnp.ones((dh,), dtype), "k_norm": jnp.ones((dh,), dtype)}
            if dims.qk_norm
            else {}
        )
        return {
            **extra,
            "attn_norm": jnp.ones((d,), dtype),
            "wq": _lin(ks[0], d, h * dh, dtype),
            "wk": _lin(ks[1], d, kv * dh, dtype),
            "wv": _lin(ks[2], d, kv * dh, dtype),
            "wo": _lin(ks[3], h * dh, d, dtype),
            "mlp_norm": jnp.ones((d,), dtype),
            "w_gate": _lin(ks[4], d, dims.intermediate_size, dtype),
            "w_up": _lin(ks[5], d, dims.intermediate_size, dtype),
            "w_down": _lin(ks[6], dims.intermediate_size, d, dtype),
        }

    ks = jax.random.split(key, 3)
    layers = [layer(k) for k in jax.random.split(ks[0], dims.n_layers)]
    params = {
        "tok_emb": (jax.random.normal(ks[1], (dims.vocab_size, dims.hidden_size)) * 0.02).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": jnp.ones((dims.hidden_size,), dtype),
    }
    if not dims.tie_embeddings:
        params["lm_head"] = _lin(ks[2], dims.hidden_size, dims.vocab_size, dtype)
    return params


def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """x [B,S,H,Dh], positions [B,S] — HF llama convention (half-split)."""
    dh = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))  # [Dh/2]
    ang = positions.astype(jnp.float32)[:, :, None] * inv[None, None, :]   # [B,S,Dh/2]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., : dh // 2], x[..., dh // 2 :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate([xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1).astype(x.dtype)


class LlamaCache(NamedTuple):
    k: jnp.ndarray  # [L, B, T, KV, Dh]
    v: jnp.ndarray


def init_cache(dims: LlamaDims, batch: int, max_len: int, dtype=jnp.float32) -> LlamaCache:
    shape = (dims.n_layers, batch, max_len, dims.n_kv_heads, dims.head_dim)
    return LlamaCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def forward(
    params: Dict,
    embeds: jnp.ndarray,  # [B, S, D] input embeddings (post token/audio splice)
    pos: jnp.ndarray,  # [B] cache fill per lane
    cache: LlamaCache,
    dims: LlamaDims,
) -> Tuple[jnp.ndarray, LlamaCache]:
    """Returns (logits [B,S,V] f32, cache)."""
    B, S, D = embeds.shape
    T_ctx = cache.k.shape[2]
    h_rep = dims.n_heads // dims.n_kv_heads

    positions = pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    write_pos = jnp.minimum(positions, T_ctx - 1)
    key_idx = jnp.arange(T_ctx, dtype=jnp.int32)[None, None, :]
    mask = jnp.where(key_idx <= positions[:, :, None], 0.0, -jnp.inf).astype(jnp.float32)
    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]

    x = embeds

    def block(x, layer_in):
        bp, ck, cv = layer_in
        h = _rms_norm(x, bp["attn_norm"], dims.rms_eps)
        q = jnp.dot(h, bp["wq"], preferred_element_type=jnp.float32).astype(x.dtype)
        k = jnp.dot(h, bp["wk"], preferred_element_type=jnp.float32).astype(x.dtype)
        v = jnp.dot(h, bp["wv"], preferred_element_type=jnp.float32).astype(x.dtype)
        q = q.reshape(B, S, dims.n_heads, dims.head_dim)
        k = k.reshape(B, S, dims.n_kv_heads, dims.head_dim)
        v = v.reshape(B, S, dims.n_kv_heads, dims.head_dim)
        if dims.qk_norm:
            q = _rms_norm(q, bp["q_norm"], dims.rms_eps)
            k = _rms_norm(k, bp["k_norm"], dims.rms_eps)
        q = _rope(q, positions, dims.rope_theta)
        k = _rope(k, positions, dims.rope_theta)

        ck = ck.at[batch_idx, write_pos].set(k)
        cv = cv.at[batch_idx, write_pos].set(v)

        # GQA: repeat kv heads to full head count
        kk = jnp.repeat(ck, h_rep, axis=2)  # [B,T,H,Dh]
        vv = jnp.repeat(cv, h_rep, axis=2)
        scores = jnp.einsum("bshd,bthd->bhst", q, kk, preferred_element_type=jnp.float32)
        scores = scores * (dims.head_dim**-0.5) + mask[:, None, :, :]
        probs = jax.nn.softmax(scores, axis=-1).astype(vv.dtype)
        attn = jnp.einsum("bhst,bthd->bshd", probs, vv, preferred_element_type=jnp.float32)
        attn = attn.astype(x.dtype).reshape(B, S, dims.n_heads * dims.head_dim)
        x = x + jnp.dot(attn, bp["wo"], preferred_element_type=jnp.float32).astype(x.dtype)

        h = _rms_norm(x, bp["mlp_norm"], dims.rms_eps)
        gate = jax.nn.silu(jnp.dot(h, bp["w_gate"], preferred_element_type=jnp.float32))
        up = jnp.dot(h, bp["w_up"], preferred_element_type=jnp.float32)
        x = x + jnp.dot(
            (gate * up).astype(x.dtype), bp["w_down"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return x, (ck, cv)

    x, (nk, nv) = jax.lax.scan(block, x, (params["blocks"], cache.k, cache.v))
    x = _rms_norm(x, params["norm"], dims.rms_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["tok_emb"].T
    logits = jnp.dot(x, head.astype(x.dtype), preferred_element_type=jnp.float32)
    return logits, LlamaCache(nk, nv)


def embed_tokens(params: Dict, tokens: jnp.ndarray) -> jnp.ndarray:
    return params["tok_emb"][tokens]


def dims_from_hf_config(cfg: dict) -> LlamaDims:
    return LlamaDims(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        n_layers=cfg["num_hidden_layers"],
        n_heads=cfg["num_attention_heads"],
        n_kv_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
        intermediate_size=cfg["intermediate_size"],
        head_dim=cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"],
        rope_theta=cfg.get("rope_theta", 10000.0),
        rms_eps=cfg.get("rms_norm_eps", 1e-5),
        max_positions=cfg.get("max_position_embeddings", 8192),
        tie_embeddings=cfg.get("tie_word_embeddings", False),
    )


def convert_hf_state_dict(
    sd: Dict[str, np.ndarray],
    dims: LlamaDims,
    dtype=jnp.float32,
    prefix: str = "model.",
    lm_head_key: Optional[str] = None,
) -> Dict:
    """HF LlamaForCausalLM state dict → stacked pytree."""
    if lm_head_key is None:
        # "model." → "lm_head.weight"; "language_model.model." → "language_model.lm_head.weight"
        lm_head_key = prefix[: -len("model.")] + "lm_head.weight"

    def t(name):
        return jnp.asarray(sd[name].T, dtype)

    layers = []
    for i in range(dims.n_layers):
        p = f"{prefix}layers.{i}."
        extra = {}
        if dims.qk_norm:
            extra = {
                "q_norm": jnp.asarray(sd[p + "self_attn.q_norm.weight"], dtype),
                "k_norm": jnp.asarray(sd[p + "self_attn.k_norm.weight"], dtype),
            }
        layers.append(
            {
                **extra,
                "attn_norm": jnp.asarray(sd[p + "input_layernorm.weight"], dtype),
                "wq": t(p + "self_attn.q_proj.weight"),
                "wk": t(p + "self_attn.k_proj.weight"),
                "wv": t(p + "self_attn.v_proj.weight"),
                "wo": t(p + "self_attn.o_proj.weight"),
                "mlp_norm": jnp.asarray(sd[p + "post_attention_layernorm.weight"], dtype),
                "w_gate": t(p + "mlp.gate_proj.weight"),
                "w_up": t(p + "mlp.up_proj.weight"),
                "w_down": t(p + "mlp.down_proj.weight"),
            }
        )
    params = {
        "tok_emb": jnp.asarray(sd[f"{prefix}embed_tokens.weight"], dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": jnp.asarray(sd[f"{prefix}norm.weight"], dtype),
    }
    if lm_head_key in sd and not dims.tie_embeddings:
        params["lm_head"] = jnp.asarray(sd[lm_head_key].T, dtype)
    return params
