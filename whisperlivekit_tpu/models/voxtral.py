"""Voxtral (Mistral audio-LLM) in JAX: whisper-style encoder + Llama decoder.

The reference serves Voxtral-Mini-4B through HF/vLLM/MLX (reference
voxtral_hf_streaming.py, voxtral_mlx_asr.py). Here the audio tower reuses
models/whisper's encoder (identical architecture), frames are grouped 4× into
audio tokens (1 token = 80 ms), projected (gelu MLP, no bias) into the Llama
embedding space, and spliced over the audio placeholder ids. Decode runs on
models/llama with per-lane KV-cache positions.

Weights: HF `mistralai/Voxtral-Mini-3B-2507`-style checkpoints convert via
``convert_hf_state_dict``; random init supports CI parity tests against
transformers' VoxtralForConditionalGeneration.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama as lm
from .whisper import model as wm
from .whisper.dims import ModelDimensions


@dataclass(frozen=True)
class VoxtralDims:
    audio: ModelDimensions        # encoder half only (decoder fields unused)
    text: lm.LlamaDims
    downsample: int = 4           # encoder frames per audio token
    audio_token_id: int = 24      # HF default placeholder id

    @property
    def audio_tokens_per_window(self) -> int:
        return self.audio.n_audio_ctx // self.downsample


def audio_dims_from_hf(cfg: dict) -> ModelDimensions:
    return ModelDimensions(
        n_mels=cfg.get("num_mel_bins", 128),
        n_audio_ctx=cfg.get("max_source_positions", 1500),
        n_audio_state=cfg["hidden_size"],
        n_audio_head=cfg["num_attention_heads"],
        n_audio_layer=cfg["num_hidden_layers"],
        n_vocab=cfg.get("vocab_size", 51866),
        n_text_ctx=1,
        n_text_state=cfg["hidden_size"],
        n_text_head=cfg["num_attention_heads"],
        n_text_layer=1,
    )


def dims_from_hf_config(cfg: dict) -> VoxtralDims:
    return VoxtralDims(
        audio=audio_dims_from_hf(cfg["audio_config"]),
        text=lm.dims_from_hf_config(cfg["text_config"]),
        audio_token_id=cfg.get("audio_token_id") or 24,
    )


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_params(dims: VoxtralDims, key, dtype=jnp.float32) -> Dict:
    ka, kp1, kp2, kt = jax.random.split(key, 4)
    whisper_like = wm.init_params(
        ModelDimensions(**{**dims.audio.__dict__, "n_text_layer": 1, "n_text_ctx": 1}),
        ka,
        dtype=dtype,
    )
    inter = dims.audio.n_audio_state * dims.downsample
    return {
        "audio": whisper_like["encoder"],
        "proj": {
            "w1": (jax.random.normal(kp1, (inter, dims.text.hidden_size)) * inter**-0.5).astype(dtype),
            "w2": (jax.random.normal(kp2, (dims.text.hidden_size, dims.text.hidden_size))
                   * dims.text.hidden_size**-0.5).astype(dtype),
        },
        "text": lm.init_params(dims.text, kt, dtype=dtype),
    }


def convert_hf_state_dict(sd: Dict[str, np.ndarray], dims: VoxtralDims, dtype=jnp.float32) -> Dict:
    """VoxtralForConditionalGeneration state dict → pytree."""

    def lin(prefix, bias=True):
        p = {"w": jnp.asarray(sd[f"{prefix}.weight"].T, dtype)}
        if bias and f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{prefix}.bias"], dtype)
        return p

    def ln(prefix):
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{prefix}.bias"], dtype),
        }

    def enc_layer(i):
        p = f"audio_tower.layers.{i}"
        return {
            "attn_ln": ln(f"{p}.self_attn_layer_norm"),
            "attn": {
                "q": lin(f"{p}.self_attn.q_proj"),
                "k": lin(f"{p}.self_attn.k_proj", bias=False),
                "v": lin(f"{p}.self_attn.v_proj"),
                "o": lin(f"{p}.self_attn.out_proj"),
            },
            "mlp_ln": ln(f"{p}.final_layer_norm"),
            "mlp": {"fc1": lin(f"{p}.fc1"), "fc2": lin(f"{p}.fc2")},
        }

    audio = {
        "conv1": {
            "w": jnp.asarray(sd["audio_tower.conv1.weight"], dtype),
            "b": jnp.asarray(sd["audio_tower.conv1.bias"], dtype),
        },
        "conv2": {
            "w": jnp.asarray(sd["audio_tower.conv2.weight"], dtype),
            "b": jnp.asarray(sd["audio_tower.conv2.bias"], dtype),
        },
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs), *[enc_layer(i) for i in range(dims.audio.n_audio_layer)]
        ),
        "ln_post": ln("audio_tower.layer_norm"),
    }
    return {
        "audio": audio,
        "proj": {
            "w1": jnp.asarray(sd["multi_modal_projector.linear_1.weight"].T, dtype),
            "w2": jnp.asarray(sd["multi_modal_projector.linear_2.weight"].T, dtype),
        },
        "text": lm.convert_hf_state_dict(sd, dims.text, dtype, prefix="language_model.model."),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def audio_features(params: Dict, mel: jnp.ndarray, dims: VoxtralDims) -> jnp.ndarray:
    """mel [B, n_mels, 2*n_audio_ctx] → audio embeds [B, T_audio, D_text]."""
    enc = wm.encode({"encoder": params["audio"]}, mel, dims.audio)  # [B, 1500, D]
    B, T, D = enc.shape
    grouped = enc.reshape(B, T // dims.downsample, dims.downsample * D)
    h = jnp.dot(grouped, params["proj"]["w1"], preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h.astype(enc.dtype), params["proj"]["w2"], preferred_element_type=jnp.float32)
    return h.astype(enc.dtype)


def splice_audio(
    params: Dict, tokens: jnp.ndarray, audio_embeds: jnp.ndarray, audio_token_id: int
) -> jnp.ndarray:
    """Token embeddings with audio placeholder positions replaced in order."""
    tok_emb = lm.embed_tokens(params["text"], tokens)  # [B,S,D]
    mask = tokens == audio_token_id
    order = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1  # audio index per position
    order = jnp.clip(order, 0, audio_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(
        audio_embeds, order[:, :, None].astype(jnp.int32), axis=1
    )
    return jnp.where(mask[:, :, None], gathered.astype(tok_emb.dtype), tok_emb)


def forward(
    params: Dict,
    tokens: jnp.ndarray,      # [B,S] with audio placeholders
    mel: jnp.ndarray,         # [B, n_mels, 3000]
    pos: jnp.ndarray,         # [B]
    cache: lm.LlamaCache,
    dims: VoxtralDims,
) -> Tuple[jnp.ndarray, lm.LlamaCache]:
    a = audio_features(params, mel, dims)
    embeds = splice_audio(params, tokens, a, dims.audio_token_id)
    return lm.forward(params["text"], embeds, pos, cache, dims.text)


@partial(jax.jit, static_argnames=("dims", "max_new"))
def greedy_generate(
    params,
    tokens: jnp.ndarray,   # [B,S] prompt incl. audio placeholders
    mel: jnp.ndarray,
    eos: int,
    dims: VoxtralDims,
    max_new: int,
):
    B, S = tokens.shape
    dtype = params["text"]["tok_emb"].dtype
    cache = lm.init_cache(dims.text, B, S + max_new, dtype=dtype)
    logits, cache = forward(params, tokens, mel, jnp.zeros((B,), jnp.int32), cache, dims)
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    out = jnp.full((B, max_new), eos, jnp.int32)
    out = out.at[:, 0].set(tok)

    def body(s):
        k, tok, out, cache, done = s
        emb = lm.embed_tokens(params["text"], tok[:, None])
        lg, cache = lm.forward(
            params["text"], emb, jnp.full((B,), S + k, jnp.int32), cache, dims.text
        )
        nxt = jnp.argmax(lg[:, 0], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos, nxt)
        done = done | (nxt == eos)
        out = out.at[:, k + 1].set(nxt)
        return (k + 1, nxt, out, cache, done)

    def cond(s):
        k, _, _, _, done = s
        return (k < max_new - 1) & ~jnp.all(done)

    _, _, out, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tok, out, cache, tok == eos)
    )
    return out
