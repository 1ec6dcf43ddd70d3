"""Qwen3-ASR with a causal (append-only) audio tower in JAX.

The reference's best latency/quality point is qwen3 `causal` mode (reference
README.md:210-230; backend shims qwen3_streaming/_shim.py; runtime in the
external qwen3-asr-causal package): each ~2 s audio block is encoded exactly
once by a block-causal encoder, cached audio embeddings are append-only, and
per-chunk compute is constant in stream length — the most TPU-friendly
streaming architecture (static block shapes, no re-encode).

Composition:
- audio tower: whisper-style conv front-end + transformer encoder with
  **block-causal attention** (a frame attends to every frame up to the end
  of its own block) and an explicit KV cache, so ``encode_block`` appends
  one block's KV and returns its features — bit-identical to a full forward
  under the block-causal mask (pinned by tests/test_qwen3_causal.py);
- text tower: Qwen3 (models/llama.py with qk_norm) consuming
  ``[prompt | audio embeds | hypothesis]`` through one decoder cache; new
  audio embeds overwrite the stale hypothesis region, so hypothesis decoding
  costs no cache copies.

Weights: ``convert_hf_state_dict`` maps `qfuxa/qwen3-asr-0.6b-streaming`-
style checkpoints (audio_tower.* / model.* naming) with loud unmapped-key
reporting; random init drives the CI semantics tests (no egress here).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama as lm

SAMPLE_RATE = 16000
HOP = 160  # mel hop; 1 encoder frame = 2 mel frames = 20 ms


@dataclass(frozen=True)
class Qwen3ASRDims:
    """Tower geometry. Defaults follow the 0.6b streaming checkpoint scale."""

    text: lm.LlamaDims = None
    n_mels: int = 128
    d_audio: int = 1024
    audio_heads: int = 16
    audio_layers: int = 24
    audio_ff: int = 4096
    downsample: int = 4          # encoder frames per audio token (80 ms/token)
    block_frames: int = 100      # encoder frames per causal block (2 s)
    max_frames: int = 1500       # KV capacity (30 s)
    audio_token_id: int = 151676

    @property
    def block_tokens(self) -> int:
        return self.block_frames // self.downsample

    @property
    def block_samples(self) -> int:
        return self.block_frames * 2 * HOP

    def window_blocks(self, window_s: float) -> int:
        """Blocks the segment policy admits before a flush (the flush check
        fires once blocks*block_s >= window_s, before the NEXT append)."""
        import math

        block_s = self.block_samples / (16000)
        return max(int(math.ceil(window_s / block_s)), 1)


DEV_TINY_TEXT = lm.LlamaDims(
    vocab_size=512, hidden_size=64, n_layers=2, n_heads=4, n_kv_heads=2,
    intermediate_size=128, head_dim=16, qk_norm=True,
)

DEV_TINY = Qwen3ASRDims(
    text=DEV_TINY_TEXT, n_mels=80, d_audio=64, audio_heads=4, audio_layers=2,
    audio_ff=128, block_frames=20, max_frames=200,
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


def init_params(dims: Qwen3ASRDims, key, dtype=jnp.float32) -> Dict:
    ka, kt, kp = jax.random.split(key, 3)
    d = dims.d_audio

    def tower_layer(k):
        ks = jax.random.split(k, 6)
        return {
            "attn_ln": _ln(d, dtype),
            "q": _lin(ks[0], d, d, dtype),
            "k": _lin(ks[1], d, d, dtype, bias=False),
            "v": _lin(ks[2], d, d, dtype),
            "o": _lin(ks[3], d, d, dtype),
            "mlp_ln": _ln(d, dtype),
            "fc1": _lin(ks[4], d, dims.audio_ff, dtype),
            "fc2": _lin(ks[5], dims.audio_ff, d, dtype),
        }

    ks = jax.random.split(ka, 4)
    conv_scale = (3 * dims.n_mels) ** -0.5
    tower = {
        "conv1": {
            "w": (jax.random.normal(ks[0], (d, dims.n_mels, 3)) * conv_scale).astype(dtype),
            "b": jnp.zeros((d,), dtype),
        },
        "conv2": {
            "w": (jax.random.normal(ks[1], (d, d, 3)) * (3 * d) ** -0.5).astype(dtype),
            "b": jnp.zeros((d,), dtype),
        },
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[tower_layer(k) for k in jax.random.split(ks[2], dims.audio_layers)],
        ),
        "ln_post": _ln(d, dtype),
        # audio-token projection: downsample x d_audio -> text hidden
        "proj": _lin(kp, dims.downsample * d, dims.text.hidden_size, dtype, bias=False),
    }
    return {"tower": tower, "text": lm.init_params(dims.text, kt, dtype)}


# ---------------------------------------------------------------------------
# Block-causal audio tower with KV cache
# ---------------------------------------------------------------------------


class TowerCache(NamedTuple):
    """Append-only per-layer KV over encoder frames: [L, B, max_frames, H, Dh]."""

    k: jnp.ndarray
    v: jnp.ndarray


def init_tower_cache(
    dims: Qwen3ASRDims, batch: int, dtype=jnp.float32, frames: Optional[int] = None
) -> TowerCache:
    """``frames`` bounds the KV timeline (the segment policy flushes at
    window_s, so ceil(window/block)*block_frames suffices — half the HBM of
    the 30 s default at 15 s windows)."""
    shape = (
        dims.audio_layers, batch, frames or dims.max_frames,
        dims.audio_heads, dims.d_audio // dims.audio_heads,
    )
    return TowerCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _sinusoids(length: int, channels: int) -> np.ndarray:
    import math

    inc = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _conv1d(x, p, stride):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"][None, :, None].astype(jnp.float32)).astype(x.dtype)


def encode_block(
    params: Dict,
    mel_block: jnp.ndarray,   # [B, n_mels, 2*block_frames]
    cache: TowerCache,
    start_frame: jnp.ndarray,  # [B] int32 — frame position where this block begins
    dims: Qwen3ASRDims,
) -> Tuple[jnp.ndarray, TowerCache]:
    """Encode ONE audio block causally: append its KV, attend over everything
    cached so far (block-causal: full attention within the block + all
    previous frames). Returns (block features [B, block_frames, D], cache')."""
    tw = params["tower"]
    B = mel_block.shape[0]
    F = dims.block_frames
    n_head = dims.audio_heads
    dh = dims.d_audio // n_head

    x = mel_block.astype(tw["conv1"]["w"].dtype)
    x = jax.nn.gelu(_conv1d(x, tw["conv1"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, tw["conv2"], 2), approximate=False)
    x = x.transpose(0, 2, 1)  # [B, F, D]

    T_cache = cache.k.shape[2]  # KV timeline width (<= dims.max_frames)
    pos_table = jnp.asarray(_sinusoids(dims.max_frames, dims.d_audio))
    idx = jnp.minimum(
        start_frame[:, None] + jnp.arange(F, dtype=jnp.int32)[None, :],
        dims.max_frames - 1,
    )
    x = x + pos_table[idx].astype(x.dtype)

    write_pos = jnp.minimum(idx, T_cache - 1)  # [B, F]
    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # keys valid iff already cached (< start) or inside this block
    key_idx = jnp.arange(T_cache, dtype=jnp.int32)[None, None, :]
    visible = key_idx < (start_frame + F)[:, None, None]  # [B,1,T]
    mask = jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)

    def layer(carry, layer_in):
        x = carry
        bp, ck, cv = layer_in
        h = _layer_norm(x, bp["attn_ln"])
        q = _dense(h, bp["q"]).reshape(B, F, n_head, dh)
        k = _dense(h, bp["k"]).reshape(B, F, n_head, dh)
        v = _dense(h, bp["v"]).reshape(B, F, n_head, dh)
        ck = ck.at[batch_idx, write_pos].set(k)
        cv = cv.at[batch_idx, write_pos].set(v)
        scores = jnp.einsum("bshd,bthd->bhst", q, ck, preferred_element_type=jnp.float32)
        scores = scores * (dh**-0.5) + mask[:, None]
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum(
            "bhst,bthd->bshd", probs.astype(cv.dtype), cv,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        x = x + _dense(attn.reshape(B, F, dims.d_audio), bp["o"])
        h = _layer_norm(x, bp["mlp_ln"])
        x = x + _dense(jax.nn.gelu(_dense(h, bp["fc1"]), approximate=False), bp["fc2"])
        return x, (ck, cv)

    x, (nk, nv) = jax.lax.scan(layer, x, (tw["blocks"], cache.k, cache.v))
    x = _layer_norm(x, tw["ln_post"])
    return x, TowerCache(nk, nv)


def _layer_norm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    out = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(xf.var(-1, keepdims=True) + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def project_audio_tokens(params: Dict, feats: jnp.ndarray, dims: Qwen3ASRDims) -> jnp.ndarray:
    """Group ``downsample`` encoder frames into one audio token embedding:
    [B, F, D] -> [B, F//downsample, text_hidden]. One linear (qwen3) or a
    gelu MLP when ``proj2`` is present (voxtral's multi_modal_projector)."""
    B, F, D = feats.shape
    grouped = feats.reshape(B, F // dims.downsample, dims.downsample * D)
    out = _dense(grouped, params["tower"]["proj"])
    if "proj2" in params["tower"]:
        out = _dense(jax.nn.gelu(out, approximate=False), params["tower"]["proj2"])
    return out


# ---------------------------------------------------------------------------
# Jitted streaming entry points
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("dims",), donate_argnames=("tower_cache", "text_cache"))
def append_audio_block(
    params,
    mel_block: jnp.ndarray,     # [B, n_mels, 2*block_frames]
    tower_cache: TowerCache,
    text_cache: lm.LlamaCache,
    start_frame: jnp.ndarray,   # [B] tower frame position
    text_pos: jnp.ndarray,      # [B] decoder cache fill (audio prefix end)
    dims: Qwen3ASRDims,
) -> Tuple[TowerCache, lm.LlamaCache, jnp.ndarray]:
    """Encode one block causally and run its audio-token embeddings through
    the text decoder (appending decoder KV). Returns updated caches + the
    decoder logits after the block (for optional draft seeding)."""
    feats, tower_cache = encode_block(params, mel_block, tower_cache, start_frame, dims)
    embeds = project_audio_tokens(params, feats, dims)
    logits, text_cache = lm.forward(params["text"], embeds, text_pos, text_cache, dims.text)
    return tower_cache, text_cache, logits[:, -1]


@partial(jax.jit, static_argnames=("dims", "max_new"), donate_argnames=("text_cache",))
def decode_hypothesis(
    params,
    text_cache: lm.LlamaCache,
    start_tokens: jnp.ndarray,  # [B, S0] forced prefix (e.g. assistant header)
    text_pos: jnp.ndarray,      # [B] position where the hypothesis starts
    eos_id: int,
    dims: Qwen3ASRDims,
    max_new: int = 48,
) -> Tuple[jnp.ndarray, jnp.ndarray, lm.LlamaCache]:
    """Greedy hypothesis from the current audio prefix. The hypothesis KV is
    written AFTER the audio prefix and is deliberately disposable: the next
    audio block overwrites it (no cache copies per tick).

    Returns (tokens [B, max_new], n_valid [B], cache)."""
    tp = params["text"]
    logits, text_cache = lm.forward(
        tp, lm.embed_tokens(tp, start_tokens), text_pos, text_cache, dims.text
    )
    B = start_tokens.shape[0]
    pos0 = text_pos + start_tokens.shape[1]

    init = dict(
        cache=text_cache,
        logits=logits[:, -1],
        k=jnp.int32(0),
        done=jnp.zeros((B,), bool),
        tokens=jnp.full((B, max_new), eos_id, jnp.int32),
        n=jnp.zeros((B,), jnp.int32),
    )

    def cond(s):
        return (s["k"] < max_new) & ~jnp.all(s["done"])

    def body(s):
        tok = jnp.argmax(s["logits"], axis=-1).astype(jnp.int32)
        done = s["done"] | (tok == eos_id)
        tokens = s["tokens"].at[:, s["k"]].set(jnp.where(s["done"], eos_id, tok))
        n = jnp.where(done, s["n"], s["k"] + 1)
        logits, cache = lm.forward(
            tp, lm.embed_tokens(tp, tok[:, None]), pos0 + s["k"], s["cache"], dims.text
        )
        return dict(cache=cache, logits=logits[:, -1], k=s["k"] + 1,
                    done=done, tokens=tokens, n=n)

    out = jax.lax.while_loop(cond, body, init)
    return out["tokens"], out["n"], out["cache"]


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def convert_hf_state_dict(
    sd: Dict[str, np.ndarray],
    dims: Qwen3ASRDims,
    dtype=jnp.float32,
    text_prefix: str = "model.",
) -> Dict:
    """Map a qwen3-asr HF checkpoint (audio_tower.* + model.* naming, e.g.
    qfuxa/qwen3-asr-0.6b-streaming; voxtral-realtime uses
    text_prefix="language_model.model.") into this pytree. Unmapped
    audio-tower keys raise so silent omissions cannot ship."""
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
        return {
            "scale": jnp.asarray(take(f"{prefix}.weight"), dtype),
            "bias": jnp.asarray(take(f"{prefix}.bias"), dtype),
        }

    at = "audio_tower"
    layers = []
    for i in range(dims.audio_layers):
        p = f"{at}.layers.{i}"
        layers.append({
            "attn_ln": ln(f"{p}.self_attn_layer_norm"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj", bias=False),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.out_proj"),
            "mlp_ln": ln(f"{p}.final_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
        })
    tower = {
        "conv1": {
            "w": jnp.asarray(take(f"{at}.conv1.weight"), dtype),
            "b": jnp.asarray(take(f"{at}.conv1.bias"), dtype),
        },
        "conv2": {
            "w": jnp.asarray(take(f"{at}.conv2.weight"), dtype),
            "b": jnp.asarray(take(f"{at}.conv2.bias"), dtype),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "ln_post": ln(f"{at}.layer_norm"),
        "proj": {"w": jnp.asarray(take("multi_modal_projector.linear.weight").T, dtype)},
    }

    head_prefix = text_prefix[: -len("model.")]
    text = lm.convert_hf_state_dict(
        {
            k: v for k, v in sd.items()
            if k.startswith((text_prefix, head_prefix + "lm_head."))
        },
        dims.text,
        dtype=dtype,
        prefix=text_prefix,
    )

    leftover = [
        k for k in sd
        if k.startswith(at) and k not in used and "rotary" not in k and "position" not in k
    ]
    if leftover:
        raise ValueError(f"unmapped audio tower keys: {leftover[:8]} (+{len(leftover)-8 if len(leftover)>8 else 0})")
    return {"tower": tower, "text": text}
