"""Decompose the pooled-xkv inc tick: front+scatter / prefill / steps,
f8 vs bf16 pools, vs the dense-xkv equivalents. Run ON axon."""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS, default_alignment_heads
from whisperlivekit_tpu.streaming import alignatt as A

EOT, TS_BEGIN = 50257, 50364
TAIL, STEPS, MODEL, B = 256, 8, "large-v3", 16

dims = MODEL_DIMS[MODEL]
params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
pairs = np.asarray(default_alignment_heads(dims, MODEL), np.int32).reshape(-1, 2)
aL, aH = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])
align = wm.AlignSpec(layers=aL, heads=aH)

shape = (dims.n_text_layer, B, dims.n_text_head, dims.head_dim, dims.n_audio_ctx)
audio_pool = jnp.asarray(rng.integers(-3000, 3000, (B, 16000 * 30)).astype(np.int16))
tail_start = jnp.full((B,), 1500 - TAIL, jnp.int32)
win = jnp.full((B,), 1500, jnp.int32)
write_start = jnp.full((B,), 1500 - 82, jnp.int32)
prefix = jnp.asarray(
    np.concatenate(
        [np.tile([50258, 50259, 50359, 50363], (B, 1)),
         rng.integers(100, 40000, (B, 16)),
         np.full((B, 44), EOT)], axis=1
    ).astype(np.int32)
)
plen = jnp.full((B,), 20, jnp.int32)


@partial(jax.jit, donate_argnums=(1, 2))
def front_scatter(ap, k, v):
    rows = ap
    S_tail = (TAIL + 1) * 320
    samp_idx = tail_start[:, None] * 320 + jnp.arange(S_tail, dtype=jnp.int32)[None, :]
    t = jnp.take_along_axis(rows, jnp.minimum(samp_idx, rows.shape[1] - 1), axis=1)
    t = jnp.where(samp_idx < rows.shape[1], t, 0).astype(jnp.float32) / 32768.0
    mel = A.log_mel_spectrogram(t, n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT)
    mel = A.pad_or_trim(mel, 2 * TAIL)
    enc_tail = wm.encode(params, mel, dims, pos_start=tail_start)
    fresh = wm.cross_kv(params, enc_tail, dims, transposed=True)
    k, v = A._xkv_scatter_tail(k, v, fresh.k, fresh.v, write_start, tail_start, win)
    return k, v, (fresh.k.astype(jnp.float32).sum())


@jax.jit
def prefill_from(k, v):
    cache = wm.init_cache(dims, B, dtype=jnp.bfloat16, width=64 + STEPS + 1)
    row_mask = (jnp.arange(64)[None, :] < plen[:, None]).astype(jnp.float32)
    last_onehot = (jnp.arange(64)[None, :] == (plen - 1)[:, None]).astype(jnp.float32)
    logits, accs, cache = wm.decode(
        params, prefix, jnp.zeros((B,), jnp.int32), wm.CrossKV(k=k, v=v), cache,
        dims, align=align, align_reduce=(row_mask, last_onehot), xkv_transposed=True,
    )
    return logits.astype(jnp.float32).sum()


@jax.jit
def steps_from(k, v):
    cache = wm.init_cache(dims, B, dtype=jnp.bfloat16, width=64 + STEPS + 1)
    xkv = wm.CrossKV(k=k, v=v)

    def body(carry, _):
        tok, pos, cache, acc = carry
        logits, aprobs, cache = wm.decode(
            params, tok[:, None], pos, xkv, cache, dims, align=align,
            xkv_transposed=True,
        )
        tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return (tok, pos + 1, cache, acc + logits.sum()), None

    init = (jnp.full((B,), 100, jnp.int32), plen, cache, jnp.float32(0))
    (tok, _, _, acc), _ = jax.lax.scan(body, init, None, length=STEPS)
    return acc


def timeit(fn, *a, iters=4):
    out = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[-1])
    return (time.perf_counter() - t0) / iters * 1e3


res = {}
for name, dt in [("f8", jnp.float8_e4m3fn), ("bf16", jnp.bfloat16)]:
    try:
        k = jnp.zeros(shape, dt)
        v = jnp.zeros(shape, dt)
        t_pre = timeit(prefill_from, k, v)
        t_steps = timeit(steps_from, k, v)
        # front+scatter donates; rebuild each iter outside timing is hard —
        # time it with fresh pools per call (allocation noise acceptable)
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            kk = jnp.zeros(shape, dt)
            vv = jnp.zeros(shape, dt)
            out = front_scatter(audio_pool, kk, vv)
            float(np.asarray(out[2]))
        t_front = (time.perf_counter() - t0) / n * 1e3
        res[name] = {
            "front_scatter_ms": round(t_front, 1),
            "prefill_ms": round(t_pre, 1),
            "steps8_ms": round(t_steps, 1),
        }
        print(name, res[name], file=sys.stderr, flush=True)
        del k, v
    except Exception as e:
        res[name] = f"FAILED {type(e).__name__}"
        print(name, "FAILED", repr(e)[:200], file=sys.stderr, flush=True)

# dense bf16 baseline (what the EncPool path feeds the decode)
kd = jnp.zeros((dims.n_text_layer, B, dims.n_text_head, dims.head_dim, dims.n_audio_ctx), jnp.bfloat16)
vd = jnp.zeros_like(kd)
res["dense_bf16"] = {
    "prefill_ms": round(timeit(prefill_from, kd, vd), 1),
    "steps8_ms": round(timeit(steps_from, kd, vd), 1),
}
print("dense_bf16", res["dense_bf16"], file=sys.stderr, flush=True)

print(json.dumps(res))
with open("/tmp/probe_xkv_pool_parts.json", "w") as f:
    json.dump(res, f, indent=1)
