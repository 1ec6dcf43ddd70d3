"""Decompose the pooled-xkv inc tick, one part per process.

Usage: python scripts/probe_xkv_pool_parts.py <part>
  part in {steps_f8, steps_bf16, steps_dense, prefill_f8, prefill_dense, front_f8}
Appends to /tmp/probe_xkv_pool_parts.json. Run ON axon.
"""


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


@partial(jax.jit, donate_argnums=(2, 3))
def front_scatter(p, ap, k, v):
    rows = ap
    S_tail = (TAIL + 1) * 320
    samp_idx = tail_start[:, None] * 320 + jnp.arange(S_tail, dtype=jnp.int32)[None, :]
    t = jnp.take_along_axis(rows, jnp.minimum(samp_idx, rows.shape[1] - 1), axis=1)
    t = jnp.where(samp_idx < rows.shape[1], t, 0).astype(jnp.float32) / 32768.0
    mel = A.log_mel_spectrogram(t, n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT)
    mel = A.pad_or_trim(mel, 2 * TAIL)
    enc_tail = wm.encode(p, mel, dims, pos_start=tail_start)
    fresh = wm.cross_kv(p, enc_tail, dims, transposed=True)
    k, v = A._xkv_scatter_tail(k, v, fresh.k, fresh.v, write_start, tail_start, win)
    return k, v, (fresh.k.astype(jnp.float32).sum())


@jax.jit
def prefill_from(p, k, v):
    cache = wm.init_cache(dims, B, dtype=jnp.bfloat16, width=64 + STEPS + 1)
    row_mask = (jnp.arange(64)[None, :] < plen[:, None]).astype(jnp.float32)
    last_onehot = (jnp.arange(64)[None, :] == (plen - 1)[:, None]).astype(jnp.float32)
    logits, accs, cache = wm.decode(
        p, prefix, jnp.zeros((B,), jnp.int32), wm.CrossKV(k=k, v=v), cache,
        dims, align=align, align_reduce=(row_mask, last_onehot), xkv_transposed=True,
    )
    return logits.astype(jnp.float32).sum()


@jax.jit
def steps_from(p, k, v):
    cache = wm.init_cache(dims, B, dtype=jnp.bfloat16, width=64 + STEPS + 1)
    xkv = wm.CrossKV(k=k, v=v)

    def body(carry, _):
        tok, pos, cache, acc = carry
        logits, aprobs, cache = wm.decode(
            p, tok[:, None], pos, xkv, cache, dims, align=align,
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
part = sys.argv[1] if len(sys.argv) > 1 else "steps_f8"
F8, BF16 = jnp.float8_e4m3fn, jnp.bfloat16


def pools(dt):
    return jnp.zeros(shape, dt), jnp.zeros(shape, dt)


if part == "steps_f8":
    res[part] = round(timeit(steps_from, params, *pools(F8)), 1)
elif part == "steps_bf16":
    res[part] = round(timeit(steps_from, params, *pools(BF16)), 1)
elif part == "prefill_f8":
    res[part] = round(timeit(prefill_from, params, *pools(F8)), 1)
elif part == "prefill_bf16":
    res[part] = round(timeit(prefill_from, params, *pools(BF16)), 1)
elif part in ("front_f8", "front_bf16"):
    dt = F8 if part.endswith("f8") else BF16
    kk, vv = pools(dt)
    t_c0 = time.perf_counter()
    out = front_scatter(params, audio_pool, kk, vv)   # compile + warm
    float(np.asarray(out[2]))
    res[part + "_compile_s"] = round(time.perf_counter() - t_c0, 1)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        kk, vv = pools(dt)
        out = front_scatter(params, audio_pool, kk, vv)
        float(np.asarray(out[2]))
    res[part] = round((time.perf_counter() - t0) / n * 1e3, 1)
else:
    raise SystemExit(f"unknown part {part}")

print(json.dumps(res), flush=True)
import os
path = "/tmp/probe_xkv_pool_parts.json"
acc = {}
if os.path.exists(path):
    acc = json.load(open(path))
acc.update(res)
json.dump(acc, open(path, "w"), indent=1)
