"""In-context cost of the cross-KV pool merge: inc tick with the one-hot
merge vs a stale-pool tick (merge skipped). Run ON axon."""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import bench as bx
from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.streaming import alignatt as A

NAME, B, TAIL = "large-v3", 24, 160
dims = MODEL_DIMS[NAME]
params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
suppress_mask = bx._suppress(dims)
al, ah = bx._align(dims, NAME)
statics = bx._statics(dims)
audio_pool = jnp.asarray(rng.integers(-3000, 3000, (B, 16000 * 30)).astype(np.int16))
core = bx._core_args(dims, B, rng, suppress_mask, al, ah)
lanes = jnp.arange(B, dtype=jnp.int32)
shape = (dims.n_text_layer, B, dims.n_text_head, dims.head_dim,
         -(-dims.n_audio_ctx // 128) * 128)
dt = jnp.float8_e4m3fn
ts = jnp.full((B,), 1500 - TAIL, jnp.int32)
win = jnp.full((B,), 1500, jnp.int32)
ws = jnp.full((B,), 1500 - 82, jnp.int32)


enc_lanes = lanes + 1


def run(state):
    out = A.alignatt_tick_inc_pooled(
        params, audio_pool, state["k"], state["v"], state["enc"], lanes,
        enc_lanes, ts, win, ws, *core, **statics, tail_frames=TAIL,
    )
    state["k"], state["v"], state["enc"] = out[-3], out[-2], out[-1]
    return out


def timeit(iters=4):
    state = {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt),
             "enc": jnp.zeros((B + 1, dims.n_audio_ctx, dims.n_audio_state), jnp.bfloat16)}
    np.asarray(run(state)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(run(state)[0])
    return (time.perf_counter() - t0) / iters * 1e3


res = {"tick_with_splice_ms": round(timeit(), 1)}
# recompile with the splice compiled out (identity) to isolate its cost
import whisperlivekit_tpu.ops.xkv_merge as xm
xm.xkv_splice = lambda pk, pv, tk, tv, w_, interpret=False: (pk, pv)
A.alignatt_tick_inc_pooled.clear_cache()
res["tick_no_splice_ms"] = round(timeit(), 1)
res["splice_cost_ms"] = round(res["tick_with_splice_ms"] - res["tick_no_splice_ms"], 1)
print(json.dumps(res))
with open("/tmp/probe_merge_cost.json", "w") as f:
    json.dump(res, f)
