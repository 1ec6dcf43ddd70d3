"""A/B the group-resident cross-KV cache tick vs the EncPool inc tick.

large-v3, B=24/28/32, tail 256, 8 pinned steps — the bench configuration.
Run ON the axon TPU. Writes /tmp/probe_xkv_pool_tick.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS, default_alignment_heads
from whisperlivekit_tpu.streaming import alignatt as A

EOT, TS_BEGIN, NO_SPEECH, SPACE = 50257, 50364, 50362, 220
STEPS = 8
MODEL = "large-v3"

dims = MODEL_DIMS[MODEL]
params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
suppress = np.zeros(dims.n_vocab, np.float32)
suppress[TS_BEGIN:] = -np.inf
suppress = jnp.asarray(suppress)
pairs = np.asarray(default_alignment_heads(dims, MODEL), np.int32).reshape(-1, 2)
aL, aH = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])


def core_args(B):
    prefix = np.full((B, 64), EOT, np.int32)
    prefix[:, 0:4] = [50258, 50259, 50359, 50363]
    prefix[:, 4:20] = rng.integers(100, 40000, (B, 16))
    return (
        jnp.asarray(prefix), jnp.full((B,), 20, jnp.int32),
        jnp.zeros((B,), jnp.int32), jnp.full((B,), 1500, jnp.int32),
        jnp.full((B,), -200, jnp.int32), jnp.zeros((B,), bool),
        jnp.full((B,), 10**6, jnp.int32), suppress, aL, aH,
        jnp.int32(-(10**9)), jnp.int32(10**9), jnp.float32(2.0),
        jnp.ones((B,), bool),
        jnp.zeros((dims.n_audio_state,), jnp.float32), jnp.float32(0.0),
    )


statics = dict(
    dims=dims, p_max=64, max_steps=STEPS, eot=EOT, ts_begin=TS_BEGIN,
    no_speech_tok=NO_SPEECH, space_tok=SPACE,
)


def time_call(fn, iters=4):
    np.asarray(fn()[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn()[1])
    return (time.perf_counter() - t0) / iters


res = {}
for B, dt_name, TAIL in [(24, "f8", 192), (24, "f8", 160), (24, "bf16", 192)]:
    dt = jnp.bfloat16 if dt_name == "bf16" else jnp.float8_e4m3fn
    try:
        audio_pool = jnp.asarray(
            rng.integers(-3000, 3000, (B, 16000 * 30)).astype(np.int16)
        )
        core = core_args(B)
        lanes = jnp.arange(B, dtype=jnp.int32)
        tail_start = jnp.full((B,), 1500 - TAIL, jnp.int32)
        win = jnp.full((B,), 1500, jnp.int32)
        write_start = jnp.full((B,), 1500 - 50 - 32, jnp.int32)
        shape = (dims.n_text_layer, B, dims.n_text_head, dims.head_dim, dims.n_audio_ctx)
        state = {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}

        def inc():
            out = A.alignatt_tick_inc_pooled(
                params, audio_pool, state["k"], state["v"], lanes,
                tail_start, win, write_start, *core, **statics, tail_frames=TAIL,
            )
            state["k"], state["v"] = out[-2], out[-1]
            return out

        def anchor():
            audio = audio_pool.astype(jnp.float32) / 32768.0
            out = A.alignatt_tick_anchor_group(
                params, audio, state["k"], state["v"], *core, **statics,
            )
            state["k"], state["v"] = out[-2], out[-1]
            return out

        t_inc = time_call(inc)
        t_anchor = time_call(anchor, iters=2)
        t_amort = (14 * t_inc + t_anchor) / 15
        streams = B / t_amort
        res[f"B{B}_{dt_name}_t{TAIL}"] = {
            "inc_ms": round(t_inc * 1e3, 1),
            "anchor_ms": round(t_anchor * 1e3, 1),
            "amortized_ms": round(t_amort * 1e3, 1),
            "streams": round(streams, 1),
        }
        print(f"B={B} {dt_name} t{TAIL}: inc={t_inc*1e3:.1f} anchor={t_anchor*1e3:.1f} "
              f"amort={t_amort*1e3:.1f} -> {streams:.1f} streams",
              file=sys.stderr, flush=True)
        del audio_pool, core, state
    except Exception as e:
        res[f"B{B}_{dt_name}_t{TAIL}"] = f"FAILED {type(e).__name__}: {e}"
        print(f"B={B} {dt_name}: FAILED {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

print(json.dumps(res))
with open("/tmp/probe_xkv_pool_tick.json", "w") as f:
    json.dump(res, f, indent=1)
