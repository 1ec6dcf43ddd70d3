"""large-v3 incremental-tick tuning on the real chip.

Sweeps lane width / tail length / decode budget with the narrow KV cache to
locate the remaining time and pick production defaults. One process, gentle
exit. Results JSON -> /tmp/tune_largev3.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import bench as bx  # reuse the arg builders
from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.streaming import alignatt as A

NAME = "large-v3"
RESULTS = {}


def run(B, tail_frames, steps, label, params, dims, suppress_mask, al, ah):
    rng = np.random.default_rng(0)
    audio_pool = jnp.asarray(rng.integers(-3000, 3000, (B, 16000 * 30)).astype(np.int16))
    enc_pool = jnp.zeros((B + 1, dims.n_audio_ctx, dims.n_audio_state), jnp.bfloat16)
    core = bx._core_args(dims, B, rng, suppress_mask, al, ah)
    statics = bx._statics(dims)
    statics["max_steps"] = steps
    lanes = jnp.arange(B, dtype=jnp.int32)
    enc_lanes = lanes + 1
    tail_start = jnp.full((B,), 1500 - tail_frames, jnp.int32)
    win = jnp.full((B,), 1500, jnp.int32)
    write_start = jnp.full((B,), 1500 - 50 - 32, jnp.int32)
    state = {"p": enc_pool}

    def tick():
        out = A.alignatt_tick_inc(
            params, audio_pool, state["p"], lanes, enc_lanes,
            tail_start, win, write_start, *core,
            **statics, tail_frames=tail_frames,
        )
        state["p"] = out[-1]
        return out

    try:
        t = bx.time_call(tick)
        RESULTS[label] = {"ms": round(t * 1e3, 1), "streams": round(B / t, 1)}
        print(f"{label}: {t*1e3:.1f} ms -> {B/t:.1f} streams", file=sys.stderr, flush=True)
    except Exception as e:
        RESULTS[label] = f"FAILED {type(e).__name__}"
        print(f"{label}: FAILED {e}", file=sys.stderr, flush=True)
    with open("/tmp/tune_largev3.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    dims = MODEL_DIMS[NAME]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    suppress_mask = bx._suppress(dims)
    al, ah = bx._align(dims, NAME)

    run(16, 384, 8, "B16_tail384_s8", params, dims, suppress_mask, al, ah)
    run(16, 384, 2, "B16_tail384_s2", params, dims, suppress_mask, al, ah)
    run(16, 256, 8, "B16_tail256_s8", params, dims, suppress_mask, al, ah)
    run(24, 384, 8, "B24_tail384_s8", params, dims, suppress_mask, al, ah)
    run(32, 256, 8, "B32_tail256_s8", params, dims, suppress_mask, al, ah)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
