"""Which part of the large-v3 tick decode loop costs 56 ms/step?

Times the inc tick at B=16/steps=8 with DRY and/or the median-filter gate
monkeypatched to identity (patching rebinds the names alignatt's trace
reads, so each variant compiles a genuinely smaller program).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import bench as bx
from whisperlivekit_tpu.models import whisper  # noqa
from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.streaming import alignatt as A

NAME = "large-v3"
B = 16
TAIL = 384
RESULTS = {}


def run(label, params, dims, suppress_mask, al, ah, steps=8):
    rng = np.random.default_rng(0)
    audio_pool = jnp.asarray(rng.integers(-3000, 3000, (B, 16000 * 30)).astype(np.int16))
    enc_pool = jnp.zeros((B + 1, dims.n_audio_ctx, dims.n_audio_state), jnp.bfloat16)
    core = bx._core_args(dims, B, rng, suppress_mask, al, ah)
    statics = bx._statics(dims)
    statics["max_steps"] = steps
    lanes = jnp.arange(B, dtype=jnp.int32)
    state = {"p": enc_pool}

    def tick():
        out = A.alignatt_tick_inc(
            params, audio_pool, state["p"], lanes, lanes + 1,
            jnp.full((B,), 1500 - TAIL, jnp.int32),
            jnp.full((B,), 1500, jnp.int32),
            jnp.full((B,), 1500 - 82, jnp.int32),
            *core, **statics, tail_frames=TAIL,
        )
        state["p"] = out[-1]
        return out

    t = bx.time_call(tick)
    RESULTS[label] = round(t * 1e3, 1)
    print(f"{label}: {t*1e3:.1f} ms", file=sys.stderr, flush=True)
    with open("/tmp/probe_parts.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    dims = MODEL_DIMS[NAME]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    suppress_mask = bx._suppress(dims)
    al, ah = bx._align(dims, NAME)

    real_dry = A.dry_penalty
    real_med = A.median_filter

    run("baseline_s8", params, dims, suppress_mask, al, ah)

    A.dry_penalty = lambda logits, tokens, cur_len, eot: logits
    A.alignatt_tick_inc.clear_cache()
    run("no_dry_s8", params, dims, suppress_mask, al, ah)

    A.median_filter = lambda x, w: x
    A.alignatt_tick_inc.clear_cache()
    run("no_dry_no_median_s8", params, dims, suppress_mask, al, ah)

    A.dry_penalty = real_dry
    A.alignatt_tick_inc.clear_cache()
    run("no_median_s8", params, dims, suppress_mask, al, ah)

    A.median_filter = real_med
    A.alignatt_tick_inc.clear_cache()
    run("baseline_s2", params, dims, suppress_mask, al, ah, steps=2)

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
