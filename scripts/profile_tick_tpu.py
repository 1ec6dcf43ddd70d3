"""Profile the large-v3 incremental tick on the real chip with jax.profiler.

Writes a perfetto trace, then reports the top XLA ops by total duration —
the ground truth for where the ~22 ms/decode-step goes.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import bench as bx
from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.streaming import alignatt as A

NAME = "large-v3"
B = 32
TAIL = 160
TRACE_DIR = "/tmp/tick_trace"


def main():
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
    enc_lanes = lanes + 1
    state = {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt),
             "enc": jnp.zeros((B + 1, dims.n_audio_ctx, dims.n_audio_state), jnp.bfloat16)}

    def tick():
        out = A.alignatt_tick_inc_pooled(
            params, audio_pool, state["k"], state["v"], state["enc"],
            lanes, enc_lanes,
            jnp.full((B,), 1500 - TAIL, jnp.int32),
            jnp.full((B,), 1500, jnp.int32),
            jnp.full((B,), 1500 - 82, jnp.int32),
            *core, **statics, tail_frames=TAIL,
        )
        state["k"], state["v"], state["enc"] = out[-3], out[-2], out[-1]
        return out

    np.asarray(tick()[0])  # compile + warm
    import time

    t0 = time.perf_counter()
    np.asarray(tick()[0])
    print(f"tick: {(time.perf_counter()-t0)*1e3:.1f} ms", file=sys.stderr)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(2):
        np.asarray(tick()[0])
    jax.profiler.stop_trace()

    # parse the perfetto trace: aggregate slice durations per op name
    traces = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace file found:", glob.glob(f"{TRACE_DIR}/**/*", recursive=True)[:20])
        return
    with gzip.open(sorted(traces)[-1]) as f:
        data = json.load(f)
    durs = defaultdict(float)
    metas = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            durs[name] += ev["dur"]
            args = ev.get("args") or {}
            meta = args.get("long_name") or args.get("op_name") or args.get("source") or ""
            if meta and name not in metas:
                metas[name] = str(meta)
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:40]
    total = sum(durs.values())
    print(f"total traced op time: {total/1e3:.1f} ms (2 ticks)")
    for name, d in top:
        print(f"{d/1e3:9.2f} ms  {name[:60]}  | {metas.get(name, '')[:160]}")


if __name__ == "__main__":
    main()
