"""Probe: steady-tick cost vs self-KV pool width (alignatt_tick_inc_skv).

Round-3 regression root cause check (VERDICT r3 weak #1): the skv pool is
sized to the TOP prefix bucket (266 rows at large-v3), so every decode step
self-attends over 266 rows and at B=32 the resident pools blow HBM. This
sweeps Wc in {74, 138, 266} x B in {24, 32} x pool dtype {bf16, f8} and
prints per-tick latency, so the bucket-classed pool fix can be sized from
data rather than theory.

Usage: python scripts/probe_skv_width.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from whisperlivekit_tpu.compile_cache import enable_compile_cache

DECODE_STEPS = 8
EOT = 50257
TS_BEGIN = 50364
NO_SPEECH = 50362
SPACE = 220
TAIL = 160
NAME = "large-v3"


def time_call(fn, iters=4):
    np.asarray(fn()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn()[0])
    return (time.perf_counter() - t0) / iters


def main():
    enable_compile_cache()
    from whisperlivekit_tpu.models.whisper import model as wm
    from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS, default_alignment_heads
    from whisperlivekit_tpu.streaming import alignatt as A

    dims = MODEL_DIMS[NAME]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pairs = np.asarray(default_alignment_heads(dims, NAME), np.int32).reshape(-1, 2)
    align_layers = jnp.asarray(pairs[:, 0])
    align_heads = jnp.asarray(pairs[:, 1])
    K_al = int(align_layers.shape[0])
    suppress = np.zeros(dims.n_vocab, np.float32)
    suppress[TS_BEGIN:] = -np.inf
    suppress = jnp.asarray(suppress)

    out = {}
    import os
    Bs = tuple(int(x) for x in os.environ.get('PROBE_B','24,32').split(','))
    Wcs = tuple(int(x) for x in os.environ.get('PROBE_WC','74,138,266').split(','))
    DTs = tuple(os.environ.get('PROBE_DT','f8,bf16').split(','))
    SKV_DT = os.environ.get('PROBE_SKV_DT','bf16')
    for B in Bs:
        audio_pool = jnp.asarray(
            rng.integers(-3000, 3000, (B, 16000 * 30)).astype(np.int16)
        )
        lanes = jnp.arange(B, dtype=jnp.int32)
        enc_lanes = lanes + 1
        tail_start = jnp.full((B,), 1500 - TAIL, jnp.int32)
        win = jnp.full((B,), 1500, jnp.int32)
        write_start = jnp.full((B,), 1500 - 50 - 32, jnp.int32)
        for dt_name in DTs:
            dt = jnp.float8_e4m3fn if dt_name == "f8" else jnp.bfloat16
            for Wc in Wcs:
                try:
                    kshape = (
                        dims.n_text_layer, B, dims.n_text_head, dims.head_dim,
                        -(-dims.n_audio_ctx // 128) * 128,
                    )
                    sshape = (dims.n_text_layer, B, Wc, dims.n_text_head, dims.head_dim)
                    state = {
                        "k": jnp.zeros(kshape, dt), "v": jnp.zeros(kshape, dt),
                        "enc": jnp.zeros((B + 1, dims.n_audio_ctx, dims.n_audio_state), jnp.bfloat16),
                        "sk": jnp.zeros(sshape, jnp.float8_e4m3fn if SKV_DT=="f8" else jnp.bfloat16),
                        "sv": jnp.zeros(sshape, jnp.float8_e4m3fn if SKV_DT=="f8" else jnp.bfloat16),
                        "asum": jnp.zeros((B, K_al, dims.n_audio_ctx), jnp.float32),
                        "asq": jnp.zeros((B, K_al, dims.n_audio_ctx), jnp.float32),
                        "alast": jnp.zeros((B, K_al, dims.n_audio_ctx), jnp.float32),
                        "acount": jnp.zeros((B,), jnp.float32),
                        "tok": jnp.zeros((B, dims.n_text_ctx), jnp.int32),
                    }
                    keys = ("k", "v", "enc", "sk", "sv", "asum", "asq", "alast", "acount", "tok")
                    r_pos = np.full((B, A.SKV_REFRESH_ROWS), Wc - 1, np.int32)
                    r_pos[:, 0] = 0
                    r_pos[:, 1:] = np.arange(13, 20)[None, :]
                    r_tok = np.full((B, A.SKV_REFRESH_ROWS), EOT, np.int32)
                    r_tok[:, 0] = 50258
                    r_tok[:, 1:] = rng.integers(100, 40000, (B, 7))
                    r_pos_j, r_tok_j = jnp.asarray(r_pos), jnp.asarray(r_tok)
                    core = (
                        jnp.full((B,), 20, jnp.int32),       # prefix_len
                        jnp.full((B,), 1500, jnp.int32),     # content_frames
                        jnp.full((B,), -200, jnp.int32),     # last_attend
                        jnp.zeros((B,), bool),               # is_last
                        jnp.full((B,), 10**6, jnp.int32),    # max_new
                        suppress, align_layers, align_heads,
                        jnp.int32(-(10**9)), jnp.int32(10**9), jnp.float32(2.0),
                        jnp.ones((B,), bool),
                        jnp.zeros((dims.n_audio_state,), jnp.float32),
                        jnp.float32(0.0),
                    )

                    def tick():
                        o = A.alignatt_tick_inc_skv(
                            params, audio_pool, state["k"], state["v"], state["enc"],
                            state["sk"], state["sv"], state["asum"], state["asq"],
                            state["alast"], state["acount"], state["tok"],
                            lanes, enc_lanes, tail_start, win, write_start,
                            r_tok_j, r_pos_j, *core,
                            dims=dims, max_steps=DECODE_STEPS, eot=EOT,
                            ts_begin=TS_BEGIN, no_speech_tok=NO_SPEECH,
                            space_tok=SPACE, tail_frames=TAIL,
                        )
                        for kk, vv in zip(keys, o[1:]):
                            state[kk] = vv
                        return o

                    t = time_call(tick)
                    out[f"B{B}_{dt_name}_skv{SKV_DT}_Wc{Wc}"] = round(t * 1e3, 1)
                    print(f"B={B} {dt_name} skv={SKV_DT} Wc={Wc}: {t*1e3:.1f} ms", flush=True)
                    del state
                except Exception as e:
                    out[f"B{B}_{dt_name}_skv{SKV_DT}_Wc{Wc}"] = f"FAILED {type(e).__name__}"
                    print(f"B={B} {dt_name} skv={SKV_DT} Wc={Wc}: FAILED {type(e).__name__}: {e}", flush=True)
        del audio_pool

    path = sys.argv[1] if len(sys.argv) > 1 else "docs/perf/probe_skv_width.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
