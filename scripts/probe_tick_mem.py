"""AOT memory analysis of the pooled inc tick across program shapes.

The e2e tick-cost probe OOM'd compiling alignatt_tick_inc_pooled at
p_max=128 / max_steps=64 with two ~5.6G f32 temps shaped [B, L*K, S, T]
(the prefill align recompute, kept live across the layer scan). The
prefill compiled ALONE stays at 0.2G temp (probe_align_prefill_mem), so
the blowup is a whole-program scheduling artifact. This probe AOT-lowers
the real tick jit at each (p_max, max_steps) and prints XLA's temp-size
so the blowup is mapped and fixes are A/B-able in ~1 min per shape.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS, default_alignment_heads
from whisperlivekit_tpu.streaming import alignatt as A


def sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--g", type=int, default=24)
    ap.add_argument("--p", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--steps", type=int, nargs="+", default=[8, 64])
    ap.add_argument("--tail", type=int, default=160)
    args = ap.parse_args()

    dims = MODEL_DIMS[args.model]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    p_sds = jax.tree.map(lambda x: sds(x.shape, x.dtype), params)
    pairs = np.asarray(default_alignment_heads(dims, args.model), np.int32).reshape(-1, 2)
    G = args.g
    T = dims.n_audio_ctx
    Tp = -(-T // 128) * 128
    kv = sds((dims.n_text_layer, G, dims.n_text_head, dims.head_dim, Tp),
             jnp.float8_e4m3fn)
    i32g = sds((G,), jnp.i4 if False else jnp.int32)
    for P in args.p:
        for S in args.steps:
            try:
                lowered = A.alignatt_tick_inc_pooled.lower(
                    p_sds,
                    sds((4 * G, A.N_SAMPLES), jnp.int16),       # audio_pool
                    kv, kv,                                      # xkv_k, xkv_v
                    sds((4 * G + 1, T, dims.n_audio_state), jnp.bfloat16),
                    i32g, i32g, i32g, i32g, i32g,
                    sds((G, P), jnp.int32),                      # prefix
                    i32g,                                        # prefix_len
                    i32g, i32g, i32g,                            # sot, frames, attend
                    sds((G,), jnp.bool_),                        # is_last
                    i32g,                                        # max_new
                    sds((dims.n_vocab,), jnp.float32),           # suppress
                    sds((pairs.shape[0],), jnp.int32),
                    sds((pairs.shape[0],), jnp.int32),
                    sds((), jnp.int32), sds((), jnp.int32), sds((), jnp.float32),
                    sds((G,), jnp.bool_),
                    sds((dims.n_audio_state,), jnp.float32), sds((), jnp.float32),
                    dims=dims, p_max=P, max_steps=S, eot=50257,
                    ts_begin=50364, no_speech_tok=50362, space_tok=220,
                    tail_frames=args.tail,
                )
                m = lowered.compile().memory_analysis()
                print(f"P={P} steps={S}: temp={m.temp_size_in_bytes/2**30:.2f}G",
                      flush=True)
            except Exception as e:
                print(f"P={P} steps={S}: FAILED {type(e).__name__}: {str(e)[:150]}",
                      flush=True)


if __name__ == "__main__":
    main()
