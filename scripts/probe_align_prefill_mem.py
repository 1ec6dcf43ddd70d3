"""Why does the pooled tick at prefix bucket >=128 blow HBM?

The tick-cost probe OOM'd compiling alignatt_tick_inc_pooled at p_max=128
with a 2x5.6G f32 temp shaped [B, L*K, S, T] at model.py:679-690 — the
prefill align-head recompute's score/softmax tensors kept live across ALL
32 scan iterations instead of one layer at a time. This probe compiles
ONLY the prefill wm.decode (align_reduce path) at the production shapes
via AOT lowering and prints XLA's memory analysis, so fixes can be A/B'd
without burning 60 s tick compiles each try.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--b", type=int, default=24)
    ap.add_argument("--p", type=int, nargs="+", default=[64, 128])
    args = ap.parse_args()

    dims = MODEL_DIMS[args.model]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    pairs = np.asarray(default_alignment_heads(dims, args.model), np.int32).reshape(-1, 2)
    align = wm.AlignSpec(layers=jnp.asarray(pairs[:, 0]), heads=jnp.asarray(pairs[:, 1]))
    B = args.b
    T = -(-dims.n_audio_ctx // 128) * 128
    kv_shape = (dims.n_text_layer, B, dims.n_text_head, dims.head_dim, T)

    for P in args.p:
        def prefill(p, xk, xv, prefix):
            xkv = wm.CrossKV(k=xk, v=xv)
            cache = wm.init_cache(dims, B, dtype=jnp.bfloat16, width=P + 65)
            row_mask = jnp.ones((B, P), jnp.float32)
            last_onehot = jnp.zeros((B, P), jnp.float32).at[:, P - 1].set(1.0)
            logits, (asum, asq, last), cache = wm.decode(
                p, prefix, jnp.zeros((B,), jnp.int32), xkv, cache, dims,
                align=align, align_reduce=(row_mask, last_onehot),
                xkv_transposed=True, t_valid=dims.n_audio_ctx,
            )
            return logits[:, -1], asum, asq, last

        lowered = jax.jit(prefill).lower(
            params,
            jax.ShapeDtypeStruct(kv_shape, jnp.float8_e4m3fn),
            jax.ShapeDtypeStruct(kv_shape, jnp.float8_e4m3fn),
            jax.ShapeDtypeStruct((B, P), jnp.int32),
        )
        try:
            compiled = lowered.compile()
            m = compiled.memory_analysis()
            print(f"P={P}: temp={m.temp_size_in_bytes/2**30:.2f}G "
                  f"args={m.argument_size_in_bytes/2**30:.2f}G "
                  f"out={m.output_size_in_bytes/2**30:.2f}G", flush=True)
        except Exception as e:
            print(f"P={P}: COMPILE FAILED: {type(e).__name__} {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
