"""Is a fused [D,3D] QKV projection faster than 3 separate [D,D] matmuls in
the S=1 decode-step regime (32-layer scan, B=24, d=1280)? Run ON axon."""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

L, B, D = 32, 24, 1280
STEPS = 8

key = jax.random.PRNGKey(0)
wq = jax.random.normal(key, (L, D, D), jnp.bfloat16) * 0.02
wk = jax.random.normal(key, (L, D, D), jnp.bfloat16) * 0.02
wv = jax.random.normal(key, (L, D, D), jnp.bfloat16) * 0.02
wqkv = jnp.concatenate([wq, wk, wv], axis=-1)  # [L, D, 3D]
x0 = jax.random.normal(key, (B, 1, D), jnp.bfloat16)


@jax.jit
def split3(x, wq, wk, wv):
    def outer(x, _):
        def body(y, lw):
            q = y @ lw[0]
            k = y @ lw[1]
            v = y @ lw[2]
            return y + (q + k + v) * 1e-3, None

        x2, _ = jax.lax.scan(body, x, (wq, wk, wv))
        return x2, None

    out, _ = jax.lax.scan(outer, x, None, length=STEPS)
    return out.sum()


@jax.jit
def fused(x, w):
    def outer(x, _):
        def body(y, lw):
            qkv = y @ lw
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return y + (q + k + v) * 1e-3, None

        x2, _ = jax.lax.scan(body, x, None if False else w)
        return x2, None

    out, _ = jax.lax.scan(outer, x, None, length=STEPS)
    return out.sum()


def timeit(fn, *a, iters=6):
    float(np.asarray(fn(*a)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(fn(*a)))
    return (time.perf_counter() - t0) / iters * 1e3


res = {
    "split3_ms": round(timeit(split3, x0, wq, wk, wv), 2),
    "fused_ms": round(timeit(fused, x0, wqkv), 2),
}
print(json.dumps(res))
with open("/tmp/probe_fused_qkv.json", "w") as f:
    json.dump(res, f)
