"""Does a per-layer lane-gather from an xkv pool cost extra vs direct reads?

Decides the cross-KV cache design: if `pool[l][lanes]` fuses into the
attention matmuls (no materialized [B,H,Dh,T] copy per layer), the decode
loop can read cached cross-KV straight from a [L, cap, H, Dh, T] pool and
the per-tick projection disappears. Run ON the axon TPU.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

L, B, H, Dh, T = 32, 24, 20, 64, 1500
CAP = B + 1
STEPS = 8

key = jax.random.PRNGKey(0)
kd = jax.random.normal(key, (L, B, H, Dh, T), jnp.bfloat16)
vd = jax.random.normal(key, (L, B, H, Dh, T), jnp.bfloat16)
kp = jax.random.normal(key, (L, CAP, H, Dh, T), jnp.bfloat16)
vp = jax.random.normal(key, (L, CAP, H, Dh, T), jnp.bfloat16)
lanes = jnp.asarray(np.random.default_rng(0).permutation(CAP)[:B].astype(np.int32))
lanes_sorted = jnp.asarray(np.arange(1, B + 1, dtype=np.int32))
q0 = jax.random.normal(key, (B, 1, H, Dh), jnp.bfloat16)


def attend(q, xk, xv):
    s = jnp.einsum("bshd,bhdt->bhst", q, xk, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * (Dh**-0.5), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhst,bhdt->bshd", p, xv)
    return o


@jax.jit
def step_direct(q, kk, vv):
    def body(x, layer):
        xk, xv = layer
        o = attend(x, xk, xv)
        return x + o * 1e-3, None

    out, _ = jax.lax.scan(body, q, (kk, vv))
    return out.sum()


@partial(jax.jit, static_argnames=())
def step_pool(q, kk, vv, ln):
    def body(x, layer):
        xkp, xvp = layer
        o = attend(x, xkp[ln], xvp[ln])
        return x + o * 1e-3, None

    out, _ = jax.lax.scan(body, q, (kk, vv))
    return out.sum()


def timeit(fn, *a, iters=6):
    float(np.asarray(fn(*a)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(fn(*a)))
    return (time.perf_counter() - t0) / iters * 1e3


res = {}
res["direct_ms"] = round(timeit(step_direct, q0, kd, vd), 2)
res["pool_gather_ms"] = round(timeit(step_pool, q0, kp, vp, lanes), 2)
res["pool_gather_sorted_ms"] = round(timeit(step_pool, q0, kp, vp, lanes_sorted), 2)

# 8-step loop variants (closer to the decode while_loop shape)
@jax.jit
def loop_direct(q, kk, vv):
    def outer(x, _):
        def body(y, layer):
            xk, xv = layer
            return y + attend(y, xk, xv) * 1e-3, None

        x2, _ = jax.lax.scan(body, x, (kk, vv))
        return x2, None

    out, _ = jax.lax.scan(outer, q, None, length=STEPS)
    return out.sum()


@jax.jit
def loop_pool(q, kk, vv, ln):
    def outer(x, _):
        def body(y, layer):
            xkp, xvp = layer
            return y + attend(y, xkp[ln], xvp[ln]) * 1e-3, None

        x2, _ = jax.lax.scan(body, x, (kk, vv))
        return x2, None

    out, _ = jax.lax.scan(outer, q, None, length=STEPS)
    return out.sum()


res["loop8_direct_ms"] = round(timeit(loop_direct, q0, kd, vd, iters=3), 2)
res["loop8_pool_ms"] = round(timeit(loop_pool, q0, kp, vp, lanes, iters=3), 2)

print(json.dumps(res))
with open("/tmp/probe_xkv_gather.json", "w") as f:
    json.dump(res, f)
