"""Does f8_e4m3 cross-KV storage fuse its upcast into the attention dots?

If the convert fuses (no materialized bf16 copy per layer), an f8 pool
halves both the pool footprint and the decode-loop HBM read. Run ON axon.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

L, B, H, Dh, T = 32, 24, 20, 64, 1500
STEPS = 8

key = jax.random.PRNGKey(0)
kd = jax.random.normal(key, (L, B, H, Dh, T), jnp.bfloat16)
vd = jax.random.normal(key, (L, B, H, Dh, T), jnp.bfloat16)
k8 = kd.astype(jnp.float8_e4m3fn)
v8 = vd.astype(jnp.float8_e4m3fn)
q0 = jax.random.normal(key, (B, 1, H, Dh), jnp.bfloat16)


def attend(q, xk, xv):
    xk = xk.astype(q.dtype)
    xv = xv.astype(q.dtype)
    s = jnp.einsum("bshd,bhdt->bhst", q, xk, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * (Dh**-0.5), axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bhdt->bshd", p, xv)


@jax.jit
def loop(q, kk, vv):
    def outer(x, _):
        def body(y, layer):
            xk, xv = layer
            return y + attend(y, xk, xv) * 1e-3, None

        x2, _ = jax.lax.scan(body, x, (kk, vv))
        return x2, None

    out, _ = jax.lax.scan(outer, q, None, length=STEPS)
    return out.sum()


def timeit(fn, *a, iters=4):
    float(np.asarray(fn(*a)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(fn(*a)))
    return (time.perf_counter() - t0) / iters * 1e3


res = {
    "loop8_bf16_ms": round(timeit(loop, q0, kd, vd), 2),
    "loop8_f8_ms": round(timeit(loop, q0, k8, v8), 2),
}
print(json.dumps(res))
with open("/tmp/probe_xkv_f8.json", "w") as f:
    json.dump(res, f)
