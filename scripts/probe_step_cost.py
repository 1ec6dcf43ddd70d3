"""Isolate the per-decode-step cost of the large-v3 tick on the real chip.

Times (a) bare wm.decode S=1 steps in a fori loop, (b) the same plus the
in-tick per-step extras (DRY, median-filter gate math), via 8-vs-2 step
differencing with scalar readback. Gentle exit.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS, default_alignment_heads
from whisperlivekit_tpu.ops.median import median_filter
from whisperlivekit_tpu.streaming.alignatt import dry_penalty

NAME = "large-v3"
B = 16
RESULTS = {}


def timeit(fn, *a, iters=3):
    s = fn(*a)
    float(np.asarray(s))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*a)
        float(np.asarray(s))
    return (time.perf_counter() - t0) / iters


def main():
    dims = MODEL_DIMS[NAME]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((B, 1500, dims.n_audio_state))).astype(jnp.bfloat16)
    pairs = np.asarray(default_alignment_heads(dims, NAME), np.int32).reshape(-1, 2)
    align = wm.AlignSpec(layers=jnp.asarray(pairs[:, 0]), heads=jnp.asarray(pairs[:, 1]))
    W = 64 + 8 + 1

    @partial(jax.jit, static_argnames=("n", "use_align", "extras"))
    def steps(enc, n, use_align=True, extras=False):
        xkv = wm.cross_kv(params, enc, dims)
        cache = wm.init_cache(dims, B, dtype=jnp.bfloat16, width=W)
        toks = jnp.full((B, 64), 1000, jnp.int32)
        lg, _, cache = wm.decode(
            params, toks, jnp.zeros((B,), jnp.int32), xkv, cache, dims,
            align=align if use_align else None,
        )
        tokens_buf = jnp.full((B, dims.n_text_ctx), 50257, jnp.int32)

        def body(i, carry):
            acc, cache = carry
            lg, ap, cache = wm.decode(
                params, jnp.full((B, 1), 1000, jnp.int32),
                jnp.full((B,), 64, jnp.int32) + i, xkv, cache, dims,
                align=align if use_align else None,
            )
            x = lg[:, -1]
            if extras:
                x = dry_penalty(x, tokens_buf, jnp.full((B,), 70, jnp.int32), 50257)
                row = ap.transpose(1, 0, 2, 3)[:, :, 0, :]
                z = (row - row.mean()) / (row.std() + 1e-8)
                filt = median_filter(z, 7).mean(axis=1)
                acc = acc + filt[:, 0].sum()
            return acc + x[:, 0].sum(), cache

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), cache))
        return acc

    for label, kw in [
        ("bare", dict(use_align=True, extras=False)),
        ("noalign", dict(use_align=False, extras=False)),
        ("extras", dict(use_align=True, extras=True)),
    ]:
        t2 = timeit(lambda e: steps(e, 2, **kw), enc)
        t8 = timeit(lambda e: steps(e, 8, **kw), enc)
        per = (t8 - t2) / 6
        RESULTS[label] = {"t2_ms": round(t2 * 1e3, 1), "t8_ms": round(t8 * 1e3, 1),
                          "per_step_ms": round(per * 1e3, 2)}
        print(f"{label}: t2={t2*1e3:.1f} t8={t8*1e3:.1f} per-step={per*1e3:.2f} ms",
              file=sys.stderr, flush=True)
        with open("/tmp/probe_step.json", "w") as f:
            json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
