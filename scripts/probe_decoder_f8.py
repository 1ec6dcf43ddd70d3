"""A/B the weight-only f8 decoder (quantize_decoder_f8) on the real chip.

VERDICT r2 #5: the decode step sits at ~17 ms vs a ~7 ms HBM floor because
each S=1 step streams ~1.7 GB of bf16 decoder weights at large-v3. Storing
the per-layer block linears as f8_e4m3 + per-output-channel scale halves
that weight read; this probe measures what it actually buys and costs:

  (a) per-decode-step time, bf16 vs f8 weights, 8-vs-2 step differencing
      (same harness as probe_step_cost.py) at the production lane widths;
  (b) greedy-token agreement over a 24-step rollout from the same encoder
      state (random weights — chaotic worst case: any logit wobble near an
      argmax tie flips the whole suffix, so agreement here LOWER-bounds
      real-weight agreement).

Gentle exit; writes docs/perf/decoder_f8_v5e.json style output to --out.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS, default_alignment_heads


def timeit(fn, *a, iters=3):
    s = fn(*a)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*a)
        jax.block_until_ready(s)
    return (time.perf_counter() - t0) / iters


def run_model(name: str, batches, rollout_steps: int):
    dims = MODEL_DIMS[name]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = wm.quantize_decoder_f8(params)
    pairs = np.asarray(default_alignment_heads(dims, name), np.int32).reshape(-1, 2)
    align = wm.AlignSpec(layers=jnp.asarray(pairs[:, 0]), heads=jnp.asarray(pairs[:, 1]))
    W = 64 + 8 + 1
    out = {"model": name, "per_step": [], "agreement": None}

    # cross-KV computed ONCE outside the jit and passed in: computing it
    # inside from the closed-over bf16 params put BOTH param sets plus the
    # bf16 xkv in one program and OOM'd 17.2G > 15.75G HBM at B=24
    make_xkv = jax.jit(lambda enc: wm.cross_kv(params, enc, dims, transposed=True))

    @partial(jax.jit, static_argnames=("n", "b"))
    def steps(p, xkv, n, b):
        cache = wm.init_cache(dims, b, dtype=jnp.bfloat16, width=W)
        toks = jnp.full((b, 64), 1000, jnp.int32)
        _, _, cache = wm.decode(p, toks, jnp.zeros((b,), jnp.int32), xkv, cache,
                                dims, align=align, xkv_transposed=True)

        def body(i, carry):
            acc, cache = carry
            lg, _, cache = wm.decode(
                p, jnp.full((b, 1), 1000, jnp.int32),
                jnp.full((b,), 64, jnp.int32) + i, xkv, cache, dims, align=align, xkv_transposed=True,
            )
            return acc + lg[:, -1, 0].sum(), cache

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), cache))
        return acc

    rng = np.random.default_rng(0)
    for b in batches:
        enc = jnp.asarray(rng.standard_normal((b, 1500, dims.n_audio_state))
                          ).astype(jnp.bfloat16)
        xkv = jax.block_until_ready(make_xkv(enc))
        del enc
        row = {"batch": b}
        for label, p in (("bf16", params), ("f8", qparams)):
            t2 = timeit(lambda x: steps(p, x, 2, b), xkv)
            t8 = timeit(lambda x: steps(p, x, 8, b), xkv)
            row[label] = {
                "t2_ms": round(t2 * 1e3, 1), "t8_ms": round(t8 * 1e3, 1),
                "per_step_ms": round((t8 - t2) / 6 * 1e3, 2),
            }
        row["speedup"] = round(
            row["bf16"]["per_step_ms"] / row["f8"]["per_step_ms"], 3)
        out["per_step"].append(row)
        print(f"[{name} B={b}] bf16 {row['bf16']['per_step_ms']} ms/step, "
              f"f8 {row['f8']['per_step_ms']} ms/step "
              f"({row['speedup']}x)", file=sys.stderr, flush=True)
        del xkv

    # greedy rollout agreement: same prompt + encoder state, both arms
    b = batches[0]
    enc = jnp.asarray(rng.standard_normal((b, 1500, dims.n_audio_state))
                      ).astype(jnp.bfloat16)
    xkv = jax.block_until_ready(make_xkv(enc))
    del enc

    @partial(jax.jit, static_argnames=("b",))
    def rollout(p, xkv, b):
        cache = wm.init_cache(dims, b, dtype=jnp.bfloat16, width=W)
        prompt = jnp.tile(jnp.asarray([[50258, 50259, 50359, 50363]], jnp.int32),
                          (b, 1))
        lg, _, cache = wm.decode(p, prompt, jnp.zeros((b,), jnp.int32), xkv,
                                 cache, dims, align=align, xkv_transposed=True)
        tok0 = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)

        def body(i, carry):
            toks, prev, cache = carry
            lg, _, cache = wm.decode(
                p, prev[:, None], jnp.full((b,), prompt.shape[1], jnp.int32) + i,
                xkv, cache, dims, align=align, xkv_transposed=True)
            nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
            toks = toks.at[:, i].set(prev)
            return toks, nxt, cache

        toks = jnp.zeros((b, rollout_steps), jnp.int32)
        toks, last, _ = jax.lax.fori_loop(0, rollout_steps, body,
                                          (toks, tok0, cache))
        return toks

    t_ref = np.asarray(rollout(params, xkv, b))
    t_f8 = np.asarray(rollout(qparams, xkv, b))
    first = (t_ref[:, 0] == t_f8[:, 0]).mean()
    # prefix agreement: fraction of the rollout identical before first split
    div = (t_ref != t_f8).argmax(axis=1)
    div = np.where((t_ref == t_f8).all(axis=1), rollout_steps, div)
    out["agreement"] = {
        "rollout_steps": rollout_steps,
        "lanes": int(b),
        "first_token_agree": round(float(first), 3),
        "tokenwise_agree": round(float((t_ref == t_f8).mean()), 3),
        "mean_agree_prefix": round(float(div.mean()), 2),
        "lanes_fully_identical": int((div == rollout_steps).sum()),
    }
    print(f"[{name}] agreement: {out['agreement']}", file=sys.stderr, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["large-v3"])
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--rollout", type=int, default=24)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    res = {"device": str(jax.devices()[0]),
           "runs": [run_model(m, args.batches, args.rollout)
                    for m in args.models]}
    print(json.dumps(res))
    if args.out:
        Path(args.out).write_text(json.dumps(res, indent=2) + "\n")


if __name__ == "__main__":
    main()
