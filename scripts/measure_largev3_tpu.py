"""Real-chip component measurements for the large-v3 streaming tick.

Run ON the axon TPU (not CPU). One process, gentle exit (no SIGKILL).
All timed programs reduce their outputs to ONE scalar in-graph, so the
tunnel readback is 4 bytes (block_until_ready is a no-op on axon; full-array
readback dominates and corrupts timings).

Produces JSON on stdout + /tmp/measure_largev3.json; drives the
incremental-encoding design and the Pallas-mel wire-or-kill decision.
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
from whisperlivekit_tpu.streaming.alignatt import alignatt_tick

EOT = 50257
TS_BEGIN = 50364
NO_SPEECH = 50362
SPACE = 220
RESULTS = {"platform": jax.default_backend(), "device": str(jax.devices()[0])}


def timeit(fn, *a, iters=3, **kw):
    s = fn(*a, **kw)
    float(np.asarray(s))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*a, **kw)
        float(np.asarray(s))
    return (time.perf_counter() - t0) / iters


def tick_args(dims, params, B, rng, suppress_mask, align_layers, align_heads):
    audio = jnp.asarray((0.1 * rng.standard_normal((B, 16000 * 30))).astype(np.float32))
    prefix = np.full((B, 64), EOT, np.int32)
    prefix[:, 0:4] = [50258, 50259, 50359, 50363]
    prefix[:, 4:20] = rng.integers(100, 40000, (B, 16))
    return (
        params, audio, jnp.asarray(prefix),
        jnp.full((B,), 20, jnp.int32), jnp.zeros((B,), jnp.int32),
        jnp.full((B,), 1500, jnp.int32), jnp.full((B,), -200, jnp.int32),
        jnp.zeros((B,), bool), jnp.full((B,), 10**6, jnp.int32),
        suppress_mask, align_layers, align_heads,
        jnp.int32(-(10**9)), jnp.int32(10**9), jnp.float32(2.0),
        jnp.ones((B,), bool),
        jnp.zeros((dims.n_audio_state,), jnp.float32), jnp.float32(0.0),
    )


def bench_model(name, widths, decode_steps=8):
    dims = MODEL_DIMS[name]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pairs = np.asarray(default_alignment_heads(dims, name), np.int32).reshape(-1, 2)
    align_layers = jnp.asarray(pairs[:, 0])
    align_heads = jnp.asarray(pairs[:, 1])
    suppress = np.zeros(dims.n_vocab, np.float32)
    suppress[TS_BEGIN:] = -np.inf
    suppress_mask = jnp.asarray(suppress)
    out = {}

    # -- full tick (outputs are already small: tokens/frames per lane) --
    def tick(*a):
        outs = alignatt_tick(*a, dims, 64, decode_steps, EOT, TS_BEGIN, NO_SPEECH, SPACE)
        return outs.sum()  # packed output — forces the whole program

    for B in widths:
        try:
            args = tick_args(dims, params, B, rng, suppress_mask, align_layers, align_heads)
            dt = timeit(tick, *args)
            out[f"full_tick_B{B}_ms"] = round(dt * 1e3, 1)
            out[f"full_tick_B{B}_streams"] = round(B / dt, 1)
            print(f"{name} full tick B={B}: {dt*1e3:.1f} ms -> {B/dt:.1f} streams",
                  file=sys.stderr, flush=True)
            del args
        except Exception as e:
            out[f"full_tick_B{B}_ms"] = f"FAILED {type(e).__name__}"
            print(f"{name} full tick B={B}: FAILED {e}", file=sys.stderr, flush=True)
            break

    # -- encoder cost vs frames (scalar-reduced) --
    Bf = 16

    @partial(jax.jit, static_argnames=())
    def enc_sum(m):
        return wm.encode(params, m, dims).astype(jnp.float32).sum()

    for frames in (256, 384, 512, 768, 1500):
        mel = jnp.asarray(rng.standard_normal((Bf, dims.n_mels, 2 * frames)).astype(np.float32))
        try:
            dt = timeit(enc_sum, mel)
            out[f"encode_B{Bf}_F{frames}_ms"] = round(dt * 1e3, 1)
            print(f"{name} encode B={Bf} F={frames}: {dt*1e3:.1f} ms", file=sys.stderr, flush=True)
        except Exception as e:
            out[f"encode_B{Bf}_F{frames}_ms"] = f"FAILED {type(e).__name__}"

    # -- cross-kv / prefill / decode-step (scalar-reduced) --
    enc = jnp.asarray(
        rng.standard_normal((Bf, dims.n_audio_ctx, dims.n_audio_state))
    ).astype(jnp.bfloat16)

    @jax.jit
    def xkv_sum(e):
        kv = wm.cross_kv(params, e, dims)
        return kv.k.astype(jnp.float32).sum()

    dt = timeit(xkv_sum, enc)
    out[f"cross_kv_B{Bf}_ms"] = round(dt * 1e3, 1)
    print(f"{name} cross_kv B={Bf}: {dt*1e3:.1f} ms", file=sys.stderr, flush=True)

    toks = jnp.asarray(rng.integers(100, 40000, (Bf, 64)).astype(np.int32))
    pos0 = jnp.zeros((Bf,), jnp.int32)

    @jax.jit
    def prefill_sum(e, t):
        kv = wm.cross_kv(params, e, dims)
        cache = wm.init_cache(dims, Bf, dtype=jnp.bfloat16)
        lg, _, _ = wm.decode(params, t, pos0, kv, cache, dims)
        return lg[:, -1].sum()

    dt = timeit(prefill_sum, enc, toks)
    out[f"xkv_plus_prefill64_B{Bf}_ms"] = round(dt * 1e3, 1)
    print(f"{name} xkv+prefill(64) B={Bf}: {dt*1e3:.1f} ms", file=sys.stderr, flush=True)

    @jax.jit
    def steps_sum(e, t):
        kv = wm.cross_kv(params, e, dims)
        cache = wm.init_cache(dims, Bf, dtype=jnp.bfloat16)
        lg, _, cache = wm.decode(params, t, pos0, kv, cache, dims)

        def body(i, carry):
            acc, cache = carry
            lg, _, cache = wm.decode(
                params, jnp.full((Bf, 1), 1000, jnp.int32),
                jnp.full((Bf,), 64, jnp.int32) + i, kv, cache, dims,
            )
            return acc + lg[:, -1, 0].sum(), cache

        acc, _ = jax.lax.fori_loop(0, 8, body, (jnp.float32(0.0), cache))
        return acc

    dt = timeit(steps_sum, enc, toks)
    d8 = dt - timeit(prefill_sum, enc, toks)
    out[f"decode8_extra_B{Bf}_ms"] = round(d8 * 1e3, 1)
    print(f"{name} 8 decode steps (extra over prefill) B={Bf}: {d8*1e3:.1f} ms",
          file=sys.stderr, flush=True)
    return out


def bench_mel_ab():
    """Pallas fused mel vs XLA mel, scalar-reduced (streaming precision)."""
    from whisperlivekit_tpu.audio.mel import log_mel_spectrogram
    from whisperlivekit_tpu.ops.mel_pallas import log_mel_pallas

    rng = np.random.default_rng(0)
    out = {}
    for B in (16, 64):
        audio = jnp.asarray((0.1 * rng.standard_normal((B, 16000 * 30))).astype(np.float32))
        xla = jax.jit(
            lambda a: log_mel_spectrogram(a, precision=jax.lax.Precision.DEFAULT).sum()
        )
        out[f"mel_xla_B{B}_ms"] = round(timeit(xla, audio, iters=5) * 1e3, 1)
        try:
            pl = jax.jit(lambda a: log_mel_pallas(a).sum())
            out[f"mel_pallas_B{B}_ms"] = round(timeit(pl, audio, iters=5) * 1e3, 1)
        except Exception as e:
            out[f"mel_pallas_B{B}_ms"] = f"FAILED {type(e).__name__}: {e}"
        print(f"mel A/B B={B}: xla={out[f'mel_xla_B{B}_ms']} pallas={out[f'mel_pallas_B{B}_ms']}",
              file=sys.stderr, flush=True)
    return out


def main():
    RESULTS["large-v3"] = bench_model("large-v3", (8, 16, 24))
    _dump()
    RESULTS["large-v3-turbo"] = bench_model("large-v3-turbo", (16, 32, 64))
    _dump()
    RESULTS["mel_ab"] = bench_mel_ab()
    _dump()
    print(json.dumps(RESULTS, indent=1))


def _dump():
    with open("/tmp/measure_largev3.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
