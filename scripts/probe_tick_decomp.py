"""Decompose the large-v3 incremental tick: front / cross_kv / prefill / loop.

Builds staged partial programs that share the real tick's inputs and times
them with scalar-readback sync (axon has ~25 ms fixed dispatch+readback
latency; stages are compared against each other, so the constant cancels
in the deltas). Writes /tmp/tick_decomp.json.
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

import bench as bx
from whisperlivekit_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS, default_alignment_heads
from whisperlivekit_tpu.streaming import alignatt as A

NAME = "large-v3"
B = 24
TAIL = 256
STEPS = 8
RESULTS = {}


def timeit(fn, *a, iters=4):
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    dims = MODEL_DIMS[NAME]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    suppress = bx._suppress(dims)
    al, ah = bx._align(dims, NAME)
    core = bx._core_args(dims, B, rng, suppress, al, ah)
    statics = bx._statics(dims, xkv_f8=False)

    audio_pool = jnp.asarray(rng.integers(-3000, 3000, (B, 16000 * 30)).astype(np.int16))
    enc_pool = jnp.zeros((B + 1, dims.n_audio_ctx, dims.n_audio_state), jnp.bfloat16)
    lanes = jnp.arange(B, dtype=jnp.int32)
    enc_lanes = lanes + 1
    tail_start = jnp.full((B,), 1500 - TAIL, jnp.int32)
    win = jnp.full((B,), 1500, jnp.int32)
    write_start = jnp.full((B,), 1500 - 50 - 32, jnp.int32)

    # ---- stage 1: front (slice + mel + tail encode + merge) ----
    @partial(jax.jit, static_argnames=("tail_frames",), donate_argnums=(2,))
    def front(params, audio_pool, enc_pool, tail_frames=TAIL):
        S_tail = (tail_frames + 1) * 320
        rows = audio_pool[lanes]
        samp_idx = tail_start[:, None] * 320 + jnp.arange(S_tail, dtype=jnp.int32)[None, :]
        tail = jnp.take_along_axis(rows, jnp.minimum(samp_idx, rows.shape[1] - 1), axis=1)
        tail = jnp.where(samp_idx < rows.shape[1], tail, 0).astype(jnp.float32) / 32768.0
        mel = log_mel_spectrogram(tail, n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT)
        mel = pad_or_trim(mel, 2 * tail_frames)
        enc_tail = wm.encode(params, mel, dims, pos_start=tail_start)
        cached = enc_pool[enc_lanes]
        t_idx = jnp.arange(dims.n_audio_ctx, dtype=jnp.int32)[None, :]
        src = jnp.clip(t_idx - tail_start[:, None], 0, tail_frames - 1)
        fresh = jnp.take_along_axis(enc_tail.astype(enc_pool.dtype), src[:, :, None], axis=1)
        in_write = (t_idx >= write_start[:, None]) & (t_idx < win[:, None])
        enc_rows = jnp.where(in_write[:, :, None], fresh, cached)
        # scalar probe output: the axon tunnel moves ~18 MB/s, so returning
        # enc_rows for host readback would swamp the timing with transfer
        return enc_rows.astype(jnp.float32).sum(), enc_pool.at[enc_lanes].set(enc_rows)

    # ---- stage 2: + cross_kv (transposed) ----
    @jax.jit
    def to_xkv(params, enc_rows):
        return wm.cross_kv(params, enc_rows, dims, transposed=True)

    # ---- stage 3: + prefill ----
    align = wm.AlignSpec(layers=al, heads=ah)
    prefix, prefix_len = core[0], core[1]

    @jax.jit
    def prefill(params, xkv):
        cache = wm.init_cache(dims, B, dtype=jnp.bfloat16, width=bx.PREFIX_BUCKET + STEPS + 1)
        row_mask = (jnp.arange(bx.PREFIX_BUCKET)[None, :] < prefix_len[:, None]).astype(jnp.float32)
        last1 = (jnp.arange(bx.PREFIX_BUCKET)[None, :] == (prefix_len - 1)[:, None]).astype(jnp.float32)
        lg, (a, q, l), cache = wm.decode(
            params, prefix, jnp.zeros((B,), jnp.int32), xkv, cache, dims,
            align=align, align_reduce=(row_mask, last1), xkv_transposed=True,
        )
        return lg[:, -1].sum(), cache

    # ---- full tick for reference ----
    state = {"enc_pool": jnp.zeros_like(enc_pool)}

    def full_tick():
        out = A.alignatt_tick_inc(
            params, audio_pool, state["enc_pool"], lanes, enc_lanes,
            tail_start, win, write_start, *core, **statics, tail_frames=TAIL,
        )
        state["enc_pool"] = out[-1]
        return out[1]

    ep = {"p": jnp.zeros_like(enc_pool)}

    def run_front():
        enc_rows, ep["p"] = front(params, audio_pool, ep["p"])
        return enc_rows

    t_full = timeit(full_tick, iters=3)
    del state  # free the tick's pools before staging buffers go live

    t_front = timeit(run_front)

    @partial(jax.jit, static_argnames=("tail_frames",))
    def front_rows(params, audio_pool, enc_pool, tail_frames=TAIL):
        # enc_rows for the staged xkv/prefill probes (no donation, no sum)
        S_tail = (tail_frames + 1) * 320
        rows = audio_pool[lanes]
        samp_idx = tail_start[:, None] * 320 + jnp.arange(S_tail, dtype=jnp.int32)[None, :]
        tail = jnp.take_along_axis(rows, jnp.minimum(samp_idx, rows.shape[1] - 1), axis=1)
        tail = jnp.where(samp_idx < rows.shape[1], tail, 0).astype(jnp.float32) / 32768.0
        mel = log_mel_spectrogram(tail, n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT)
        mel = pad_or_trim(mel, 2 * tail_frames)
        enc_tail = wm.encode(params, mel, dims, pos_start=tail_start)
        cached = enc_pool[enc_lanes]
        t_idx = jnp.arange(dims.n_audio_ctx, dtype=jnp.int32)[None, :]
        src = jnp.clip(t_idx - tail_start[:, None], 0, tail_frames - 1)
        fresh = jnp.take_along_axis(enc_tail.astype(enc_pool.dtype), src[:, :, None], axis=1)
        in_write = (t_idx >= write_start[:, None]) & (t_idx < win[:, None])
        return jnp.where(in_write[:, :, None], fresh, cached).astype(jnp.bfloat16)

    enc_rows = front_rows(params, audio_pool, ep["p"])

    t_xkv = timeit(lambda: to_xkv(params, enc_rows)[0][:1, :1, :1, :1, :1])
    RESULTS["xkv_standalone_ms"] = round((t_xkv) * 1e3, 1)
    xkv = to_xkv(params, enc_rows)
    t_prefill = timeit(lambda: prefill(params, xkv)[0])
    del xkv

    # dispatch+readback constant: measure a no-op jit
    noop = jax.jit(lambda x: x[0, :1] + 1)
    t_rt = timeit(lambda: noop(audio_pool))

    RESULTS.update(
        roundtrip_ms=round(t_rt * 1e3, 1),
        front_ms=round(t_front * 1e3, 1),
        front_plus_xkv_ms=round((t_xkv) * 1e3, 1),
        xkv_only_note="xkv timed standalone (enc_rows already on device)",
        prefill_ms=round(t_prefill * 1e3, 1),
        full_tick_ms=round(t_full * 1e3, 1),
        B=B, tail=TAIL, steps=STEPS,
    )
    print(json.dumps(RESULTS, indent=1))
    with open("/tmp/tick_decomp.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
