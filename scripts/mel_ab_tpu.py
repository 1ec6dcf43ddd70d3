"""Pallas fused log-mel vs XLA log-mel on the real chip (scalar-reduced sync).

The wire-or-kill measurement for ops/mel_pallas.py (round-1 VERDICT item 7).
Writes /tmp/mel_ab.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from whisperlivekit_tpu.audio.mel import log_mel_spectrogram

RESULTS = {"device": str(jax.devices()[0])}


def timeit(fn, *a, iters=6):
    s = fn(*a)
    float(np.asarray(s))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*a)
        float(np.asarray(s))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    xla = jax.jit(
        lambda a: log_mel_spectrogram(a, precision=jax.lax.Precision.DEFAULT).sum()
    )
    try:
        from whisperlivekit_tpu.ops.mel_pallas import log_mel_pallas

        pallas = jax.jit(lambda a: log_mel_pallas(a).sum())
    except Exception as e:
        pallas = None
        RESULTS["pallas_import"] = f"FAILED {e}"

    for B in (16, 64):
        audio = jnp.asarray((0.1 * rng.standard_normal((B, 16000 * 30))).astype(np.float32))
        RESULTS[f"xla_B{B}_ms"] = round(timeit(xla, audio) * 1e3, 2)
        if pallas is not None:
            try:
                RESULTS[f"pallas_B{B}_ms"] = round(timeit(pallas, audio) * 1e3, 2)
            except Exception as e:
                RESULTS[f"pallas_B{B}_ms"] = f"FAILED {type(e).__name__}"
        print(f"B={B}: xla={RESULTS[f'xla_B{B}_ms']} pallas={RESULTS.get(f'pallas_B{B}_ms')}",
              file=sys.stderr, flush=True)
    with open("/tmp/mel_ab.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
