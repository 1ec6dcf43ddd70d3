"""Per-tick cost decomposition of the PRODUCTION serving path.

bench.py measures the raw device tick (~0.35-0.45 s at large-v3 B=24/32);
the e2e serving benchmark sees multi-second group ticks. This probe drives
run_tick_batch exactly the way BatchScheduler does — N sessions wired to
the audio/enc/xkv pools, 1 s of audio per session per tick — and prints
per-tick wall time split into prepare (host), device call, and finish
(host policy), so the gap between the tick model and e2e serving is
attributable instead of guessed at.

Usage: python scripts/probe_e2e_tick_cost.py --n 24 --ticks 40
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from bench_e2e_serving import speech_like  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--ticks", type=int, default=40)
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--xkv-dtype", default="f8")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ab_inc_exact import build_engine  # noqa: E402

    from whisperlivekit_tpu.engine.scheduler import BatchScheduler
    from whisperlivekit_tpu.streaming import alignatt as A

    engine = build_engine(args.model, 1, args.xkv_dtype)
    # borrow the scheduler ONLY for its pool wiring (no asyncio loop)
    sched = BatchScheduler(engine, inline=True)
    sessions = []
    for _ in range(args.n):
        s = A.AlignAttSession(engine)
        s.pool = sched.pool
        s.enc_pool = sched.enc_pool
        s.xkv_alloc = sched.xkv
        sessions.append(s)

    tok = engine.tokenizer
    rows = []
    for i in range(args.ticks):
        t0 = time.perf_counter()
        tis, live = [], []
        for j, s in enumerate(sessions):
            s.insert_audio(speech_like(1.0, seed=j, t0=float(i)))
            ti = s.prepare_tick(False)
            if ti is not None:
                tis.append(ti)
                live.append(s)
        t1 = time.perf_counter()
        if not tis:
            continue
        outs = A.run_tick_batch(engine, tis, tok, pool=sched.pool,
                                enc_pool=sched.enc_pool, xkv=sched.xkv)
        t2 = time.perf_counter()
        for s, ti, o in zip(live, tis, outs):
            s.finish_tick(ti, o)
        t3 = time.perf_counter()
        modes = {}
        for ti in tis:
            k = ti.enc_mode or "legacy"
            if ti.xkv_slot is not None:
                k += "_xkv"
            modes[k] = modes.get(k, 0) + 1
        row = {
            "tick": i, "lanes": len(tis), "modes": modes,
            "prepare_ms": round((t1 - t0) * 1e3, 1),
            "device_ms": round((t2 - t1) * 1e3, 1),
            "finish_ms": round((t3 - t2) * 1e3, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    dev = sorted(r["device_ms"] for r in rows[5:])
    summary = {
        "n": args.n, "model": args.model,
        "device_ms_p50": dev[len(dev) // 2] if dev else None,
        "device_ms_p95": dev[min(int(0.95 * len(dev)), len(dev) - 1)] if dev else None,
        "prepare_ms_mean": round(float(np.mean([r["prepare_ms"] for r in rows[5:]])), 1) if len(rows) > 5 else None,
        "finish_ms_mean": round(float(np.mean([r["finish_ms"] for r in rows[5:]])), 1) if len(rows) > 5 else None,
        "phases": {k: {"n": n, "total_ms": round(t * 1e3, 1)}
                   for k, (n, t, *_l) in A.TICK_PHASE_STATS.items()},
    }
    print(json.dumps(summary))
    if args.out:
        Path(args.out).write_text(json.dumps({"rows": rows, "summary": summary}, indent=2) + "\n")


if __name__ == "__main__":
    main()
