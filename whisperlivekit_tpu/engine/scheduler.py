"""Multi-session batch scheduler — the north-star TPU component.

The reference runs one PyTorch decode per session per tick on its own asyncio
task (reference audio_processor.py:763-802 + SURVEY.md §2.10). Here all live
sessions' pending ticks are packed into device programs per scheduling
window; sessions at different decode depths coexist via per-lane prefix
lengths / content frames / stop state (streaming/alignatt.py run_tick_batch).

Scheduling policy (net-new; the reference has no analog):

- **Deadline-aware admission**: each submission carries a deadline
  (default: enqueue + tick_budget_s). The backlog is served
  earliest-deadline-first, so a lane that waited is served before a lane
  that just arrived — no starvation under overload.
- **Lane-group rotation**: when the backlog exceeds the lane-group width,
  the overflow forms the FRONT of the next group; groups rotate through the
  session population within the second — the capacity model the bench
  measures (bench.py: sustainable streams = B / amortized tick time).
- **Overload visibility, not audio drops**: under overload the queue wait
  grows (cadence degrades) and p50/p95 wait + word-emission latency are
  exported via ``stats()`` → /health; audio is never discarded by the
  scheduler (the reference's AudioProcessor watermark surfaces the lag).
- **Model-scaled lane groups**: group width is capped by model size
  (HBM bound: large-v3's per-lane cross-KV workspace limits groups to ~16).
"""

from __future__ import annotations

import asyncio
import logging
import os
import time
from typing import List, Optional, Tuple

from ..streaming.alignatt import (
    ANCHOR_REASONS,
    TICK_PHASE_STATS,
    AlignAttEngine,
    AlignAttSession,
    AudioPool,
    EncPool,
    TickInputs,
    XKVAllocator,
    dispatch_tick_batch,
    finalize_tick_batch,
    run_tick_batch,
)
from ..timed import ASRToken

logger = logging.getLogger(__name__)


def _auto_lane_cap(engine: AlignAttEngine, requested: int) -> int:
    """HBM/latency-bound lane-group width per model scale (measured on v5e,
    bench.py sub-metrics / docs/perf/capacity_r5.json): base peaks at B=64,
    turbo at B=32, large-v3 at B=24.

    large-v3 f8 pools *fit* at width 32 (capacity_r5.json: amortized tick
    445.7 ms under the tick model's 1-anchor-per-15-ticks assumption), but
    measured end-to-end serving is WORSE than 2x24 once real anchor churn
    hits (docs/perf/e2e_width32_r5.json: one width-32 group at n=32 ticks
    at 1062 ms p50 with 1588 ms anchors stalling all 32 lanes, vs 523 ms
    p50 for two 24-wide groups under the same load) — so 24 stays the
    default; an explicit request up to 32 is honored for anchor-light
    workloads where the tick model holds. bf16 pools OOM past 24
    (B=32 bf16: resident 10.7G + 5.6G temp > HBM)."""
    d = engine.dims
    if d.n_audio_state >= 1280 and d.n_text_layer >= 16:  # large-v3 class
        f8_pool = getattr(engine.cfg, "xkv_cache_dtype", "bf16") == "f8"
        if f8_pool and requested <= 32:  # explicit opt-in, HBM-feasible
            return requested
        return min(requested, 24)
    if d.n_audio_state >= 1280:  # turbo class
        return min(requested, 64)
    return requested


class _Pending:
    __slots__ = ("session", "ti", "fut", "deadline", "enqueued")

    def __init__(self, session, ti, fut, deadline, enqueued):
        self.session = session
        self.ti = ti
        self.fut = fut
        self.deadline = deadline
        self.enqueued = enqueued


class _Quantiles:
    """Bounded reservoir for p50/p95 reporting."""

    def __init__(self, cap: int = 512):
        self.cap = cap
        self.values: List[float] = []
        self._i = 0

    def add(self, v: float) -> None:
        if len(self.values) < self.cap:
            self.values.append(v)
        else:
            self.values[self._i % self.cap] = v
        self._i += 1

    def quantile(self, q: float) -> Optional[float]:
        if not self.values:
            return None
        xs = sorted(self.values)
        return xs[min(int(q * len(xs)), len(xs) - 1)]


class BatchScheduler:
    def __init__(
        self,
        engine: AlignAttEngine,
        max_lanes: int = 96,
        window_s: float = 0.02,
        tick_budget_s: float = 1.0,
        inline: Optional[bool] = None,
        profile_dir: Optional[str] = None,
        profile_ticks: int = 5,
        incremental_encode: bool = True,
    ):
        self.engine = engine
        self.max_lanes = _auto_lane_cap(engine, max_lanes)
        self.window_s = window_s
        self.tick_budget_s = tick_budget_s
        if inline is None:
            inline = os.environ.get("JAX_PLATFORMS", "") == "axon"
        self.inline = inline
        self._queue: Optional[asyncio.Queue] = None
        self._task: Optional[asyncio.Task] = None
        self._carry: List[_Pending] = []  # rotation: overflow leads next group
        self.n_ticks = 0
        self.n_lanes_served = 0
        self.n_rotations = 0
        self._wait_q = _Quantiles()
        self._emit_q = _Quantiles()
        self._tick_q = _Quantiles()
        self._tick_ewma = 0.0  # device-tick wall estimate for the yield sleep
        TICK_PHASE_STATS.clear()
        ANCHOR_REASONS.clear()
        # jax profiler: trace the first N ticks into profile_dir (view with
        # tensorboard / xprof) — the serving-path observability hook.
        self._profile_dir = profile_dir
        self._profile_ticks = profile_ticks
        self._profiling = False
        # device-resident audio windows: sessions ship only new samples
        self.pool = AudioPool(capacity=4 * self.max_lanes)
        # per-lane encoder-frame caches: each tick re-encodes only the window
        # tail (the ~30x full re-encode redundancy is the reference's main
        # throughput wall at large models; see alignatt_tick_inc)
        self.enc_pool: Optional[EncPool] = None
        self.xkv: Optional[XKVAllocator] = None
        if incremental_encode:
            dtype = engine.params["decoder"]["tok_emb"].dtype
            # sized with the audio pool (4x lanes), NOT the tick width: a
            # session without an enc lane falls to the legacy full
            # re-encode program every tick (ragged width + whole-window
            # upload), which poisons group ticks once live sessions exceed
            # the cap. A lane is T_ctx x d rows (3.84 MB at large-v3) —
            # cheap next to one xkv group (~3 GB).
            self.enc_pool = EncPool(4 * self.max_lanes + 1, engine.dims, dtype=dtype)
            cfg = engine.cfg
            if getattr(cfg, "xkv_cache", False) and not engine.use_cif:
                import jax.numpy as jnp

                xdt = (
                    jnp.float8_e4m3fn
                    if getattr(cfg, "xkv_cache_dtype", "bf16") == "f8"
                    else dtype
                )
                block_s = cfg.evict_block_s or cfg.audio_max_len / 2
                self.xkv = XKVAllocator.for_engine(
                    engine, self.max_lanes, dtype=xdt,
                    budget_bytes=getattr(cfg, "xkv_budget_bytes", 9 << 30),
                    epoch_period=max(2, int(round(block_s))),
                    anchor_cohorts=getattr(cfg, "anchor_cohorts", 1),
                )
        # AOT-compile the steady-serving program set off the critical path
        # (persistent compile cache): without this the first multi-group
        # anchor / straggler shape compiles mid-stream and stalls every
        # session of the group for 30-90 s (observed e2e r3)
        self._precompile_thread = None
        if self.xkv is not None and os.environ.get("WLK_PRECOMPILE", "1").lower() not in (
            "0", "false", "off"
        ):
            import jax

            if jax.default_backend() == "tpu":
                import threading

                from ..streaming.alignatt import precompile_serving_programs

                self._precompile_thread = threading.Thread(
                    target=precompile_serving_programs,
                    args=(engine, self.xkv, self.enc_pool.capacity, self.pool.capacity),
                    daemon=True, name="serving-precompile",
                )
                self._precompile_thread.start()

    # ---- public API ------------------------------------------------------------

    async def submit(
        self,
        session: AlignAttSession,
        tick_inputs: TickInputs,
        deadline: Optional[float] = None,
    ) -> List[ASRToken]:
        """Queue one session's prepared tick; resolves to its emitted words.

        ``deadline`` (loop-clock seconds) orders admission under overload;
        default = now + tick_budget (one tick per second of audio)."""
        self._ensure_running()
        loop = asyncio.get_running_loop()
        now = loop.time()
        fut: asyncio.Future = loop.create_future()
        await self._queue.put(
            _Pending(session, tick_inputs, fut, deadline or now + self.tick_budget_s, now)
        )
        return await fut

    def reset_stats(self) -> None:
        """Zero the counters/quantiles (benchmark warm-up exclusion)."""
        self.n_ticks = 0
        self.n_lanes_served = 0
        self.n_rotations = 0
        self._wait_q = _Quantiles()
        self._emit_q = _Quantiles()
        self._tick_q = _Quantiles()
        TICK_PHASE_STATS.clear()
        ANCHOR_REASONS.clear()

    def stats(self) -> dict:
        return {
            "n_ticks": self.n_ticks,
            "n_lanes_served": self.n_lanes_served,
            "avg_lanes_per_tick": round(self.n_lanes_served / max(self.n_ticks, 1), 2),
            "max_lanes": self.max_lanes,
            "n_rotations": self.n_rotations,
            "backlog": (self._queue.qsize() if self._queue else 0) + len(self._carry),
            "tick_ms_p50": _ms(self._tick_q.quantile(0.5)),
            "tick_ms_p95": _ms(self._tick_q.quantile(0.95)),
            "queue_wait_p50_ms": _ms(self._wait_q.quantile(0.5)),
            "queue_wait_p95_ms": _ms(self._wait_q.quantile(0.95)),
            "word_emission_p50_ms": _ms(self._emit_q.quantile(0.5)),
            "word_emission_p95_ms": _ms(self._emit_q.quantile(0.95)),
            **({"xkv": self.xkv.stats()} if self.xkv is not None else {}),
            "tick_phases": {
                k: {"n": n, "total_ms": round(tot * 1e3, 1),
                    "mean_ms": round(tot / n * 1e3, 1),
                    "mean_lanes": round(lanes / n, 1)}
                for k, (n, tot, lanes) in TICK_PHASE_STATS.items() if n
            },
            "anchor_reasons": dict(ANCHOR_REASONS),
        }

    # ---- internals ----------------------------------------------------------------

    def _maybe_profile(self) -> None:
        if self._profile_dir is None:
            return
        import jax

        if not self._profiling and self.n_ticks == 0:
            jax.profiler.start_trace(self._profile_dir)
            self._profiling = True
            logger.info("profiling first %d ticks -> %s", self._profile_ticks, self._profile_dir)
        elif self._profiling and self.n_ticks >= self._profile_ticks:
            jax.profiler.stop_trace()
            self._profiling = False
            logger.info("profile trace written to %s", self._profile_dir)

    def _ensure_running(self) -> None:
        loop = asyncio.get_running_loop()
        if self._task is None or self._task.done():
            self._queue = asyncio.Queue()
            self._carry = []
            self._task = loop.create_task(self._run(), name="batch-scheduler")

    async def _gather_group(self) -> List[_Pending]:
        """One lane group: carried overflow first (rotation), then the queue
        drained for up to window_s, ordered earliest-deadline-first."""
        loop = asyncio.get_running_loop()
        batch = list(self._carry)
        self._carry = []
        if not batch:
            batch.append(await self._queue.get())
        deadline = loop.time() + self.window_s
        while True:
            timeout = deadline - loop.time()
            if timeout <= 0:
                break
            try:
                batch.append(await asyncio.wait_for(self._queue.get(), timeout))
            except asyncio.TimeoutError:
                break
        # drain whatever arrived while packing (no extra waiting)
        while True:
            try:
                batch.append(self._queue.get_nowait())
            except asyncio.QueueEmpty:
                break

        # group-coherent dispatch: the pooled inc program always runs at the
        # group's FULL width in slot order (alignatt_tick_inc_skv — the
        # decode reads the pool arrays directly), so a window that mixes
        # lanes of two xkv groups runs one full-width program PER group —
        # 24 lanes split 12+12 cost ~2x the device time of 24 coherent
        # lanes (the r3 e2e inc-tick mean was 3.2x the tick model's; this
        # was the dominant term). Serve the earliest-deadline lane's group
        # now; carry other groups' lanes (their deadlines keep EDF order).
        if len(batch) > 1:
            batch.sort(key=lambda p: p.deadline)
            key0 = batch[0].ti.xkv_gi
            same = [p for p in batch if p.ti.xkv_gi == key0]
            rest = [p for p in batch if p.ti.xkv_gi != key0]
            if rest:
                # stay coherent even under overload (len(same) > max_lanes):
                # the truncation below keeps same[:max_lanes] — all from the
                # earliest-deadline group — and the overflow carries with the
                # other groups' lanes (EDF order preserved by the next sort)
                self._carry = rest + self._carry
                batch = same
        if len(batch) > self.max_lanes:
            self._carry = batch[self.max_lanes :] + self._carry
            batch = batch[: self.max_lanes]
            self.n_rotations += 1
        return batch

    async def _run(self) -> None:
        while True:
            batch = await self._gather_group()
            loop = asyncio.get_running_loop()
            t_start = loop.time()
            for p in batch:
                self._wait_q.add(t_start - p.enqueued)

            tis = [p.ti for p in batch]
            self._maybe_profile()
            try:
                if self.inline:
                    # axon: device calls must run ON the loop thread — but
                    # dispatch is async, so enqueue the window's programs,
                    # then yield the loop for ~the expected device time
                    # before the blocking output fetch. Without this every
                    # tick froze audio feeding/tick prep for its full
                    # duration (~60% of wall at 40 sessions).
                    pends = dispatch_tick_batch(
                        self.engine, tis, self.engine.tokenizer,
                        self.pool, self.enc_pool, self.xkv,
                    )
                    if self._tick_ewma:
                        # undersleep is free (the fetch blocks for the
                        # remainder); oversleep self-corrects (measured
                        # wall = the sleep < the EWMA, so it decays)
                        await asyncio.sleep(min(0.6 * self._tick_ewma, 1.0))
                    outs = finalize_tick_batch(pends, len(tis))
                else:
                    outs = await asyncio.to_thread(
                        run_tick_batch, self.engine, tis, self.engine.tokenizer,
                        self.pool, self.enc_pool, self.xkv,
                    )
                self.n_ticks += 1
                self.n_lanes_served += len(batch)
                t_done = loop.time()
                self._tick_q.add(t_done - t_start)
                self._tick_ewma = (
                    0.7 * self._tick_ewma + 0.3 * (t_done - t_start)
                    if self._tick_ewma else (t_done - t_start)
                )
                for p, out in zip(batch, outs):
                    self._emit_q.add(t_done - p.enqueued)
                    if not p.fut.done():
                        try:
                            p.fut.set_result(p.session.finish_tick(p.ti, out))
                        except Exception as e:  # per-lane host policy error
                            p.fut.set_exception(e)
            except Exception as e:
                logger.exception("batch tick failed")
                for p in batch:
                    if not p.fut.done():
                        p.fut.set_exception(e)


def _ms(v: Optional[float]) -> Optional[float]:
    return round(v * 1e3, 1) if v is not None else None
