"""Multi-session batch scheduler — the north-star TPU component.

The reference runs one PyTorch decode per session per tick on its own asyncio
task (reference audio_processor.py:763-802 + SURVEY.md §2.10). Here all live
sessions' pending ticks are packed into ONE device program per scheduling
window: lanes are collected from an asyncio queue for up to ``window_s``
(or until ``max_lanes``), padded to a power-of-two batch, executed by
``run_tick_batch`` (streaming/alignatt.py), and the per-lane results are
scattered back through futures. Sessions at different decode depths coexist
via per-lane prefix lengths / content frames / stop state.

Throughput math (bench.py, whisper-base, 1x v5e): a 64-lane tick costs
~0.34 s — 64 sessions' seconds of audio for a third of a second of chip
time, vs 64 sequential single-lane ticks at ~52 ms each (3.3 s).
"""

from __future__ import annotations

import asyncio
import logging
import os
from typing import List, Optional, Tuple

from ..streaming.alignatt import (
    AlignAttEngine,
    AlignAttSession,
    AudioPool,
    EncPool,
    TickInputs,
    run_tick_batch,
)
from ..timed import ASRToken

logger = logging.getLogger(__name__)


class BatchScheduler:
    def __init__(
        self,
        engine: AlignAttEngine,
        max_lanes: int = 64,
        window_s: float = 0.02,
        inline: Optional[bool] = None,
        profile_dir: Optional[str] = None,
        profile_ticks: int = 5,
        incremental_encode: bool = True,
    ):
        self.engine = engine
        self.max_lanes = max_lanes
        self.window_s = window_s
        if inline is None:
            inline = os.environ.get("JAX_PLATFORMS", "") == "axon"
        self.inline = inline
        self._queue: Optional[asyncio.Queue] = None
        self._task: Optional[asyncio.Task] = None
        self.n_ticks = 0
        self.n_lanes_served = 0
        # jax profiler: trace the first N ticks into profile_dir (view with
        # tensorboard / xprof) — the serving-path observability hook.
        self._profile_dir = profile_dir
        self._profile_ticks = profile_ticks
        self._profiling = False
        # device-resident audio windows: sessions ship only new samples
        self.pool = AudioPool(capacity=4 * max_lanes)
        # per-lane encoder-frame caches: each tick re-encodes only the window
        # tail (the ~30x full re-encode redundancy is the reference's main
        # throughput wall at large models; see alignatt_tick_inc)
        self.enc_pool: Optional[EncPool] = None
        if incremental_encode:
            dtype = engine.params["decoder"]["tok_emb"].dtype
            self.enc_pool = EncPool(2 * max_lanes + 1, engine.dims, dtype=dtype)

    # ---- public API ------------------------------------------------------------

    async def submit(
        self, session: AlignAttSession, tick_inputs: TickInputs
    ) -> List[ASRToken]:
        """Queue one session's prepared tick; resolves to its emitted words."""
        self._ensure_running()
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self._queue.put((session, tick_inputs, fut))
        return await fut

    def stats(self) -> dict:
        return {
            "n_ticks": self.n_ticks,
            "n_lanes_served": self.n_lanes_served,
            "avg_lanes_per_tick": round(self.n_lanes_served / max(self.n_ticks, 1), 2),
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
            self._task = loop.create_task(self._run(), name="batch-scheduler")

    async def _run(self) -> None:
        while True:
            batch: List[Tuple] = [await self._queue.get()]
            deadline = asyncio.get_running_loop().time() + self.window_s
            while len(batch) < self.max_lanes:
                timeout = deadline - asyncio.get_running_loop().time()
                if timeout <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(self._queue.get(), timeout))
                except asyncio.TimeoutError:
                    break

            sessions = [b[0] for b in batch]
            tis = [b[1] for b in batch]
            futs = [b[2] for b in batch]
            self._maybe_profile()
            try:
                if self.inline:
                    outs = run_tick_batch(
                        self.engine, tis, self.engine.tokenizer,
                        pool=self.pool, enc_pool=self.enc_pool,
                    )
                else:
                    outs = await asyncio.to_thread(
                        run_tick_batch, self.engine, tis, self.engine.tokenizer,
                        self.pool, self.enc_pool,
                    )
                self.n_ticks += 1
                self.n_lanes_served += len(batch)
                for session, ti, fut, out in zip(sessions, tis, futs, outs):
                    if not fut.done():
                        try:
                            fut.set_result(session.finish_tick(ti, out))
                        except Exception as e:  # per-lane host policy error
                            fut.set_exception(e)
            except Exception as e:
                logger.exception("batch tick failed")
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)
