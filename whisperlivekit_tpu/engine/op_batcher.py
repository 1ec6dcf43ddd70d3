"""Generic micro-batching of device ops across sessions.

The AlignAtt path batches whole ticks (engine/scheduler.py); causal
backends (qwen3 / voxtral-realtime) instead issue a small stream of typed
ops per session — append-block, decode-hypothesis, prime — whose order
matters within a session but not across sessions. This batcher gives each
op type its own queue; concurrent sessions' ops of the same type collect for
up to ``window_s`` and run as ONE device call, so the compute functions'
lane-batching (models/qwen3_asr.py takes [B, ...] everywhere) turns into
session-level packing without entangling the host policy.

Platform note: on axon the runner executes inline on the event loop (jax
dispatched from worker threads wedges the tunnel — see
session/processor._inline_inference_default).
"""

from __future__ import annotations

import asyncio
import logging
from typing import Any, Callable, Dict, List, Optional

logger = logging.getLogger(__name__)


class OpBatcher:
    def __init__(self, window_s: float = 0.01, inline: Optional[bool] = None):
        self.window_s = window_s
        if inline is None:
            from ..session.processor import _inline_inference_default

            inline = _inline_inference_default()
        self.inline = inline
        # op types run on independent tasks but share mutable device state
        # (the lane pools) and use donation — device calls must serialize
        self._exec_lock = asyncio.Lock()
        self._runners: Dict[str, Callable[[List[Any]], List[Any]]] = {}
        self._queues: Dict[str, asyncio.Queue] = {}
        self._tasks: Dict[str, asyncio.Task] = {}
        self.n_batches: Dict[str, int] = {}
        self.n_ops: Dict[str, int] = {}

    def register(self, op: str, run_batch: Callable[[List[Any]], List[Any]]) -> None:
        """``run_batch(payloads) -> results`` packs same-typed ops into one
        device call; results scatter back by position."""
        self._runners[op] = run_batch
        self.n_batches[op] = 0
        self.n_ops[op] = 0

    async def submit(self, op: str, payload: Any) -> Any:
        self._ensure_running(op)
        fut = asyncio.get_running_loop().create_future()
        await self._queues[op].put((payload, fut))
        return await fut

    def stats(self) -> dict:
        return {
            op: {
                "batches": self.n_batches[op],
                "ops": self.n_ops[op],
                "avg_ops_per_batch": round(self.n_ops[op] / max(self.n_batches[op], 1), 2),
            }
            for op in self._runners
        }

    def _ensure_running(self, op: str) -> None:
        loop = asyncio.get_running_loop()
        task = self._tasks.get(op)
        if task is None or task.done():
            self._queues[op] = asyncio.Queue()
            self._tasks[op] = loop.create_task(self._run(op), name=f"opbatch-{op}")

    async def _run(self, op: str) -> None:
        queue = self._queues[op]
        runner = self._runners[op]
        loop = asyncio.get_running_loop()
        while True:
            batch = [await queue.get()]
            deadline = loop.time() + self.window_s
            while True:
                timeout = deadline - loop.time()
                if timeout <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(queue.get(), timeout))
                except asyncio.TimeoutError:
                    break
            while True:  # drain whatever arrived during packing
                try:
                    batch.append(queue.get_nowait())
                except asyncio.QueueEmpty:
                    break

            payloads = [p for p, _ in batch]
            try:
                async with self._exec_lock:
                    if self.inline:
                        results = runner(payloads)
                    else:
                        results = await asyncio.to_thread(runner, payloads)
                self.n_batches[op] += 1
                self.n_ops[op] += len(batch)
                for (_, fut), res in zip(batch, results):
                    if not fut.done():
                        fut.set_result(res)
            except Exception as e:
                logger.exception("op batch %s failed", op)
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
