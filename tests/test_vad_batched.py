"""Batched VAD scheduler: lane isolation vs sequential, async iterator, pipeline."""

import asyncio

import numpy as np
import pytest

from whisperlivekit_tpu.audio.vad import find_silero_jit

pytestmark = pytest.mark.skipif(
    find_silero_jit() is None, reason="silero weights unavailable"
)


def tone(seconds, f0=180.0, amp=0.3, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    return (amp * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.standard_normal(t.shape)).astype(
        np.float32
    )


def test_batched_matches_per_lane_sequential():
    from whisperlivekit_tpu.audio.vad_batched import BatchedVADScheduler
    from whisperlivekit_tpu.audio.vad_jax import SileroJAXVAD

    async def main():
        sched = BatchedVADScheduler(max_lanes=4, window_s=0.05)
        lanes = [sched.acquire() for _ in range(2)]
        solo = [SileroJAXVAD(params=sched.params) for _ in range(2)]
        audios = [tone(1.0, 150, seed=1), tone(1.0, 300, seed=2)]
        for i in range(0, 16000 - 512, 512):
            frames = [a[i : i + 512] for a in audios]
            batched = await asyncio.gather(
                *(sched.score(lane, f) for lane, f in zip(lanes, frames))
            )
            for b, s, f in zip(batched, solo, frames):
                assert abs(b - s(f)) < 1e-5
        return sched.stats if hasattr(sched, "stats") else sched.n_steps

    asyncio.run(main())


def test_lane_release_resets_state():
    from whisperlivekit_tpu.audio.vad_batched import BatchedVADScheduler

    async def main():
        sched = BatchedVADScheduler(max_lanes=1, window_s=0.01)
        lane = sched.acquire()
        p1 = await sched.score(lane, tone(0.032, seed=3)[:512])
        sched.release(lane)
        lane2 = sched.acquire()
        assert lane2 == lane
        p2 = await sched.score(lane2, tone(0.032, seed=3)[:512])
        assert abs(p1 - p2) < 1e-6  # fresh state after release
        assert sched.acquire() is None  # exhausted

    asyncio.run(main())


def test_async_iterator_events():
    from whisperlivekit_tpu.audio.vad_batched import AsyncFixedVADIterator, BatchedVADScheduler

    async def main():
        sched = BatchedVADScheduler(max_lanes=2, window_s=0.01)
        it = AsyncFixedVADIterator(sched, threshold=0.1)
        audio = np.concatenate(
            [np.zeros(8000, np.float32), tone(1.5, seed=4), np.zeros(16000, np.float32)]
        )
        events = []
        for i in range(0, len(audio), 2048):
            events.extend(await it(audio[i : i + 2048]))
        it.close()
        kinds = [("start" if "start" in e else "end") for e in events]
        for i, k in enumerate(kinds):
            assert k == ("start" if i % 2 == 0 else "end")
        return events

    asyncio.run(main())


def test_pipeline_with_batched_vad():
    """Full AudioProcessor with vad_backend=jax-batched."""
    from whisperlivekit_tpu.harness.harness import TestHarness, reset_engine_cache

    async def main():
        reset_engine_cache()
        try:
            async with TestHarness(
                model_size="random:dev-tiny",
                lan="en",
                vac=True,
                vad_backend="jax-batched",
                log_level="ERROR",
            ) as h:
                assert h._processor._vac_async
                await h.feed_audio(tone(2.0, seed=5), speed=0)
                await h.drain(1.0)
                final = await h.finish(timeout=30)
                assert final.error == ""
            return True
        finally:
            reset_engine_cache()

    assert asyncio.run(main())
