"""Session-level batching for causal backends: pooled lanes + op batching.

Load-bearing properties: pooled-lane outputs equal the local-cache path
exactly (lane isolation through the pools), concurrent sessions' ops pack
into shared device calls, hypothesis decode never mutates pool rows, and
lanes recycle."""

import asyncio

import numpy as np
import pytest

import jax

from whisperlivekit_tpu.models import qwen3_asr as qm
from whisperlivekit_tpu.streaming.qwen3_batch import CausalBatchService, CausalPools
from whisperlivekit_tpu.streaming.qwen3_causal import Qwen3CausalASR, Qwen3CausalProcessor


@pytest.fixture(scope="module")
def holder():
    dims = qm.DEV_TINY
    params = qm.init_params(dims, jax.random.PRNGKey(0))
    return Qwen3CausalASR(params, dims, window_s=4.0, max_new=8)


def audio_seconds(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * n)) / 16000
    return (0.3 * np.sin(2 * np.pi * 200 * t) + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)


def collect_local(holder, seeds, n_sec=3):
    """Reference: each session through the local-cache sync path."""
    results = []
    for seed in seeds:
        proc = Qwen3CausalProcessor(holder)
        committed = []
        for i in range(n_sec):
            proc.insert_audio_chunk(audio_seconds(1, seed=seed * 10 + i), float(i + 1))
            toks, upto = proc.process_iter()
            committed.extend(toks)
        toks, upto = proc.finish()
        committed.extend(toks)
        results.append([(t.text, t.start, t.end) for t in committed])
    return results


def test_pooled_equals_local(holder):
    """Three concurrent pooled sessions must produce the local path's exact
    outputs (op batching is an execution detail, not a semantic one)."""
    local = collect_local(holder, seeds=[1, 2, 3])

    async def main():
        service = CausalBatchService(holder, capacity=4, window_s=0.05, inline=False)

        async def one(seed):
            proc = Qwen3CausalProcessor(holder, service=service)
            committed = []
            for i in range(3):
                proc.insert_audio_chunk(audio_seconds(1, seed=seed * 10 + i), float(i + 1))
                toks, _ = await proc.process_iter_async()
                committed.extend(toks)
            toks, _ = await proc.finish_async()
            committed.extend(toks)
            proc.close()
            return [(t.text, t.start, t.end) for t in committed]

        results = await asyncio.gather(one(1), one(2), one(3))
        return list(results), service

    pooled, service = asyncio.run(main())
    assert pooled == local

    stats = service.stats()
    # concurrent sessions' ops actually packed (fewer batches than ops)
    assert stats["append"]["ops"] >= 3
    assert stats["append"]["batches"] < stats["append"]["ops"]
    assert stats["decode"]["batches"] < stats["decode"]["ops"]


def test_decode_does_not_mutate_pools(holder):
    async def main():
        service = CausalBatchService(holder, capacity=2, window_s=0.0, inline=False)
        proc = Qwen3CausalProcessor(holder, service=service)
        proc.insert_audio_chunk(audio_seconds(1), 1.0)
        await proc.process_iter_async()
        lane = proc.lane
        before_k = np.asarray(service.pools.text_k[:, lane])
        await service.decode(proc._lane_token, proc.text_pos)  # extra decode
        after_k = np.asarray(service.pools.text_k[:, lane])
        proc.close()
        return before_k, after_k

    before, after = asyncio.run(main())
    np.testing.assert_array_equal(before, after)


def test_lane_recycling(holder):
    async def main():
        service = CausalBatchService(holder, capacity=1, window_s=0.0, inline=False)
        p1 = Qwen3CausalProcessor(holder, service=service)
        p1.insert_audio_chunk(audio_seconds(1), 1.0)
        await p1.process_iter_async()
        assert p1.lane is not None

        p2 = Qwen3CausalProcessor(holder, service=service)
        p2.insert_audio_chunk(audio_seconds(1), 1.0)
        with pytest.raises(RuntimeError, match="exhausted"):
            await p2.process_iter_async()

        p1.close()
        toks, _ = await p2.process_iter_async()  # lane freed: works now
        p2.close()
        return True

    assert asyncio.run(main())


def test_engine_wires_service():
    from whisperlivekit_tpu.config import WLKConfig
    from whisperlivekit_tpu.engine.core import TranscriptionEngine, online_factory

    TranscriptionEngine.reset()
    cfg = WLKConfig(
        backend="qwen3", backend_policy="causal", model_size="random:dev-tiny",
        lan="en", vac=False, pcm_input=True, scheduler=True, log_level="ERROR",
    )
    engine = TranscriptionEngine(cfg)
    assert isinstance(engine.scheduler, CausalBatchService)
    proc = online_factory(cfg, engine.asr, scheduler=engine.scheduler)
    assert proc.service is engine.scheduler
    assert hasattr(proc, "process_iter_async")
    TranscriptionEngine.reset()


def test_dead_session_ops_hit_scratch(holder):
    """Ops still queued when a session closes must not touch a re-acquired
    lane (the disconnect race): dead tokens execute against scratch."""
    async def main():
        service = CausalBatchService(holder, capacity=1, window_s=0.0, inline=False)
        p1 = Qwen3CausalProcessor(holder, service=service)
        p1.insert_audio_chunk(audio_seconds(1, seed=1), 1.0)
        await p1.process_iter_async()
        token = p1._lane_token
        lane = token.lane
        p1.close()  # token dead, lane freed

        p2 = Qwen3CausalProcessor(holder, service=service)
        p2.insert_audio_chunk(audio_seconds(1, seed=2), 1.0)
        await p2.process_iter_async()
        assert p2.lane == lane  # recycled
        after_prime = np.asarray(service.pools.text_k[:, lane])

        # a stale op from the dead session fires late
        await service.append(token, audio_seconds(
            holder.dims.block_samples / 16000, seed=9
        )[: holder.dims.block_samples], 0, 4)
        now = np.asarray(service.pools.text_k[:, lane])
        p2.close()
        return after_prime, now

    before, after = asyncio.run(main())
    np.testing.assert_array_equal(before, after)
