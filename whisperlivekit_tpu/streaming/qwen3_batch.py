"""Session-level batching for causal backends (qwen3 / voxtral-realtime).

Tower KV and decoder KV live in device-resident lane pools; sessions issue
typed ops (prime / append / decode) through an OpBatcher, so concurrent
sessions' blocks encode in ONE device call and their hypotheses decode in
another — the causal-mode analog of the AlignAtt batch scheduler
(kernel-level capacity: docs/perf/bench_qwen3_v5e.json, ~251 lanes/chip at
0.6b scale).

Lane heterogeneity (per-lane frames_filled / text_pos) is native to the
compute functions (models/qwen3_asr.py takes [B] position vectors); the
hypothesis region of the decoder cache is disposable (overwritten by the
next block), so decode ops only GATHER pool rows — no write-back.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.op_batcher import OpBatcher
from ..models import llama as lm
from ..models import qwen3_asr as qm

logger = logging.getLogger(__name__)


class LaneToken:
    """A session's claim on a pool lane. ``alive`` flips False at close();
    any of the session's ops still queued in the batcher then execute
    against the scratch row instead of a possibly re-acquired lane."""

    __slots__ = ("lane", "alive")

    def __init__(self, lane: int):
        self.lane = lane
        self.alive = True


class CausalPools:
    """Per-lane tower + decoder KV pools. Row 0 is scratch (batch padding).

    Tower rows are sized to the segment policy's admitted window
    (window_blocks x block_frames), not the 30 s architectural max — at 15 s
    windows that halves the largest allocation in the engine."""

    SCRATCH = 0

    def __init__(self, dims: qm.Qwen3ASRDims, capacity: int, text_cache_len: int,
                 dtype=jnp.float32, tower_frames: int = 0):
        L, H = dims.audio_layers, dims.audio_heads
        dh = dims.d_audio // H
        C = capacity + 1
        frames = min(tower_frames or dims.max_frames, dims.max_frames)
        self.tower_k = jnp.zeros((L, C, frames, H, dh), dtype)
        self.tower_v = jnp.zeros((L, C, frames, H, dh), dtype)
        t = dims.text
        shape = (t.n_layers, C, text_cache_len, t.n_kv_heads, t.head_dim)
        self.text_k = jnp.zeros(shape, dtype)
        self.text_v = jnp.zeros(shape, dtype)
        self._free = list(range(1, C))

    def acquire(self) -> Optional[int]:
        return self._free.pop() if self._free else None

    def release(self, lane: int) -> None:
        if lane != self.SCRATCH:
            self._free.append(lane)


# ---------------------------------------------------------------------------
# Pooled jitted programs
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("dims",),
         donate_argnames=("text_k", "text_v"))
def _prime_pooled(params, text_k, text_v, lanes, prompt, dims: qm.Qwen3ASRDims):
    """Zero the lanes' decoder rows and prefill the prompt."""
    B = lanes.shape[0]
    zk = jnp.zeros((text_k.shape[0], B) + text_k.shape[2:], text_k.dtype)
    cache = lm.LlamaCache(zk, zk)
    _, cache = lm.forward(
        params["text"], lm.embed_tokens(params["text"], prompt),
        jnp.zeros((B,), jnp.int32), cache, dims.text,
    )
    return text_k.at[:, lanes].set(cache.k), text_v.at[:, lanes].set(cache.v)


@partial(jax.jit, static_argnames=("dims",),
         donate_argnames=("tower_k", "tower_v", "text_k", "text_v"))
def _append_pooled(
    params, tower_k, tower_v, text_k, text_v,
    lanes, audio, start_frame, text_pos, active, dims: qm.Qwen3ASRDims,
):
    """One causal block per lane, encoded + fed to the decoder, in one call
    (mel computed in-graph from the raw block). Inactive (padding) lanes
    write only to the scratch row."""
    from ..audio.mel import log_mel_spectrogram

    mel = log_mel_spectrogram(audio, n_mels=dims.n_mels)
    tc = qm.TowerCache(tower_k[:, lanes], tower_v[:, lanes])
    xc = lm.LlamaCache(text_k[:, lanes], text_v[:, lanes])
    tc, xc, _ = qm.append_audio_block(params, mel, tc, xc, start_frame, text_pos, dims)
    safe = jnp.where(active, lanes, CausalPools.SCRATCH)
    return (
        tower_k.at[:, safe].set(tc.k),
        tower_v.at[:, safe].set(tc.v),
        text_k.at[:, safe].set(xc.k),
        text_v.at[:, safe].set(xc.v),
    )


@partial(jax.jit, static_argnames=("dims", "max_new", "eos_id"))
def _decode_pooled(
    params, text_k, text_v, lanes, start_tokens, text_pos,
    dims: qm.Qwen3ASRDims, eos_id: int, max_new: int,
):
    """Greedy hypotheses for B lanes from their pooled audio prefixes.
    The hypothesis KV lands in the gathered COPY only — pool rows stay
    untouched (disposable-hypothesis contract)."""
    xc = lm.LlamaCache(text_k[:, lanes], text_v[:, lanes])
    tokens, n, _ = qm.decode_hypothesis(
        params, xc, start_tokens, text_pos, eos_id, dims, max_new=max_new
    )
    return tokens, n


# ---------------------------------------------------------------------------
# The op service
# ---------------------------------------------------------------------------


class CausalBatchService:
    """Shared per-engine service: pools + batched op runners. Sessions call
    the async ops; the OpBatcher packs concurrent sessions per op type."""

    def __init__(self, holder, capacity: int = 32, window_s: float = 0.01,
                 inline: Optional[bool] = None):
        self.holder = holder
        self.dims = holder.dims
        dtype = holder.params["text"]["tok_emb"].dtype
        blocks = self.dims.window_blocks(holder.window_s)
        self.pools = CausalPools(
            self.dims, capacity, holder.text_cache_len, dtype,
            tower_frames=(blocks + 1) * self.dims.block_frames,
        )
        self.batcher = OpBatcher(window_s=window_s, inline=inline)
        self.batcher.register("prime", self._run_prime)
        self.batcher.register("append", self._run_append)
        self.batcher.register("decode", self._run_decode)

    # -- async session-facing ops. Each payload carries the session's lane
    # TOKEN: a disconnect can leave ops queued after the worker task is
    # cancelled, and the lane may be re-acquired — dead ops must not touch it.

    async def prime(self, token: "LaneToken", ctx_ids: Optional[List[int]] = None) -> None:
        await self.batcher.submit("prime", (token, list(ctx_ids or [])))

    async def append(self, token: "LaneToken", block: np.ndarray,
                     start_frame: int, text_pos: int) -> None:
        await self.batcher.submit("append", (token, block, start_frame, text_pos))

    async def decode(self, token: "LaneToken", text_pos: int) -> List[int]:
        return await self.batcher.submit("decode", (token, text_pos))

    def stats(self) -> dict:
        return self.batcher.stats()

    # -- batch runners (one device call each) -------------------------------------

    @staticmethod
    def _pad(n: int) -> int:
        return 1 << (n - 1).bit_length()

    def _run_prime(self, items: List[Tuple["LaneToken", List[int]]]) -> List[None]:
        tokens = [it[0] for it in items]
        lanes = [t.lane if t.alive else CausalPools.SCRATCH for t in tokens]
        B = self._pad(len(lanes))
        lane_arr = np.full(B, CausalPools.SCRATCH, np.int32)
        lane_arr[: len(lanes)] = lanes
        # per-lane carry context, right-padded to the holder's fixed budget:
        # padded positions sit at cache indices >= the lane's text_pos, are
        # masked by the position-causal mask (llama.py forward) and are
        # overwritten by the next audio block's sequential writes — so one
        # prime program serves every carry length
        ctx_budget = getattr(self.holder, "ctx_budget", 0)
        prompt = np.tile(
            np.asarray(self.holder.prompt_ids, np.int32), (B, 1)
        )
        if ctx_budget:
            ctx = np.zeros((B, ctx_budget), np.int32)
            for i, (_, ids) in enumerate(items):
                ids = list(ids)[:ctx_budget]
                ctx[i, : len(ids)] = ids
            prompt = np.concatenate([prompt, ctx], axis=1)
        p = self.pools
        p.text_k, p.text_v = _prime_pooled(
            self.holder.params, p.text_k, p.text_v,
            jnp.asarray(lane_arr), jnp.asarray(prompt), self.dims,
        )
        return [None] * len(lanes)

    def _run_append(self, items: List[Tuple]) -> List[None]:
        d = self.dims
        B = self._pad(len(items))
        lanes = np.full(B, CausalPools.SCRATCH, np.int32)
        audio = np.zeros((B, d.block_samples), np.float32)
        start = np.zeros(B, np.int32)
        tpos = np.zeros(B, np.int32)
        active = np.zeros(B, bool)
        for i, (token, block, sf, tp) in enumerate(items):
            alive = token.alive
            lanes[i] = token.lane if alive else CausalPools.SCRATCH
            start[i], tpos[i], active[i] = sf, tp, alive
            audio[i] = block
        p = self.pools
        p.tower_k, p.tower_v, p.text_k, p.text_v = _append_pooled(
            self.holder.params, p.tower_k, p.tower_v, p.text_k, p.text_v,
            jnp.asarray(lanes), jnp.asarray(audio), jnp.asarray(start),
            jnp.asarray(tpos), jnp.asarray(active), d,
        )
        return [None] * len(items)

    def _run_decode(self, items: List[Tuple]) -> List[List[int]]:
        h = self.holder
        B = self._pad(len(items))
        lanes = np.full(B, CausalPools.SCRATCH, np.int32)
        tpos = np.zeros(B, np.int32)
        for i, (token, tp) in enumerate(items):
            lanes[i] = token.lane if token.alive else CausalPools.SCRATCH
            tpos[i] = tp
        start = np.tile(np.asarray(h.hyp_start_ids, np.int32), (B, 1))
        toks, n = _decode_pooled(
            h.params, self.pools.text_k, self.pools.text_v,
            jnp.asarray(lanes), jnp.asarray(start), jnp.asarray(tpos),
            self.dims, h.eos_id, h.max_new,
        )
        # overlap the two fetches: each fresh-array np.asarray is a full
        # tunnel round-trip on axon (~40 ms measured)
        for a in (toks, n):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        toks = np.asarray(toks)
        n = np.asarray(n)
        return [
            [int(x) for x in toks[i][: int(n[i])]] for i in range(len(items))
        ]
