"""Device-resident serving pools for the AlignAtt streaming path.

State containers for the pooled serving programs (streaming/alignatt.py):
per-group cross-KV and decoder self-KV caches (XKVGroupPool, allocated by
XKVAllocator), per-lane encoder-frame caches (EncPool), per-lane 30 s audio
windows (AudioPool), and the donated-pool failure containment
(_recover_group / _dispatch_pooled_recovering). Split out of
streaming/alignatt.py in round 5 (VERDICT r4 task #7); the alignatt module
remains the import facade.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import N_SAMPLES
from ..models.whisper.dims import ModelDimensions

logger = logging.getLogger(__name__)


class XKVGroupPool:
    """Per-lane-group cross-KV cache resident in device HBM.

    k/v: [L, G, H, Dh, T] in ``dtype`` (bf16 exact, or f8_e4m3 to halve the
    footprint AND the decode-loop read — measured 24% faster 8-step loop on
    v5e, docs/perf/probe_xkv_f8). Slot order IS the batch order of the
    group's tick programs; sessions pin to a slot for their lifetime and a
    migration forces a re-anchor. Scale-out = more groups, not wider ones."""

    def __init__(
        self,
        group_width: int,
        dims: ModelDimensions,
        dtype=jnp.bfloat16,
        skv_width: int = 0,
        align_count: int = 0,
        skv_dtype=jnp.bfloat16,
    ):
        self.group_width = group_width
        t_pad = -(-dims.n_audio_ctx // 128) * 128  # splice DMA tile alignment
        shape = (
            dims.n_text_layer, group_width, dims.n_text_head,
            dims.head_dim, t_pad,
        )
        self.k = jnp.zeros(shape, dtype)
        self.v = jnp.zeros(shape, dtype)
        # persistent decoder state (see alignatt_tick_inc_skv): self-KV rows
        # for the prefix+decoded tokens, gate-stat running sums, and the
        # cache-row token mirror the dry penalty reads. Width covers the
        # serving prefix cap + the step budget + 1 scratch row (index Wc-1,
        # the park slot for inactive lanes' writes); sessions' prefixes are
        # trimmed/truncated to the cap (AlignAttSession.trim_context).
        self.skv_width = skv_width
        if skv_width:
            G = group_width
            sshape = (dims.n_text_layer, G, skv_width, dims.n_text_head, dims.head_dim)
            self.skv_k = jnp.zeros(sshape, skv_dtype)
            self.skv_v = jnp.zeros(sshape, skv_dtype)
            T = dims.n_audio_ctx
            self.asum = jnp.zeros((G, align_count, T), jnp.float32)
            self.asq = jnp.zeros((G, align_count, T), jnp.float32)
            self.alast = jnp.zeros((G, align_count, T), jnp.float32)
            self.acount = jnp.zeros((G,), jnp.float32)
            self.tok = jnp.zeros((G, dims.n_text_ctx), jnp.int32)
        self._free = list(range(group_width))
        # group-synchronized anchor epochs: the scheduler bumps `sub_epoch`
        # once per (eviction block / anchor_cohorts) of inc ticks; a session
        # in cohort c (= slot % cohorts) force-evicts (window permitting) and
        # plans an anchor when a sub-epoch with index ≡ c passes, so each
        # cohort re-anchors in ONE batched program — with cohorts=1 the whole
        # group anchors together (max batching, but the group stalls ~1 s at
        # large-v3); with cohorts>1 anchors stagger across sub-epochs and
        # each stall is a small chunked program (p95 tail latency)
        self.sub_epoch = 0
        self.ticks_since_epoch = 0
        # failure-recovery bookkeeping: a pooled program that dies with
        # donated inputs destroys this group's pools; _recover_group swaps
        # in fresh arrays and bumps `generation` so every session of the
        # group invalidates its device mirrors (skv_tokens) and re-anchors
        self.generation = 0
        # memoized "the whole-group anchor OOM'd here": never retry it on
        # this group topology (the chunked path is the survivable fallback)
        self.whole_anchor_blocked = False

    @staticmethod
    def row_bytes(
        dims: ModelDimensions, dtype, skv_width: int = 0, align_count: int = 0,
        skv_dtype=jnp.bfloat16,
    ) -> int:
        itemsize = jnp.dtype(dtype).itemsize
        t_pad = -(-dims.n_audio_ctx // 128) * 128
        b = (
            2 * dims.n_text_layer * dims.n_text_head * dims.head_dim
            * t_pad * itemsize
        )
        if skv_width:
            b += (
                2 * dims.n_text_layer * skv_width * dims.n_text_head
                * dims.head_dim * jnp.dtype(skv_dtype).itemsize
            )
            b += 3 * align_count * dims.n_audio_ctx * 4 + dims.n_text_ctx * 4 + 4
        return b

    def acquire(self) -> Optional[int]:
        return self._free.pop() if self._free else None

    def release(self, slot: int) -> None:
        self._free.append(slot)

    @property
    def occupancy(self) -> int:
        return self.group_width - len(self._free)


class XKVAllocator:
    """Scheduler-owned registry of cross-KV cache groups.

    Groups are created lazily up to an HBM budget; a session holds one
    (group, slot) for its lifetime (slot order IS batch order — the decode
    reads the pool directly, so slots cannot be regathered; see
    XKVGroupPool). ``epoch_period`` paces group-synchronized anchors;
    ``anchor_cohorts`` staggers them (slot % cohorts) so only ~G/cohorts
    lanes anchor per sub-epoch instead of the whole group at once."""

    def __init__(
        self,
        group_width: int,
        dims: ModelDimensions,
        dtype=jnp.bfloat16,
        budget_bytes: int = 9 << 30,
        epoch_period: int = 15,
        anchor_cohorts: int = 1,
        skv_width: int = 0,
        align_count: int = 0,
        skv_dtype=jnp.bfloat16,
    ):
        self.group_width = group_width
        self.dims = dims
        self.dtype = dtype
        self.skv_width = skv_width
        self.align_count = align_count
        self.skv_dtype = skv_dtype
        self.epoch_period = epoch_period
        self.anchor_cohorts = max(1, min(anchor_cohorts, epoch_period))
        self.sub_period = max(1, epoch_period // self.anchor_cohorts)
        row = XKVGroupPool.row_bytes(
            dims, dtype, skv_width=skv_width, align_count=align_count,
            skv_dtype=skv_dtype,
        )
        self.max_groups = max(1, int(budget_bytes // (row * group_width)))
        self.groups: List[XKVGroupPool] = []

    @classmethod
    def for_engine(cls, engine: "AlignAttEngine", group_width: int, **kw) -> "XKVAllocator":
        """Allocator sized for an engine's serving programs: self-KV width =
        serving prefix cap + commit budget + step budget + 1 legit slot +
        1 scratch row (the budget rows let mid-epoch commits grow the
        prefix past the cap instead of trimming the head — see
        AlignAttConfig.serving_commit_budget).

        The cap (not the top prefix bucket) sizes the pool: the decode loop
        copies the full pool every step (the cache rides the layer scan as
        xs and is restacked as ys), so tick time scales ~linearly with the
        width — top-bucket sizing (266 rows at large-v3) measured 581 ms vs
        356 at the 106-row cap for the same B=32 f8 tick, and OOM'd bf16
        (docs/perf/probe_skv_width.json; the r3 capacity regression)."""
        cfg = engine.cfg
        kw.setdefault("dtype", (
            jnp.float8_e4m3fn
            if getattr(cfg, "xkv_cache_dtype", "bf16") == "f8"
            else engine.params["decoder"]["tok_emb"].dtype
        ))
        kw.setdefault("skv_dtype", engine.params["decoder"]["tok_emb"].dtype)
        return cls(
            group_width, engine.dims,
            skv_width=(engine.serving_prefix_cap or engine.prefix_buckets[-1])
            + getattr(engine, "serving_commit_budget", 0)
            + cfg.max_steps + 2,
            align_count=int(engine.align_layers.shape[0]),
            **kw,
        )

    def acquire(self) -> Optional[Tuple[int, int]]:
        for gi, g in enumerate(self.groups):
            slot = g.acquire()
            if slot is not None:
                return gi, slot
        if len(self.groups) < self.max_groups:
            self.groups.append(
                XKVGroupPool(
                    self.group_width, self.dims, dtype=self.dtype,
                    skv_width=self.skv_width, align_count=self.align_count,
                    skv_dtype=self.skv_dtype,
                )
            )
            return len(self.groups) - 1, self.groups[-1].acquire()
        return None

    def release(self, gi: int, slot: int) -> None:
        self.groups[gi].release(slot)

    def note_group_tick(self, gi: int) -> None:
        g = self.groups[gi]
        g.ticks_since_epoch += 1
        if g.ticks_since_epoch >= self.sub_period:
            g.ticks_since_epoch = 0
            g.sub_epoch += 1

    def stats(self) -> dict:
        return {
            "n_groups": len(self.groups),
            "max_groups": self.max_groups,
            "group_width": self.group_width,
            "anchor_cohorts": self.anchor_cohorts,
            "slots_used": sum(g.occupancy for g in self.groups),
            "epochs": [g.sub_epoch // self.anchor_cohorts for g in self.groups],
        }


class EncPool:
    """Per-lane encoder-frame caches resident in device HBM.

    [capacity, n_audio_ctx, n_audio_state] in the params dtype; rows are
    written by the anchor/incremental tick programs (donated in/out). Row 0
    is a scratch target for batch-padding lanes and never allocated."""

    SCRATCH = 0

    def __init__(self, capacity: int, dims: ModelDimensions, dtype=jnp.bfloat16):
        self.capacity = capacity
        self.pool = jnp.zeros((capacity, dims.n_audio_ctx, dims.n_audio_state), dtype)
        self._free = list(range(1, capacity))
        # bumped by _recover_group when a failed donated program destroyed
        # the pool; sessions re-sync (full re-anchor) on generation change
        self.generation = 0

    def acquire(self) -> Optional[int]:
        return self._free.pop() if self._free else None

    def release(self, lane: int) -> None:
        if lane != self.SCRATCH:
            self._free.append(lane)


# ---------------------------------------------------------------------------
# Device-resident audio pool
# ---------------------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0,))
def _pool_update(
    pool: jnp.ndarray,    # [W, N] int16 (donated)
    lanes: jnp.ndarray,   # [U] int32
    shifts: jnp.ndarray,  # [U] int32 — samples evicted at window front
    starts: jnp.ndarray,  # [U] int32 — write offset after the shift
    lens: jnp.ndarray,    # [U] int32 — new samples
    chunks: jnp.ndarray,  # [U, C] int16
):
    N = pool.shape[1]
    C = chunks.shape[1]
    U = chunks.shape[0]
    rows = pool[lanes]

    # eviction shift: an element-granular minor-axis gather that XLA lowers
    # scalar-wise (~30 ms at U=24); shifts are zero outside eviction epochs
    # (1-in-15 ticks with epoch-synchronized eviction), so skip it then
    def do_shift(r):
        idx = jnp.arange(N, dtype=jnp.int32)[None, :] + shifts[:, None]
        sh = jnp.take_along_axis(r, jnp.minimum(idx, N - 1), axis=1)
        return jnp.where(idx < N, sh, 0)

    shifted = jax.lax.cond(jnp.any(shifts > 0), do_shift, lambda r: r, rows)

    # chunk write as a 128-sample ROW gather: `starts` are 128-aligned by
    # the session host (samples before the watermark are resent to pad), so
    # chunk element s - starts lives at row (s//128 - starts//128), lane
    # s%128 — contiguous rows instead of an element gather
    vals3 = jnp.take_along_axis(
        chunks.reshape(U, C // 128, 128),
        jnp.clip(
            jnp.arange(N // 128, dtype=jnp.int32)[None, :] - starts[:, None] // 128,
            0, C // 128 - 1,
        )[:, :, None],
        axis=1,
    )
    vals = vals3.reshape(U, N)
    pos = jnp.arange(N, dtype=jnp.int32)[None, :] - starts[:, None]
    in_chunk = (pos >= 0) & (pos < lens[:, None])
    new_rows = jnp.where(in_chunk, vals, shifted)
    return pool.at[lanes].set(new_rows)


@jax.jit
def _pool_gather(pool: jnp.ndarray, lanes: jnp.ndarray) -> jnp.ndarray:
    return pool[lanes]


class AudioPool:
    """Per-lane 30 s audio windows resident in device HBM.

    Sessions ship only the samples appended since their last tick (~32 KB/s
    int16) instead of re-uploading the whole window (~1 MB/tick); window
    eviction becomes an on-device roll. Chunk width is bucketed so the set
    of compiled update programs stays small.
    """

    CHUNK_BUCKETS = (32000, 160000, N_SAMPLES)  # 2 s / 10 s / full window

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.pool = jnp.zeros((capacity, N_SAMPLES), jnp.int16)
        self._free = list(range(capacity))
        self.n_updates = 0

    def acquire(self) -> Optional[int]:
        return self._free.pop() if self._free else None

    def release(self, lane: int) -> None:
        self._free.append(lane)

    def update(self, updates: List[Tuple[int, int, int, np.ndarray]]) -> None:
        """updates: (lane, shift, start, new_i16)."""
        if not updates:
            return
        U = len(updates)
        max_new = max(len(u[3]) for u in updates)
        C = next(b for b in self.CHUNK_BUCKETS if b >= max_new)
        lanes = np.zeros(U, np.int32)
        shifts = np.zeros(U, np.int32)
        starts = np.zeros(U, np.int32)
        lens = np.zeros(U, np.int32)
        chunks = np.zeros((U, C), np.int16)
        for i, (lane, shift, start, new) in enumerate(updates):
            lanes[i], shifts[i], starts[i], lens[i] = lane, shift, start, len(new)
            chunks[i, : len(new)] = new
        self.pool = _pool_update(
            self.pool,
            jnp.asarray(lanes),
            jnp.asarray(shifts),
            jnp.asarray(starts),
            jnp.asarray(lens),
            jnp.asarray(chunks),
        )
        self.n_updates += 1

    def gather(self, lanes: List[int]) -> jnp.ndarray:
        return _pool_gather(self.pool, jnp.asarray(np.asarray(lanes, np.int32)))


def _recover_group(engine, xkv: "XKVAllocator", gi: int, enc_pool: Optional[EncPool]) -> None:
    """Rebuild a group's (and the encoder pool's) donated-and-destroyed
    arrays with fresh zeros and bump generations: sessions notice on their
    next prepare_tick (generation mismatch), drop their device mirrors, and
    re-anchor from host audio + prefix — the anchor prefill reseeds every
    pool row exactly, so recovery costs one anchor per session and loses no
    audio (host segments and the audio pool are intact)."""
    g = xkv.groups[gi]
    dims = engine.dims
    Tp = -(-dims.n_audio_ctx // 128) * 128
    G = g.group_width
    shape = (dims.n_text_layer, G, dims.n_text_head, dims.head_dim, Tp)
    g.k = jnp.zeros(shape, xkv.dtype)
    g.v = jnp.zeros(shape, xkv.dtype)
    if g.skv_width:
        K = int(engine.align_layers.shape[0])
        sshape = (dims.n_text_layer, G, g.skv_width, dims.n_text_head, dims.head_dim)
        g.skv_k = jnp.zeros(sshape, xkv.skv_dtype)
        g.skv_v = jnp.zeros(sshape, xkv.skv_dtype)
        T = dims.n_audio_ctx
        g.asum = jnp.zeros((G, K, T), jnp.float32)
        g.asq = jnp.zeros((G, K, T), jnp.float32)
        g.alast = jnp.zeros((G, K, T), jnp.float32)
        g.acount = jnp.zeros((G,), jnp.float32)
        g.tok = jnp.zeros((G, dims.n_text_ctx), jnp.int32)
    g.generation += 1
    if enc_pool is not None:
        enc_pool.pool = jnp.zeros(
            (enc_pool.capacity, dims.n_audio_ctx, dims.n_audio_state),
            engine.params["decoder"]["tok_emb"].dtype,
        )
        enc_pool.generation += 1
    from . import alignatt as _A  # facade owns the shared stats dict

    n_t, tot, lanes = _A.TICK_PHASE_STATS.get("pool_recovery", (0, 0.0, 0))
    _A.TICK_PHASE_STATS["pool_recovery"] = (n_t + 1, tot, lanes)


def _dispatch_pooled_recovering(dispatch, engine, xkv, gi, enc_pool, ticks,
                                tokenizer, pool, what: str):
    """Dispatch a pooled group program; on failure AT EITHER PHASE (the
    dispatch, or the deferred fetch where async runtime errors surface),
    contain it: recover the group's pools and serve the in-flight ticks via
    the legacy full-window program (correct from host state alone). The
    whole-group anchor additionally memoizes the failure so it is never
    retried on this group (the chunked path takes over permanently).
    Returns a fetch closure either way."""

    def recover():
        from .dispatch import _run_group_legacy

        logger.exception(
            "pooled %s program failed for group %d — recovering pools, "
            "serving %d lanes via the legacy program", what, gi, len(ticks)
        )
        if what == "anchor_group":
            xkv.groups[gi].whole_anchor_blocked = True
        _recover_group(engine, xkv, gi, enc_pool)
        return _run_group_legacy(engine, ticks, tokenizer, pool)

    try:
        fetch = dispatch()
    except (jax.errors.JaxRuntimeError, RuntimeError):
        outs = recover()
        return lambda: outs

    def safe_fetch():
        try:
            return fetch()
        except (jax.errors.JaxRuntimeError, RuntimeError):
            return recover()

    return safe_fetch

