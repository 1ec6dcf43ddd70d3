"""Pallas DMA splice for the group cross-KV cache.

The incremental tick must write each lane's freshly projected cross-KV
columns into the [L, G, H, Dh, Tp] pool at per-lane offsets. No XLA
formulation does this without full-pool traffic:

- `.at[slots, cols].set` advanced indexing materializes a TRANSPOSED copy
  of the whole pool (5.5 GB padded at large-v3 G=24 bf16 — OOM);
- a scan of per-lane dynamic_update_slices compiles for ~11 minutes;
- a minor-axis take_along_axis merge runs element-granular (~130 ms);
- a one-hot shift matmul + select still writes a full-pool-sized fresh
  buffer and re-writes the pool: 133.7 ms in-tick at large-v3 G=24 f8;
- a blocked vector-load/rotate/select kernel pays per-program overhead on
  ~600 tiny programs: 40 ms standalone.

The winning shape is an ALIGNED, STATIC-WIDTH splice: the tick refreshes
pool columns [dst0, dst0 + W_SPLICE) where dst0 = align128(win - 128) —
a 128-aligned, 256-wide window that always contains the lane's unsynced
frames (the session re-anchors on catch-up bursts). Dynamic minor-dim DMA
offsets are legal on TPU when provably 128-aligned (the pool's T dim is
padded to a 128 multiple; padding columns are masked out of attention via
``decode(..., t_valid)``), so the whole merge is ONE strided async DMA per
(lane, k/v) — no vector ops, no rotates, no full-pool traffic.

The splice source is the projection of the lane's UPDATED cached encoder
rows over that window (the tick merges the fresh ~160-frame tail encode
into the rows first), so already-synced columns are re-projected to their
own bit-identical values and columns past ``win`` carry silence encodings
— the same values a full re-encode of the zero-padded window produces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_SPLICE = 256   # spliced pool columns per inc tick (2 x 128, aligned)


def splice_dst0(win: jnp.ndarray, t_pool: int) -> jnp.ndarray:
    """First spliced column: align128(win - 128), clipped into the pool."""
    d = ((win - 128) // 128) * 128
    return jnp.clip(d, 0, t_pool - W_SPLICE)


def _kernel(dst_ref, wn_ref, pool_k, tail_k, pool_v, tail_v,
            out_k, out_v, sem_k, sem_v):
    g = pl.program_id(0)

    @pl.when(wn_ref[g] > 0)
    def _():
        dst = (dst_ref[g] // 128) * 128  # re-derive so Mosaic can prove alignment
        ck = pltpu.make_async_copy(
            tail_k.at[:, pl.ds(g, 1), :, :, :],
            out_k.at[:, pl.ds(g, 1), :, :, pl.ds(dst, W_SPLICE)],
            sem_k,
        )
        cv = pltpu.make_async_copy(
            tail_v.at[:, pl.ds(g, 1), :, :, :],
            out_v.at[:, pl.ds(g, 1), :, :, pl.ds(dst, W_SPLICE)],
            sem_v,
        )
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()


def xkv_splice(pool_k, pool_v, tail_k, tail_v, win, interpret: bool = False):
    """Copy the W_SPLICE projected columns into the donated pools in place.

    pool_*: [L, G, H, Dh, Tp] (Tp a 128 multiple); tail_*:
    [L, G, H, Dh, W_SPLICE] — the projection of window columns
    [dst0, dst0 + W_SPLICE), any dtype (cast to the pool dtype here; XLA
    fuses the cast into the projection). Lanes with win == 0 are skipped.

    Call from inside a jit whose pool arguments are donated (the pallas
    input_output_aliases make the update in place; an extra jit wrapper
    here measured two full-pool copies per tick)."""
    L, G, H, Dh, Tp = pool_k.shape
    assert Tp % 128 == 0, "pool T dim must be padded to a 128 multiple"
    assert tail_k.shape[-1] == W_SPLICE
    tail_k = tail_k.astype(pool_k.dtype)
    tail_v = tail_v.astype(pool_v.dtype)
    wn = win.astype(jnp.int32)
    dst = splice_dst0(wn, Tp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
        ],
        input_output_aliases={2: 0, 4: 1},  # pools (after 2 scalar operands)
        interpret=interpret,
    )(dst, wn, pool_k, tail_k, pool_v, tail_v)


def xkv_splice_ref(pool_k, pool_v, tail_k, tail_v, win):
    """XLA reference of the splice (CPU path + kernel parity tests)."""
    Tp = pool_k.shape[-1]
    wn = win.astype(jnp.int32)
    dst = splice_dst0(wn, Tp)
    t_idx = jnp.arange(Tp, dtype=jnp.int32)[None, :]
    sel = (t_idx >= dst[:, None]) & (t_idx < (dst + W_SPLICE)[:, None]) & (wn[:, None] > 0)
    src = (t_idx - dst[:, None]).clip(0, W_SPLICE - 1)
    sel = sel[None, :, None, None, :]
    idx = src[None, :, None, None, :]

    def merge(pool, tail):
        vals = jnp.take_along_axis(tail.astype(pool.dtype), idx, axis=-1)
        return jnp.where(sel, vals, pool)

    return merge(pool_k, tail_k), merge(pool_v, tail_v)
