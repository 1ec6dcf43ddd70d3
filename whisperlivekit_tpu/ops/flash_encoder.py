"""Flash self-attention for the Whisper encoder (non-causal, full-row).

The XLA encoder attention materializes [B,H,T,T] f32 scores per layer —
at large-v3 B=24, T=1500 that is ~4.3 GB written + re-read per layer, and
the measured full-window encode runs 786 ms against a ~310 ms matmul-FLOPs
floor (scripts/probe: encode B=24 T=1500). This kernel keeps score tiles in
VMEM: per (lane, head-group) program it streams K/V once, computes
[Sq,T] f32 score tiles, does a full-row softmax (T fits VMEM — no online
rescaling needed), and multiplies into the value block.

Layouts (chosen for TPU tiling — lanes must be 128-aligned or full-dim):
  q, v: [B, H, T, Dh]   (Dh=64 pads to 128 lanes in VMEM; the 2x pad on
                         these streams costs ~+3 ms/layer total and buys
                         MXU-natural contractions on both dots)
  k:    [B, H, Dh, T]   (T on lanes: scores = q_tile[Sq,Dh] x k[Dh,T])

Head-grouped grid: one program per (lane, group of HG heads) — per-head
programs would pay kernel-grid/DMA-issue overhead ~3.5 us x B*H*T/Sq
(measured on the decode kernel attempts, see scripts/probe_xattn_tpu.py).

Math matches models/whisper/model.py::_attend: f32 score accumulation and
softmax, value matmul on probs cast to the value dtype with f32
accumulation (reference whisper/model.py:90-99 qkv_attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, hg: int, sq: int, t_valid: int,
    v_transposed: bool,
):
    # q blocks [1,hg,S,Dh]; k block [1,hg,Dh,T]; v [1,hg,T,Dh] (or
    # [1,hg,Dh,T] when v_transposed); out [1,hg,S,Dh].
    S = q_ref.shape[2]
    T = k_ref.shape[-1]
    n_tiles = S // sq
    col = jax.lax.broadcasted_iota(jnp.int32, (sq, T), 1)
    col_mask = jnp.where(col < t_valid, 0.0, -jnp.inf).astype(jnp.float32)
    for h in range(hg):
        k = k_ref[0, h]                                   # [Dh, T]
        v = v_ref[0, h]
        if v_transposed:
            v = jnp.transpose(v)                          # [Dh,T] -> [T,Dh]
        for i in range(n_tiles):
            q = q_ref[0, h, i * sq : (i + 1) * sq]        # [Sq, Dh]
            s = jnp.dot(q, k, preferred_element_type=jnp.float32) * scale
            s = s + col_mask                              # mask padded cols
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)    # [Sq, T] f32
            out = jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            o_ref[0, h, i * sq : (i + 1) * sq] = out.astype(o_ref.dtype)


def _head_group(n_head: int) -> int:
    for g in (4, 2):
        if n_head % g == 0:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("t_valid", "v_transposed", "interpret"))
def flash_encoder_attn(
    q: jnp.ndarray,  # [B, H, S, Dh]
    k: jnp.ndarray,  # [B, H, Dh, T]
    v: jnp.ndarray,  # [B, H, T, Dh] (or [B, H, Dh, T] with v_transposed)
    t_valid: int,
    v_transposed: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full (non-causal) attention; returns [B, H, S, Dh] in q.dtype.

    ``t_valid`` masks key columns >= t_valid (callers pad T up to a lane
    multiple). Query rows are independent, so S may differ from T — the
    AlignAtt prefill calls this with S = prompt bucket over the transposed
    cross-KV (``v_transposed=True``: V arrives [B,H,Dh,T] and is flipped
    per head in VMEM, which beats re-materializing a second HBM copy).
    """
    B, H, S, Dh = q.shape
    T = k.shape[-1]
    assert k.shape == (B, H, Dh, T)
    assert v.shape == ((B, H, Dh, T) if v_transposed else (B, H, T, Dh))
    assert S % 8 == 0, f"S must be sublane-aligned, got {S}"
    hg = _head_group(H)
    # Sq divides S and keeps the f32 score tile ~<=3 MB.
    sq = S
    for cand in (512, 256, 128, 64):
        if S % cand == 0:
            sq = cand
            break
    kern = functools.partial(
        _kernel, scale=Dh**-0.5, hg=hg, sq=min(sq, S), t_valid=t_valid,
        v_transposed=v_transposed,
    )
    v_block = (1, hg, Dh, T) if v_transposed else (1, hg, T, Dh)
    return pl.pallas_call(
        kern,
        grid=(B, H // hg),
        in_specs=[
            pl.BlockSpec((1, hg, S, Dh), lambda b, g: (b, g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, Dh, T), lambda b, g: (b, g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(v_block, lambda b, g: (b, g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hg, S, Dh), lambda b, g: (b, g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype),
        interpret=interpret,
    )(q, k, v)


def flash_encoder_attn_reference(q, k, v, t_valid):
    """XLA twin for parity tests: same layouts, same math."""
    Dh = q.shape[-1]
    s = jnp.einsum("bhsd,bhdt->bhst", q, k, preferred_element_type=jnp.float32)
    s = s * (Dh**-0.5)
    T = k.shape[-1]
    mask = jnp.where(jnp.arange(T) < t_valid, 0.0, -jnp.inf)
    s = s + mask[None, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bhst,bhtd->bhsd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)
