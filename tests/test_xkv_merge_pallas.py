"""Pallas cross-KV pool DMA splice: parity vs the XLA reference.

The kernel copies the aligned static window [align128(win-128), +256) per
active lane; `xkv_splice_ref` (the CPU/production fallback) must produce
identical pools — the two paths back the same production program.
The real-TPU kernel run is validated by scripts/probe_merge_cost.py; here
the reference implementation's geometry is pinned.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperlivekit_tpu.ops.xkv_merge import (
    W_SPLICE,
    splice_dst0,
    xkv_splice_ref,
)

L, G, H, Dh, Tp, F = 4, 3, 2, 64, 1536, W_SPLICE
T_TRUE = 1500


def _mk(seed):
    k = jax.random.PRNGKey(seed)
    pool_k = jax.random.normal(k, (L, G, H, Dh, Tp), jnp.float32)
    pool_v = pool_k * 0.5 + 1.0
    tail_k = jax.random.normal(jax.random.PRNGKey(seed + 1), (L, G, H, Dh, F), jnp.float32)
    tail_v = tail_k * 2.0
    return pool_k, pool_v, tail_k, tail_v


@pytest.mark.parametrize("wn", [[256, 999, 1500], [300, 384, 0]])
def test_ref_geometry(wn):
    """The reference writes exactly [dst0, dst0+256) with tail columns in
    order, skips inactive lanes, and leaves everything else untouched."""
    pool_k, pool_v, tail_k, tail_v = _mk(0)
    wn_a = jnp.asarray(wn, jnp.int32)
    got_k, got_v = xkv_splice_ref(pool_k, pool_v, tail_k, tail_v, wn_a)
    got_k, pool_kn, tail_kn = map(np.asarray, (got_k, pool_k, tail_k))
    dst = np.asarray(splice_dst0(wn_a, Tp))
    for g, w in enumerate(wn):
        if w == 0:
            np.testing.assert_array_equal(got_k[:, g], pool_kn[:, g])
            continue
        d = dst[g]
        assert d % 128 == 0 and d + W_SPLICE <= Tp
        assert d <= w - 128 < d + 128  # window contains the refresh target
        np.testing.assert_array_equal(
            got_k[:, g, :, :, d : d + W_SPLICE], tail_kn[:, g]
        )
        np.testing.assert_array_equal(got_k[:, g, :, :, :d], pool_kn[:, g, :, :, :d])
        np.testing.assert_array_equal(
            got_k[:, g, :, :, d + W_SPLICE :], pool_kn[:, g, :, :, d + W_SPLICE :]
        )


def test_dst0_alignment_range():
    wn = jnp.arange(256, 1501, 7, dtype=jnp.int32)
    d = np.asarray(splice_dst0(wn, Tp))
    assert (d % 128 == 0).all()
    assert (d + W_SPLICE <= Tp).all()
    wn_n = np.asarray(wn)
    assert (d <= wn_n - 128).all()
    assert (wn_n - 128 < d + 128).all()
