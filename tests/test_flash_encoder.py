"""Flash encoder/prefill attention kernel vs the XLA einsum reference.

The kernel runs compiled on TPU only (models/whisper/model.py gates it on
the backend); CI exercises it through the Pallas interpreter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlivekit_tpu.ops.flash_encoder import (
    flash_encoder_attn,
    flash_encoder_attn_reference,
)


def _mk(shape, seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape)).astype(dtype)


@pytest.mark.parametrize("B,H,T,t_valid", [(2, 4, 128, 128), (1, 8, 256, 250)])
def test_flash_matches_reference(B, H, T, t_valid):
    Dh = 64
    q = _mk((B, H, T, Dh), 0)
    k = _mk((B, H, Dh, T), 1)
    v = _mk((B, H, T, Dh), 2)
    ours = flash_encoder_attn(q, k, v, t_valid=t_valid, interpret=True)
    ref = flash_encoder_attn_reference(q, k, v, t_valid=t_valid)
    np.testing.assert_allclose(
        np.asarray(ours)[:, :, :t_valid],
        np.asarray(ref)[:, :, :t_valid],
        rtol=2e-5, atol=2e-5,
    )


def test_flash_prefill_shape_and_vt():
    """S != T (prefill) with V stored transposed [B,H,Dh,T]."""
    B, H, S, T, Dh = 2, 4, 64, 384, 64
    q = _mk((B, H, S, Dh), 3)
    k = _mk((B, H, Dh, T), 4)
    v_t = _mk((B, H, Dh, T), 5)
    ours = flash_encoder_attn(q, k, v_t, t_valid=T, v_transposed=True, interpret=True)
    v_std = v_t.transpose(0, 1, 3, 2)
    ref = flash_encoder_attn_reference(q, k, v_std, t_valid=T)
    assert ours.shape == (B, H, S, Dh)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_bf16_padded_cols():
    """bf16 inputs; padded key columns must not leak into valid rows."""
    B, H, T, TV, Dh = 1, 2, 256, 200, 64
    q = _mk((B, H, T, Dh), 6, jnp.bfloat16)
    k = _mk((B, H, Dh, T), 7, jnp.bfloat16)
    v = _mk((B, H, T, Dh), 8, jnp.bfloat16)
    # poison the padded tail of k/v: masked columns must have zero influence
    k = k.at[:, :, :, TV:].set(jnp.bfloat16(1e4))
    v = v.at[:, :, TV:, :].set(jnp.bfloat16(-1e4))
    ours = flash_encoder_attn(q, k, v, t_valid=TV, interpret=True)
    ref = flash_encoder_attn_reference(q, k, v, t_valid=TV)
    np.testing.assert_allclose(
        np.asarray(ours)[:, :, :TV].astype(np.float32),
        np.asarray(ref)[:, :, :TV].astype(np.float32),
        rtol=2e-2, atol=2e-2,
    )
    assert np.isfinite(np.asarray(ours)[:, :, :TV].astype(np.float32)).all()
