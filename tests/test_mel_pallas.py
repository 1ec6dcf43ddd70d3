"""Pallas fused log-mel kernel vs the XLA reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlivekit_tpu.audio.mel import N_SAMPLES, log_mel_spectrogram, pad_or_trim
from whisperlivekit_tpu.ops.mel_pallas import log_mel_pallas


@pytest.mark.parametrize("seconds", [2.0, 30.0])
def test_pallas_matches_xla(seconds):
    rng = np.random.default_rng(0)
    n = int(16000 * seconds)
    audio = (0.2 * rng.standard_normal((2, n))).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    ours = np.asarray(log_mel_pallas(jnp.asarray(audio), interpret=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_pallas_128_mels():
    rng = np.random.default_rng(1)
    audio = (0.2 * rng.standard_normal((1, 16000 * 3))).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio), n_mels=128))
    ours = np.asarray(log_mel_pallas(jnp.asarray(audio), n_mels=128, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_pallas_full_window_shape():
    audio = np.zeros((1, N_SAMPLES), np.float32)
    out = np.asarray(log_mel_pallas(jnp.asarray(audio), interpret=True))
    assert out.shape == (1, 80, 3000)
