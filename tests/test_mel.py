"""Numerical parity of the matmul-DFT log-mel front-end.

Oracle: torch.stft pipeline with the exact reference semantics
(reference whisper/audio.py:110-157), computed locally on CPU.
"""

import numpy as np
import pytest
import torch

from conftest import reference_asset
from whisperlivekit_tpu.audio import mel as M


def _oracle_log_mel(audio: np.ndarray, n_mels: int, padding: int = 0) -> np.ndarray:
    x = torch.from_numpy(audio.astype(np.float32))
    if padding > 0:
        x = torch.nn.functional.pad(x, (0, padding))
    window = torch.hann_window(M.N_FFT)
    stft = torch.stft(x, M.N_FFT, M.HOP_LENGTH, window=window, center=True, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(M.mel_filterbank(n_mels))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).numpy()


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    t = np.arange(M.SAMPLE_RATE * 2) / M.SAMPLE_RATE
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(t.shape)
    return sig.astype(np.float32)


def test_stft_power_matches_torch(audio):
    power = np.asarray(M.stft_power(audio))
    window = torch.hann_window(M.N_FFT)
    ref = torch.stft(
        torch.from_numpy(audio), M.N_FFT, M.HOP_LENGTH, window=window,
        center=True, return_complex=True,
    )
    ref_power = (ref[..., :-1].abs() ** 2).numpy()
    assert power.shape == ref_power.shape
    np.testing.assert_allclose(power, ref_power, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_reference_pipeline(audio, n_mels):
    ours = np.asarray(M.log_mel_spectrogram(audio, n_mels=n_mels))
    ref = _oracle_log_mel(audio, n_mels)
    assert ours.shape == ref.shape == (n_mels, len(audio) // M.HOP_LENGTH)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_log_mel_with_30s_padding(audio):
    ours = np.asarray(M.log_mel_spectrogram(audio, padding=M.N_SAMPLES))
    ref = _oracle_log_mel(audio, 80, padding=M.N_SAMPLES)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_mel_filterbank_matches_reference_asset():
    asset = reference_asset("whisperlivekit/whisper/assets/mel_filters.npz")
    if asset is None:
        pytest.skip("reference assets not available")
    with np.load(asset) as f:
        for n_mels in (80, 128):
            ref = f[f"mel_{n_mels}"]
            np.testing.assert_allclose(M.mel_filterbank(n_mels), ref, atol=2e-7)


def test_pad_or_trim():
    x = np.ones(10, np.float32)
    assert M.pad_or_trim(np.asarray(x), 16).shape == (16,)
    assert M.pad_or_trim(np.asarray(x), 4).shape == (4,)
    out = np.asarray(M.pad_or_trim(np.asarray(x), 16))
    assert out[10:].sum() == 0


def test_batched_log_mel(audio):
    batch = np.stack([audio, audio * 0.5])
    out = np.asarray(M.log_mel_spectrogram(batch))
    single = np.asarray(M.log_mel_spectrogram(audio))
    assert out.shape == (2, 80, single.shape[-1])
    np.testing.assert_allclose(out[0], single, rtol=1e-5, atol=1e-5)
