"""Log-mel spectrogram front-end, TPU-first.

Numerically equivalent to the reference front-end (reference
whisper/audio.py:110-157: torch.stft with a periodic Hann window, center
reflect padding, power spectrum with the trailing frame dropped, Slaney mel
filterbank matmul, log10 with 1e-10 clamp, max-8 dynamic floor, (x+4)/4
scaling) — but expressed as a single strided convolution against a
window-fused DFT basis so the entire front-end is two MXU matmuls under jit
instead of an FFT: STFT(x) = conv(x, hann*cos), conv(x, hann*sin).

The mel filterbank is generated from the Slaney formula (the same recipe
that produced the reference's ``assets/mel_filters.npz``), so no binary
asset is required.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE          # 480000 samples in a 30 s window
N_FRAMES = N_SAMPLES // HOP_LENGTH              # 3000 mel frames in a 30 s window

N_SAMPLES_PER_TOKEN = 2 * HOP_LENGTH            # each decoder step attends 20 ms
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH   # 100 mel frames / s
TOKENS_PER_SECOND = SAMPLE_RATE // N_SAMPLES_PER_TOKEN  # 50 attention frames / s


@functools.lru_cache(maxsize=None)
def mel_filterbank(n_mels: int = 80, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape [n_mels, n_fft//2+1].

    Matches librosa.filters.mel(sr, n_fft, n_mels, htk=False, norm="slaney"),
    which is what the reference's mel_filters.npz contains.
    """
    fmin, fmax = 0.0, sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        # Slaney: linear below 1 kHz, log above.
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        safe = np.maximum(f, 1e-10)
        return np.where(
            f >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) / logstep, mels
        )

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_bins)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_kernel() -> np.ndarray:
    """Window-fused real DFT basis as conv kernels, shape [2*(n_fft//2+1), 1, n_fft].

    Channel c<201 computes Re(X_c); channel 201+c computes -Im(X_c) (the sign
    is irrelevant since only |X|^2 is consumed).
    """
    n = N_FFT
    n_bins = n // 2 + 1
    # Periodic Hann window: same as torch.hann_window(400, periodic=True).
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))
    k = np.arange(n_bins)[:, None]  # frequency bins
    t = np.arange(n)[None, :]       # time within frame
    angle = 2.0 * np.pi * k * t / n
    cos_b = (np.cos(angle) * window[None, :]).astype(np.float32)
    sin_b = (np.sin(angle) * window[None, :]).astype(np.float32)
    return np.concatenate([cos_b, sin_b], axis=0)[:, None, :]  # [402, 1, 400]


def stft_power(audio: jnp.ndarray, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Power spectrogram of 16 kHz float audio, shape [..., n_fft//2+1, n_frames].

    Center-padded (reflect) framing with hop 160, matching torch.stft
    semantics used by the reference; the trailing frame is dropped the same
    way (reference whisper/audio.py:147). ``precision=DEFAULT`` trades exact
    f32 MXU passes for ~6x fewer (streaming fast path; offline/parity keeps
    HIGHEST).
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    pad = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect").astype(jnp.float32)
    # explicit framing + one MXU matmul: a stride-160 conv lowers to VPU
    # column extraction on TPU (~10x slower than the equivalent dot)
    n_frames = (x.shape[1] - N_FFT) // HOP_LENGTH + 1
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * HOP_LENGTH
        + jnp.arange(N_FFT, dtype=jnp.int32)[None, :]
    )
    frames = x[:, idx]  # [B, n_frames, 400]
    kern = jnp.asarray(_dft_kernel())[:, 0, :]  # [402, 400]
    out = jnp.einsum(
        "btf,kf->bkt", frames, kern,
        preferred_element_type=jnp.float32, precision=precision,
    )
    n_bins = N_FFT // 2 + 1
    real, imag = out[:, :n_bins], out[:, n_bins:]
    power = (real * real + imag * imag)[..., :-1]  # drop last frame like reference
    return power[0] if squeeze else power


def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = 80,
    padding: int = 0,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Whisper-scaled log-mel spectrogram, shape [..., n_mels, n_frames].

    ``padding`` appends that many zero samples before framing (the reference
    pads a full 30 s window before encoding, whisper/audio.py:141).
    """
    if padding > 0:
        widths = [(0, 0)] * (audio.ndim - 1) + [(0, padding)]
        audio = jnp.pad(audio, widths)
    power = stft_power(audio, precision=precision)
    filters = jnp.asarray(mel_filterbank(n_mels))
    mel = jnp.einsum(
        "mf,...ft->...mt",
        filters,
        power,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # Dynamic floor: 8 dB below the global max of each item.
    floor = jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return (log_spec + 4.0) / 4.0


def pad_or_trim(array: jnp.ndarray, length: int = N_SAMPLES, axis: int = -1) -> jnp.ndarray:
    """Pad with zeros or trim along ``axis`` to exactly ``length``."""
    size = array.shape[axis]
    if size > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        return array[tuple(sl)]
    if size < length:
        widths = [(0, 0)] * array.ndim
        widths[axis] = (0, length - size)
        return jnp.pad(array, widths)
    return array
