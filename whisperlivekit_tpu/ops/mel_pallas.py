"""Fused log-mel front-end as a Pallas TPU kernel.

The XLA lowering of the strided DFT-conv (audio/mel.py) runs at ~2% MFU on
v5e — the 400-wide stride-160 conv tiles poorly. This kernel reformulates
one block of 256 frames as dense MXU matmuls:

    frames[i, j] = audio[160 i + j]  built from THREE shifted row views
    (j = 160 q + r ⇒ frames = concat_q A2[q + i, :] with A2 = audio.reshape(-1, 160)),
    power = (frames @ cos)^2 + (frames @ sin)^2,  mel = power @ filters,
    out = log10(max(mel, 1e-10))

padded to MXU-friendly shapes (400→512 taps, 201→256 bins, 80→128 mels).
The whisper dynamic floor (max-8) and (x+4)/4 scaling need the global max,
so they stay in XLA on the kernel output.

Numerics are validated against the XLA implementation in interpret mode
(tests/test_mel_pallas.py); use on TPU via ``log_mel_pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.mel import HOP_LENGTH, N_FFT, _dft_kernel, mel_filterbank

FRAMES_PER_BLOCK = 256
ROWS_PER_BLOCK = FRAMES_PER_BLOCK + 8  # 256 frames + q-shift margin, tile-aligned
TAPS_PAD = 512     # >= N_FFT(400), lane-friendly
BINS = N_FFT // 2 + 1  # 201
BINS_PAD = 256
MELS_PAD = 128


@functools.lru_cache(maxsize=None)
def _padded_bases(n_mels: int):
    """(dft [3, 160, 512], mel [256, 128]) zero-padded bases.

    The 400-tap window splits into three 160-tap groups (q = j // 160); the
    kernel sums three [256,160]x[160,512] matmuls — Mosaic rejects lane-dim
    concatenation at non-128 offsets, so no frame concat is ever built.
    dft columns 0..255 = cos bins, 256..511 = sin bins.
    """
    kern = _dft_kernel()[:, 0, :]  # [402, 400]
    cos_b, sin_b = kern[:BINS].T, kern[BINS:].T  # [400, 201]
    full = np.zeros((3 * HOP_LENGTH, 2 * BINS_PAD), np.float32)
    full[:N_FFT, :BINS] = cos_b
    full[:N_FFT, BINS_PAD : BINS_PAD + BINS] = sin_b
    dft = full.reshape(3, HOP_LENGTH, 2 * BINS_PAD)
    mel = np.zeros((BINS_PAD, MELS_PAD), np.float32)
    mel[:BINS, :n_mels] = mel_filterbank(n_mels).T
    return dft, mel


def _kernel(audio_ref, dft_ref, mel_ref, out_ref):
    a2 = audio_ref[0, 0]  # [ROWS_PER_BLOCK, 160]
    spect = jnp.zeros((FRAMES_PER_BLOCK, 2 * BINS_PAD), jnp.float32)
    for q in range(3):
        f_q = a2[q : q + FRAMES_PER_BLOCK, :]          # [256, 160]
        spect += jnp.dot(f_q, dft_ref[q], preferred_element_type=jnp.float32)
    real = spect[:, :BINS_PAD]
    imag = spect[:, BINS_PAD:]
    power = real * real + imag * imag  # [256, 256]
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)  # [256, 128]
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


def log_mel_pallas(audio: jnp.ndarray, n_mels: int = 80, interpret: bool = False) -> jnp.ndarray:
    """audio [B, N] f32 → whisper-scaled log-mel [B, n_mels, N // 160]."""
    if audio.ndim == 1:
        return log_mel_pallas(audio[None], n_mels, interpret)[0]
    B, N = audio.shape
    n_frames = N // HOP_LENGTH
    n_blocks = (n_frames + FRAMES_PER_BLOCK - 1) // FRAMES_PER_BLOCK

    # center reflect pad (torch.stft semantics) + tail so every row view is valid
    pad_l = N_FFT // 2
    rows_needed = (n_blocks - 1) * FRAMES_PER_BLOCK + ROWS_PER_BLOCK
    total = rows_needed * HOP_LENGTH
    tail = total - (N + pad_l)
    x = jnp.pad(audio, ((0, 0), (pad_l, max(tail, 0))), mode="reflect")
    x2 = x[:, :total].reshape(B, rows_needed, HOP_LENGTH)

    # expand to non-overlapping per-block row windows [B, n_blocks, 264, 160]
    starts = np.arange(n_blocks) * FRAMES_PER_BLOCK
    gather_rows = starts[:, None] + np.arange(ROWS_PER_BLOCK)[None, :]
    x_blocks = x2[:, jnp.asarray(gather_rows)]  # [B, n_blocks, 264, 160]

    dft, mel_f = _padded_bases(n_mels)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_blocks * FRAMES_PER_BLOCK, MELS_PAD), jnp.float32
        ),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ROWS_PER_BLOCK, HOP_LENGTH),
                lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, HOP_LENGTH, 2 * BINS_PAD), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((BINS_PAD, MELS_PAD), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAMES_PER_BLOCK, MELS_PAD),
            lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(x_blocks, jnp.asarray(dft), jnp.asarray(mel_f))

    log_spec = out[:, :n_frames, :n_mels].transpose(0, 2, 1)  # [B, n_mels, T]
    floor = jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0
    return (jnp.maximum(log_spec, floor) + 4.0) / 4.0
