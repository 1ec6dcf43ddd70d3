"""Streaming Sortformer diarization backend (session side).

Duck-typed contract of reference diarization/sortformer_backend.py:130-336:
``insert_audio_chunk``, ``async diarize() -> List[SpeakerSegment]``,
``insert_silence``, ``close``; ``buffer_audio`` marks the drain-until-dry
protocol. Each ~1 s chunk: NeMo-style 128-band log-mel (+99-frame left
context from the previous chunk) → one jitted ``streaming_step`` →
frame-wise argmax runs → SpeakerSegments on the audio-sample clock.

Weights load from a local ``.nemo``/``.ckpt`` (converted without a NeMo
install — sortformer_jax.read_nemo_state_dict) or random dev weights for CI.
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..timed import SpeakerSegment
from . import sortformer_jax as S

logger = logging.getLogger(__name__)

SAMPLE_RATE = 16000
HOP = 160           # 10 ms mel hop (NeMo window_stride 0.01)
N_FFT = 512
WIN = 400           # 25 ms window
PREEMPH = 0.97
LOG_GUARD = 2.0**-24


@functools.lru_cache(maxsize=None)
def _nemo_dft_kernel() -> np.ndarray:
    """Hann(400)-windowed real-DFT basis zero-padded to n_fft=512, as conv
    kernels (same matmul-STFT trick as audio/mel.py, NeMo geometry)."""
    window = np.hanning(WIN + 1)[:-1]
    k = np.arange(N_FFT // 2 + 1)[:, None]
    t = np.arange(N_FFT)[None, :]
    # window occupies the center of the n_fft frame (torch.stft semantics)
    w_full = np.zeros(N_FFT)
    off = (N_FFT - WIN) // 2
    w_full[off : off + WIN] = window
    angle = 2.0 * np.pi * k * t / N_FFT
    cos_b = (np.cos(angle) * w_full[None, :]).astype(np.float32)
    sin_b = (np.sin(angle) * w_full[None, :]).astype(np.float32)
    return np.concatenate([cos_b, sin_b], axis=0)[:, None, :]


def nemo_log_mel(audio: jnp.ndarray, n_mels: int = 128) -> jnp.ndarray:
    """float audio [B, T] → log-mel [B, frames, n_mels], NeMo preprocessor
    semantics (preemphasis, 25 ms Hann / 10 ms hop / 512-fft power, Slaney
    mel, log(x + 2^-24), no normalization — reference passes normalize="NA")."""
    import jax

    from ..audio.mel import mel_filterbank

    x = audio
    x = jnp.concatenate([x[:, :1], x[:, 1:] - PREEMPH * x[:, :-1]], axis=1)
    pad = N_FFT // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),
        jnp.asarray(_nemo_dft_kernel()),
        window_strides=(HOP,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    n_bins = N_FFT // 2 + 1
    power = out[:, :n_bins] ** 2 + out[:, n_bins:] ** 2  # [B, bins, frames]
    filters = jnp.asarray(mel_filterbank(n_mels, n_fft=N_FFT))
    mel = jnp.einsum("mf,bft->bmt", filters, power, preferred_element_type=jnp.float32)
    return jnp.log(mel + LOG_GUARD).transpose(0, 2, 1)  # [B, frames, mels]


class SortformerDiarization:
    """Shared model holder (one per engine; sessions share the weights)."""

    def __init__(self, params, dims: S.SortformerDims):
        self.params = params
        self.dims = dims

    def new_session(self) -> "SortformerDiarizationOnline":
        return SortformerDiarizationOnline(self)


class SortformerDiarizationOnline:
    """Per-session streaming diarizer."""

    def __init__(self, shared: SortformerDiarization, sample_rate: int = SAMPLE_RATE):
        self.shared = shared
        self.dims = shared.dims
        self.sample_rate = sample_rate
        self.buffer_audio = np.zeros(0, np.float32)  # presence => drain protocol
        self.state = S.init_state(self.dims, 1)
        self.global_time_offset = 0.0
        self.chunk_index = 0
        self._prev_mel: Optional[np.ndarray] = None
        self.chunk_samples = self.dims.chunk_mel_frames * HOP
        self.chunk_duration = self.chunk_samples / sample_rate

    def insert_audio_chunk(self, pcm: np.ndarray) -> None:
        self.buffer_audio = np.concatenate([self.buffer_audio, np.asarray(pcm, np.float32)])

    def insert_silence(self, duration: Optional[float]) -> None:
        if duration:
            self.global_time_offset += duration

    async def diarize(self) -> List[SpeakerSegment]:
        if len(self.buffer_audio) < self.chunk_samples:
            return []
        audio = self.buffer_audio[: self.chunk_samples]
        self.buffer_audio = self.buffer_audio[self.chunk_samples :]

        # mel and the left-context concat stay ON DEVICE: fetching the mel
        # to host between the two programs costs a full tunnel round-trip
        # (~40 ms on axon) per chunk
        mel = nemo_log_mel(jnp.asarray(audio[None]), self.dims.n_mels)
        mel = mel[:, : self.dims.chunk_mel_frames]
        ctx = self.dims.left_ctx_mel_frames
        if self._prev_mel is not None:
            feats = jnp.concatenate([self._prev_mel[:, -ctx:], mel], axis=1)
            ctx_frames = ctx
        else:
            # first chunk: zero left context keeps the compiled shape unique
            feats = jnp.concatenate([jnp.zeros_like(mel[:, :ctx]), mel], axis=1)
            ctx_frames = ctx
        self._prev_mel = mel

        probs, self.state = S.streaming_step(
            self.shared.params, self.state, feats, self.dims,
            ctx_frames=ctx_frames,
        )
        segments = self._runs_to_segments(np.asarray(probs[0]))
        self.chunk_index += 1
        return segments

    def _runs_to_segments(self, probs: np.ndarray) -> List[SpeakerSegment]:
        """Frame-wise argmax → same-speaker runs on the audio clock
        (reference _process_predictions, sortformer_backend.py:281-318)."""
        speakers = np.argmax(probs, axis=-1)
        n = len(speakers)
        if n == 0:
            return []
        frame_dur = self.chunk_duration / n
        base = self.chunk_index * self.chunk_duration + self.global_time_offset
        out: List[SpeakerSegment] = []
        run_start = 0
        for i in range(1, n + 1):
            if i == n or speakers[i] != speakers[run_start]:
                out.append(
                    SpeakerSegment(
                        speaker=int(speakers[run_start]),
                        start=round(base + run_start * frame_dur, 2),
                        end=round(base + i * frame_dur, 2),
                    )
                )
                run_start = i
        return out

    def close(self) -> None:
        self.buffer_audio = np.zeros(0, np.float32)


def load_sortformer(config) -> SortformerDiarization:
    """Resolve weights: a local ``.nemo``/``.ckpt`` (NVIDIA
    diar_streaming_sortformer_4spk-v2 — `wlk pull sortformer` downloads it
    on networked hosts), or ``random:dev-tiny`` for CI."""
    import os

    import jax

    path = getattr(config, "sortformer_model_path", None)
    if path and str(path).startswith("random:"):
        dims = S.DEV_TINY
        params = S.init_params(dims, jax.random.PRNGKey(0))
        logger.warning("Sortformer running RANDOM dev weights (%s)", path)
        return SortformerDiarization(params, dims)
    if path and os.path.isdir(path):
        import glob

        nemos = sorted(glob.glob(os.path.join(path, "*.nemo")))
        if not nemos:
            raise FileNotFoundError(f"no .nemo file in {path}")
        path = nemos[0]
    if path and os.path.isfile(path):
        sd = S.read_nemo_state_dict(path)
        params, dims = S.convert_nemo_state_dict(sd)
        logger.info(
            "Loaded Sortformer %s (%d-layer conformer d=%d, %d-layer head d=%d)",
            path, dims.encoder_layers, dims.d_encoder, dims.head_layers, dims.d_model,
        )
        return SortformerDiarization(params, dims)
    raise FileNotFoundError(
        "Sortformer weights not found: pass --sortformer-model-path "
        "pointing at diar_streaming_sortformer_4spk-v2.nemo "
        "(`wlk pull sortformer` downloads it on networked hosts)"
    )
