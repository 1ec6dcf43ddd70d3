"""AudioProcessor: per-connection streaming pipeline.

Same session *contract* as the reference (reference audio_processor.py:54-1001):
``process_audio(bytes)`` in, ``create_tasks()`` → FrontData generator out,
duck-typed online processors underneath, sample-precise silence accounting,
lag watermarks, fail-loud guards.

Different *construction*: instead of one god-object with a method per
concern, the pipeline is assembled from small single-purpose parts —

- :class:`PcmIngest`        — byte framing + VAD segmentation + silence gate
- :class:`SilenceGate`      — explicit speech/silence state machine
- :class:`StateStore`       — the session State behind a lock, with all
                              watermark arithmetic in one place
- :class:`_Worker` family   — one queue consumer per modality
  (:class:`TranscribeWorker`, :class:`DiarizeWorker`, :class:`TranslateWorker`)
- :class:`TranslationRouter`— translate-on-complete batching + tail routing
- :class:`InferenceRunner`  — the inline/thread/scheduler dispatch policy
- :class:`AudioProcessor`   — thin façade owning lifecycle + the formatter

The compute behind ``process_iter`` is the shared TPU engine; everything in
this module is host asyncio orchestration.
"""

from __future__ import annotations

import asyncio
import logging
import traceback
from time import time
from typing import Any, AsyncGenerator, Awaitable, Callable, List, Optional, Union

import numpy as np

from ..audio.ffmpeg import FFmpegManager, FFmpegState
from ..audio.vad import FixedVADIterator
from ..engine.core import (
    TranscriptionEngine,
    online_diarization_factory,
    online_factory,
    online_translation_factory,
    session_translation_factory,
)
from ..timed import (
    ASRToken,
    ChangeSpeaker,
    FrontData,
    HypothesisTail,
    Silence,
    State,
    Transcript,
)
from .alignment import TokensAlignment, resolve_retention_seconds
from .metrics import SessionMetrics

logger = logging.getLogger(__name__)

SENTINEL = object()
MIN_DURATION_REAL_SILENCE = 5.0  # silences shorter than this are not displayed
SAMPLE_RATE = 16000
BYTES_PER_SAMPLE = 2


def _inline_inference_default() -> bool:
    """The axon TPU tunnel wedges when jax is dispatched from worker threads;
    run inference inline on the event loop there (the device call dominates
    anyway). Overridable via WLK_INLINE_INFERENCE=0/1."""
    import os

    env = os.environ.get("WLK_INLINE_INFERENCE")
    if env is not None:
        return env not in ("0", "false", "")
    return os.environ.get("JAX_PLATFORMS", "") == "axon"


async def get_all_from_queue(queue: asyncio.Queue):
    """Wait for one item; greedily coalesce immediately-available PCM chunks
    into one array. Non-PCM control items are never reordered past PCM."""
    item = await queue.get()
    if item is SENTINEL or not isinstance(item, np.ndarray):
        return item
    parts = [item]
    while True:
        try:
            nxt = queue.get_nowait()
        except asyncio.QueueEmpty:
            break
        if not isinstance(nxt, np.ndarray):
            queue.put_nowait(nxt)  # leave control items for the next round
            break
        parts.append(nxt)
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


class InferenceRunner:
    """Dispatch policy for backend calls: a scheduler-provided async variant
    when the bound object exposes ``<name>_async``, else inline on the loop
    or in a worker thread depending on platform."""

    def __init__(self) -> None:
        self.inline = _inline_inference_default()

    async def __call__(self, fn: Callable, *args):
        owner = getattr(fn, "__self__", None)
        async_fn = getattr(owner, fn.__name__ + "_async", None) if owner else None
        if async_fn is not None:
            return await async_fn(*args)
        if self.inline:
            return fn(*args)
        return await asyncio.to_thread(fn, *args)


class StateStore:
    """The session State behind one asyncio.Lock.

    Every watermark rule lives here: ``end_buffer`` (latest known end),
    ``end_transcription_processed`` (audio the backend consumed),
    ``end_transcription_committed`` (audio covered by committed words),
    ``end_attributed_speaker`` (diarization frontier).
    """

    def __init__(self, retention_seconds: float) -> None:
        self.state = State()
        self.lock = asyncio.Lock()
        self.retention_seconds = retention_seconds

    async def commit(
        self,
        tokens: List[ASRToken],
        buffer: Optional[Transcript],
        processed_upto: float,
    ) -> None:
        """Fold one transcription result into the State."""
        ends = [self.state.end_buffer, processed_upto]
        if tokens:
            ends.append(tokens[-1].end)
        if buffer is not None and buffer.end is not None:
            ends.append(buffer.end)
        async with self.lock:
            st = self.state
            st.tokens.extend(tokens)
            if buffer is not None:
                st.buffer_transcription = buffer
                st.new_tokens_buffer = buffer
            st.end_buffer = max(ends)
            st.end_transcription_processed = max(
                st.end_transcription_processed, processed_upto
            )
            if tokens:
                st.end_transcription_committed = max(
                    st.end_transcription_committed, tokens[-1].end or 0.0
                )
            st.new_tokens.extend(tokens)
            self._drop_expired()

    async def set_buffer(self, buffer: Transcript) -> None:
        async with self.lock:
            self.state.buffer_transcription = buffer

    async def mark_processed(self, upto: float) -> None:
        """Advance the processed watermark only (end-of-stream, no output)."""
        async with self.lock:
            self.state.end_transcription_processed = max(
                self.state.end_transcription_processed, upto
            )

    async def add_display_silence(self, silence: Silence) -> None:
        async with self.lock:
            self.state.new_tokens.append(silence)

    async def merge_diarization(self, segments: list, replace: bool) -> None:
        if not segments and not replace:
            return
        frontier = max((getattr(s, "end", 0.0) for s in segments), default=0.0)
        async with self.lock:
            if replace:
                self.state.new_diarization = segments
                self.state.new_diarization_replaces = True
            else:
                self.state.new_diarization.extend(segments)
            self.state.end_attributed_speaker = max(
                self.state.end_attributed_speaker, frontier
            )

    async def merge_translation(self, translation, buffer) -> None:
        async with self.lock:
            self.state.new_translation.append(translation)
            self.state.new_translation_buffer = buffer

    def _drop_expired(self) -> None:
        """Bound state.tokens by the retention policy (lock held)."""
        st = self.state
        if not st.tokens:
            return
        cutoff = max(st.end_buffer, st.tokens[-1].end) - self.retention_seconds
        if cutoff <= 0:
            return
        keep = next((i for i, t in enumerate(st.tokens) if t.end >= cutoff), None)
        if keep is None:
            st.tokens = st.tokens[-1:]
        elif keep:
            st.tokens = st.tokens[keep:]

    async def snapshot(
        self,
        *,
        audio_seconds: float,
        beg_loop: Optional[float],
        transcription_enabled: bool,
    ) -> State:
        """Refresh derived lag fields and return the State (shared object)."""
        async with self.lock:
            st = self.state
            st.remaining_time_transcription = 0.0
            if st.end_buffer > 0 and beg_loop:
                st.remaining_time_transcription = max(
                    0, round(time() - beg_loop - st.end_buffer, 1)
                )
            st.remaining_time_diarization = 0.0
            if st.tokens:
                latest = max(st.end_buffer, st.tokens[-1].end or 0)
                st.remaining_time_diarization = max(
                    0, round(latest - st.end_attributed_speaker, 1)
                )
            if transcription_enabled:
                committed = st.end_transcription_committed
                if st.tokens:
                    committed = max(committed, st.tokens[-1].end or 0.0)
                st.end_transcription_committed = committed
                processed = max(0.0, st.end_transcription_processed)
                st.remaining_time_transcription_processing = max(
                    0.0, round(audio_seconds - processed, 1)
                )
                st.remaining_time_transcription_policy = max(
                    0.0, round(processed - committed, 1)
                )
            else:
                st.remaining_time_transcription_processing = 0.0
                st.remaining_time_transcription_policy = 0.0
            return st


class SilenceGate:
    """Speech/silence state machine with sample-precise transitions.

    States: OPEN (speech flowing) / CLOSED (in silence). The gate owns the
    ``current_silence`` record; transitions notify the processor so it can
    fan events out to the worker queues.
    """

    def __init__(
        self,
        metrics: SessionMetrics,
        on_begin: Callable[[Silence], Awaitable[None]],
        on_end: Callable[[Silence], Awaitable[None]],
    ) -> None:
        self.current: Optional[Silence] = None
        self._metrics = metrics
        self._on_begin = on_begin
        self._on_end = on_end

    @property
    def closed(self) -> bool:
        return self.current is not None

    def open_initial(self) -> None:
        """Streams start inside silence until the VAD says otherwise."""
        self.current = Silence(start=0.0, is_starting=True)

    async def close(self, at_seconds: float) -> None:
        """speech → silence."""
        if self.current:
            return
        self.current = Silence(is_starting=True, start=at_seconds)
        await self._on_begin(Silence(is_starting=True, start=at_seconds))

    async def open(self, at_seconds: float) -> Optional[Silence]:
        """silence → speech; returns the completed Silence record."""
        if not self.current:
            return None
        sil = self.current
        sil.end = at_seconds
        sil.is_starting = False
        sil.has_ended = True
        sil.compute_duration()
        self._metrics.n_silence_events += 1
        if sil.duration is not None:
            self._metrics.total_silence_duration_s += sil.duration
        self.current = None
        await self._on_end(sil)
        return sil


class SilentBackendAlarm:
    """One loud error if the backend produced nothing after N seconds of
    audio — the 'everything looks fine but no captions' failure mode."""

    WARN_AFTER_SECONDS = 20.0

    def __init__(self) -> None:
        self.any_output = False
        self.warned = False

    def observe(self, produced_output: bool, audio_seconds: float) -> None:
        if produced_output:
            self.any_output = True
            return
        if self.any_output or self.warned or audio_seconds < self.WARN_AFTER_SECONDS:
            return
        self.warned = True
        logger.error(
            "ASR backend produced no output after %.0f s of audio. The backend is "
            "likely failing on every chunk; check earlier warnings for the root cause.",
            audio_seconds,
        )


class TranslationRouter:
    """Feeds the translation queue; with translate-on-complete, holds tokens
    until a sentence closes (anti-flicker)."""

    def __init__(self, queue: Optional[asyncio.Queue], on_complete: bool) -> None:
        self.queue = queue
        self.on_complete = on_complete
        self._held: List[ASRToken] = []

    async def route(self, tokens: List[ASRToken]) -> None:
        if not self.queue or not tokens:
            return
        if not self.on_complete:
            for t in tokens:
                await self.queue.put(t)
            return
        self._held.extend(tokens)
        closed_upto = max(
            (i for i, t in enumerate(self._held) if t.has_punctuation()), default=-1
        )
        if closed_upto >= 0:
            for t in self._held[: closed_upto + 1]:
                await self.queue.put(t)
            self._held = self._held[closed_upto + 1 :]

    async def flush(self) -> None:
        if self.queue:
            for t in self._held:
                await self.queue.put(t)
        self._held = []

    async def route_tail(self, translation_backend, buffer: Optional[Transcript]) -> None:
        """Draft-ahead translators also want the unstable hypothesis."""
        if not self.queue or translation_backend is None:
            return
        if not getattr(translation_backend, "wants_hypothesis_tail", False):
            return
        text = (buffer.text or "").strip() if buffer else ""
        if text:
            await self.queue.put(
                HypothesisTail(start=buffer.start, end=buffer.end, text=text)
            )


# ---------------------------------------------------------------------------
# Queue workers (one per modality)
# ---------------------------------------------------------------------------


class _Worker:
    """Base queue consumer: dispatches items by type, guards exceptions,
    runs a finish hook on SENTINEL."""

    name = "worker"

    def __init__(self, queue: asyncio.Queue) -> None:
        self.queue = queue

    async def run(self) -> None:
        while True:
            try:
                item = await self._next_item()
                if item is _SKIP:
                    continue
                if item is SENTINEL:
                    await self.finish()
                    break
                await self.dispatch(item)
            except Exception as e:
                logger.warning("Exception in %s: %s", self.name, e)
                logger.debug(traceback.format_exc())
        await self.closed()
        logger.info("%s task finished.", self.name)

    async def _next_item(self):
        return await get_all_from_queue(self.queue)

    async def dispatch(self, item) -> None:
        if isinstance(item, Silence):
            await self.on_silence(item)
        elif isinstance(item, ChangeSpeaker):
            await self.on_speaker(item)
        elif isinstance(item, np.ndarray):
            await self.on_pcm(item)
        else:
            await self.on_other(item)

    async def on_silence(self, item: Silence) -> None: ...
    async def on_speaker(self, item: ChangeSpeaker) -> None: ...
    async def on_pcm(self, item: np.ndarray) -> None: ...
    async def on_other(self, item) -> None: ...
    async def finish(self) -> None: ...
    async def closed(self) -> None: ...


_SKIP = object()


class TranscribeWorker(_Worker):
    """Drives the online ASR processor and folds its results into the State.

    Keeps the *stream clock*: cumulative seconds of active audio + completed
    silences, which is what `processed_upto` watermarks are measured against.
    """

    name = "transcription_processor"
    IDLE_REFRESH_S = 0.5  # streaming backends emit between chunks; poll buffer

    def __init__(
        self,
        queue: asyncio.Queue,
        backend,
        store: StateStore,
        infer: InferenceRunner,
        metrics: SessionMetrics,
        alarm: SilentBackendAlarm,
        router: TranslationRouter,
        sep: str,
    ) -> None:
        super().__init__(queue)
        self.backend = backend
        self.store = store
        self.infer = infer
        self.metrics = metrics
        self.alarm = alarm
        self.router = router
        self.sep = sep
        self.stream_clock = 0.0

    async def _next_item(self):
        try:
            return await asyncio.wait_for(
                get_all_from_queue(self.queue), timeout=self.IDLE_REFRESH_S
            )
        except asyncio.TimeoutError:
            await self.store.set_buffer(self.backend.get_buffer())
            return _SKIP

    # -- handlers --

    async def on_pcm(self, pcm: np.ndarray) -> None:
        self.stream_clock += len(pcm) / SAMPLE_RATE
        self.backend.insert_audio_chunk(pcm, self.stream_clock)
        t0 = time()
        tokens, upto = await self.infer(self.backend.process_iter)
        self.metrics.transcription_durations.append(time() - t0)
        self.metrics.n_transcription_calls += 1
        tokens = tokens or []
        self.metrics.n_tokens_produced += len(tokens)
        await self._publish(tokens, upto)

    async def on_silence(self, item: Silence) -> None:
        tokens: List[ASRToken] = []
        upto = self.store.state.end_buffer
        if item.is_starting:
            tokens, upto = await self.infer(self.backend.start_silence)
            tokens = tokens or []
        if item.has_ended:
            self.stream_clock += item.duration
            upto = self.stream_clock
            last_end = (
                self.store.state.tokens[-1].end if self.store.state.tokens else 0
            )
            self.backend.end_silence(item.duration, last_end)
        await self._publish(tokens, max(upto, self.stream_clock))

    async def on_speaker(self, item: ChangeSpeaker) -> None:
        # backends may flush held-back frontier words at a speaker change
        # (causal backends return them; AlignAtt handles it internally)
        result = await self.infer(self.backend.new_speaker, item)
        if isinstance(result, list) and result:
            await self._publish(result, self.store.state.end_buffer)

    async def _publish(self, tokens: List[ASRToken], upto: float) -> None:
        buffer = self.backend.get_buffer()
        if tokens:
            # committed words may still sit at the head of the hypothesis
            committed_text = self.sep.join(t.text for t in tokens)
            if buffer.text.startswith(committed_text):
                buffer.text = buffer.text[len(committed_text) :].lstrip()
        await self.store.commit(tokens, buffer, upto)
        self.alarm.observe(bool(tokens) or bool(buffer.text.strip()), self.stream_clock)
        await self.router.route(tokens)
        await self.router.route_tail(getattr(self, "_translation_backend", None), buffer)

    # -- end of stream --

    async def finish(self) -> None:
        try:
            await self._finish_inner()
        except Exception as e:
            logger.warning("Error finishing transcription: %s", e)
            logger.debug(traceback.format_exc())

    async def _finish_inner(self) -> None:
        if hasattr(self.backend, "finish"):
            tokens, end_time = await self.infer(self.backend.finish)
        else:
            tokens, end_time = await self.infer(self.backend.start_silence)
        tokens = tokens or []
        buffer = self.backend.get_buffer()

        if not tokens:
            tokens, buffer = self._promote_pending_buffer(end_time, buffer)
        if tokens:
            self.metrics.n_tokens_produced += len(tokens)
            await self.store.commit(tokens, buffer, end_time)
            await self.router.route(tokens)
        else:
            await self.store.mark_processed(end_time)
        await self.router.flush()

    def _promote_pending_buffer(self, end_time, buffer):
        """A non-empty unstable buffer at EOF becomes one final token rather
        than silently vanishing."""
        pending = self.store.state.buffer_transcription
        text = (pending.text or "").strip() if pending else ""
        if not text:
            return [], buffer
        start = pending.start if pending.start is not None else self.store.state.end_buffer
        end = pending.end if pending.end is not None else end_time
        if end is None or end < start:
            end = start
        token = ASRToken(
            start=start, end=end, text=text, detected_language=pending.detected_language
        )
        return [token], Transcript()


class DiarizeWorker(_Worker):
    name = "diarization_processor"

    def __init__(self, queue: asyncio.Queue, backend, store: StateStore) -> None:
        super().__init__(queue)
        self.backend = backend
        self.store = store
        # backends with an internal buffer are drained until dry; others
        # return a cumulative snapshot that replaces previous segments
        self.drains = hasattr(backend, "buffer_audio")

    async def on_pcm(self, pcm: np.ndarray) -> None:
        self.backend.insert_audio_chunk(pcm)
        if self.drains:
            await self._drain()
        else:
            segments = await self.backend.diarize()
            await self.store.merge_diarization(segments, replace=True)

    async def on_silence(self, item: Silence) -> None:
        if item.has_ended:
            self.backend.insert_silence(item.duration)

    async def _drain(self) -> None:
        while True:
            segments = await self.backend.diarize()
            if not segments:
                return
            await self.store.merge_diarization(segments, replace=False)

    async def closed(self) -> None:
        if self.drains:
            try:
                await self._drain()
            except Exception as e:
                logger.warning("Exception draining diarization buffer: %s", e)


class TranslateWorker(_Worker):
    name = "translation_processor"

    def __init__(
        self, queue: asyncio.Queue, backend, store: StateStore, infer: InferenceRunner
    ) -> None:
        super().__init__(queue)
        self.backend = backend
        self.store = store
        self.infer = infer

    async def on_silence(self, item: Silence) -> None:
        if item.is_starting:
            await self._maybe_merge(*self.backend.validate_buffer_and_reset())
        if item.has_ended:
            self.backend.insert_silence(item.duration)

    async def on_speaker(self, item: ChangeSpeaker) -> None:
        await self._maybe_merge(*self.backend.validate_buffer_and_reset())

    async def on_other(self, item) -> None:
        self.backend.insert_tokens(item)
        translation, buffer = await self.infer(self.backend.process)
        await self._maybe_merge(translation, buffer)

    # tokens arrive one-by-one, never as ndarrays; route them the same way
    on_pcm = on_other

    async def _maybe_merge(self, translation, buffer) -> None:
        if translation is not None:
            await self.store.merge_translation(translation, buffer)


# ---------------------------------------------------------------------------
# Input side: PCM framing + VAD segmentation
# ---------------------------------------------------------------------------


class PcmIngest:
    """Turns raw s16le bytes into speech/silence-segmented float chunks.

    Buffers until one framing chunk is available, runs the (optional) VAD,
    clamps event samples into the chunk, and hands active audio spans + gate
    transitions to the processor.
    """

    def __init__(
        self,
        processor: "AudioProcessor",
        vad,
        vad_is_async: bool,
        use_vad: bool,
        chunk_seconds: float,
    ) -> None:
        self.proc = processor
        self.vad = vad
        self.vad_is_async = vad_is_async
        self.use_vad = use_vad
        self.buffer = bytearray()
        self.total_samples = 0
        self.min_bytes = int(SAMPLE_RATE * chunk_seconds) * BYTES_PER_SAMPLE
        self.max_bytes = 32000 * 5

    @property
    def seconds(self) -> float:
        return self.total_samples / SAMPLE_RATE

    def feed(self, data: bytes) -> None:
        self.buffer.extend(data)

    @staticmethod
    def to_float(pcm: Union[bytes, bytearray]) -> np.ndarray:
        from .. import native

        return native.s16le_to_f32(bytes(pcm))

    def _take_aligned(self, limit: Optional[int] = None) -> Optional[np.ndarray]:
        n = len(self.buffer) if limit is None else min(len(self.buffer), limit)
        n -= n % BYTES_PER_SAMPLE
        if n == 0:
            return None
        arr = self.to_float(self.buffer[:n])
        del self.buffer[:n]
        return arr

    async def pump(self) -> None:
        """Consume the byte buffer if a full framing chunk is ready."""
        gate = self.proc.silence_gate
        if not self.use_vad and gate.closed:
            # without a detector, nothing can end the opening silence
            await self.proc.on_silence_open(self.total_samples)

        if len(self.buffer) < self.min_bytes:
            return
        if len(self.buffer) > self.max_bytes:
            logger.warning(
                "Audio buffer too large: %.2fs; consider a smaller model.",
                len(self.buffer) / (SAMPLE_RATE * BYTES_PER_SAMPLE),
            )
        pcm = self._take_aligned(self.max_bytes)
        if pcm is None:
            return
        await self._segment(pcm)
        if not self.proc.args.transcription and not self.proc.args.diarization:
            await asyncio.sleep(0.1)  # nothing consumes; don't spin the loop

    async def flush(self) -> None:
        """EOF: emit whatever is left, ending any open silence first."""
        pcm = self._take_aligned()
        if pcm is None:
            return
        if self.proc.silence_gate.closed:
            await self.proc.on_silence_open(self.total_samples)
        self.total_samples += len(pcm)
        await self.proc.on_active_audio(pcm)
        logger.info(
            "Flushed remaining PCM buffer: %d samples (%.2fs)",
            len(pcm), len(pcm) / SAMPLE_RATE,
        )

    async def _segment(self, pcm: np.ndarray) -> None:
        """Split one chunk at VAD boundaries (sample-precise: active +
        silence spans sum exactly to stream time)."""
        lo = self.total_samples
        hi = lo + len(pcm)
        events = []
        if self.use_vad and self.vad is not None:
            if self.vad_is_async:
                events = (await self.vad(pcm)) or []
            else:
                # Host Silero costs ~10 ms per 0.5 s chunk (torch.jit, GIL
                # released inside ops). Inline that is ~50% event-loop
                # occupancy at 24 real-time sessions — measured to collapse
                # serving (e2e n=24: 10 ticks/120 s with inline VAD vs 70
                # with VAD off). A worker thread keeps the loop free; VAD
                # state is per-session so only this session's _segment
                # (serial by construction) touches it.
                events = (await asyncio.to_thread(self.vad, pcm)) or []

        gate = self.proc.silence_gate
        cursor = 0  # offset into pcm of un-emitted audio
        for ev in events:
            if "start" in ev and gate.closed:
                at = int(np.clip(int(ev["start"]), lo, hi))
                await self.proc.on_silence_open(at)
                cursor = at - lo
            if "end" in ev and not gate.closed:
                at = int(np.clip(int(ev["end"]), lo, hi))
                if at - lo > cursor:
                    await self.proc.on_active_audio(pcm[cursor : at - lo])
                await self.proc.on_silence_close(at)
                cursor = at - lo
        if not gate.closed and cursor < len(pcm):
            await self.proc.on_active_audio(pcm[cursor:])
        self.total_samples = hi


# ---------------------------------------------------------------------------
# The façade
# ---------------------------------------------------------------------------


def probe_backend_state(online) -> dict:
    """Duck-typed diagnostics for whatever online ASR processor is running
    (wlk diagnose; mirror of reference cli.py:1253-1329's per-backend probe
    adapted to this package's processors)."""
    if online is None:
        return {"error": "no transcription processor"}
    info: dict = {}
    model = getattr(online, "model", None)
    if model is not None and hasattr(model, "segments_len"):
        # SimulStreaming / AlignAtt session
        info["backend_type"] = "simulstreaming"
        info["window_sec"] = round(model.segments_len(), 2)
        info["committed_tokens"] = sum(len(t) for t in model.committed_tokens)
        info["context_chars"] = len(model.context.text)
        info["pending_utf8_tokens"] = len(model.pending_incomplete_tokens)
        info["pool_lane"] = model.pool_lane
        info["enc_cached_frames"] = model._enc_synced_frames
        if getattr(model, "xkv_slot", None) is not None:
            info["xkv_group"] = model.xkv_gi
            info["xkv_slot"] = model.xkv_slot
    elif hasattr(online, "committer"):
        # qwen3-causal / voxtral-realtime block-causal family
        info["backend_type"] = type(online).__name__
        info["text_cache_pos"] = online.text_pos
        info["blocks_this_segment"] = online.blocks_this_segment
        info["tower_frames_filled"] = online.frames_filled
        info["committed_words"] = online.committer.n_committed
        info["carry_context_tokens"] = len(getattr(online, "_carry_ids", []))
    elif hasattr(online, "transcript_buffer"):
        # LocalAgreement / windowed re-transcription
        info["backend_type"] = type(online).__name__.lower()
        hb = online.transcript_buffer
        info["committed_words_in_buffer"] = len(hb.committed_in_buffer)
        info["hypothesis_words"] = len(hb.buffer)
        info["last_committed_time"] = round(hb.last_committed_time, 2)
    else:
        info["backend_type"] = type(online).__name__
    buf = getattr(online, "audio_buffer", None)
    if buf is not None:
        info["audio_buffer_sec"] = round(len(buf) / SAMPLE_RATE, 2)
    try:
        b = online.get_buffer()
        info["buffer_text_chars"] = len(getattr(b, "text", "") or "")
    except Exception as e:  # diagnostics must never throw
        info["buffer_error"] = str(e)
    return info


class AudioProcessor:
    """One instance per connection/session. Public surface:
    ``process_audio(bytes)``, ``create_tasks() -> async generator of
    FrontData``, ``cleanup()`` (the whole server boundary, as in the
    reference's docs/technical_integration.md)."""

    def __init__(self, **kwargs: Any) -> None:
        session_language = kwargs.pop("language", None)
        session_mode = kwargs.pop("mode", "full")
        session_target_language = kwargs.pop("target_language", None)

        engine = kwargs.pop("transcription_engine", None)
        if not isinstance(engine, TranscriptionEngine):
            engine = TranscriptionEngine(**kwargs)
        self.engine = engine
        self.args = engine.args

        self.sample_rate = SAMPLE_RATE
        self.channels = 1
        self.is_pcm_input = self.args.pcm_input
        self.is_stopping = False
        self.beg_loop: Optional[float] = None
        self.metrics = SessionMetrics()
        self.sep = " "

        retention = resolve_retention_seconds(
            getattr(self.args, "retention_seconds", None), session_mode
        )
        self.store = StateStore(retention)
        self.silence_gate = SilenceGate(
            self.metrics, self._fanout_silence, self._fanout_silence_end
        )
        self.tokens_alignment = TokensAlignment(
            self.store.state, self.args, self.sep, retention_seconds=retention
        )

        self._infer = InferenceRunner()
        self._alarm = SilentBackendAlarm()

        # per-modality queues (present iff the modality is configured)
        self.transcription_queue = asyncio.Queue() if self.args.transcription else None
        self.diarization_queue = asyncio.Queue() if self.args.diarization else None
        self.translation_queue = asyncio.Queue() if self.args.target_language else None

        self._build_backends(session_language, session_target_language)
        self._router = TranslationRouter(
            self.translation_queue,
            bool(getattr(self.args, "translate_on_complete", False)),
        )

        self.ingest = PcmIngest(
            self,
            *self._build_vad(),
            use_vad=bool(self.args.vac),
            chunk_seconds=(
                self.args.vac_chunk_size if self.args.vac else self.args.min_chunk_size
            ),
        )

        self.ffmpeg_manager: Optional[FFmpegManager] = None
        self._ffmpeg_error: Optional[str] = None
        if not self.is_pcm_input:
            self.ffmpeg_manager = FFmpegManager(self.sample_rate, self.channels)
            self.ffmpeg_manager.on_error_callback = self._on_ffmpeg_error

        # admission: raises EngineAtCapacity when the chip is full (last, so
        # a failed construction never holds a slot)
        self.engine.acquire_session()
        self._session_slot_held = True

        self._tasks: List[asyncio.Task] = []
        self._worker_tasks: List[asyncio.Task] = []
        self.last_response_content = FrontData()

    # -- construction helpers --

    def _build_backends(self, session_language, session_target_language) -> None:
        engine, args = self.engine, self.args
        self.transcription = None
        self.diarization = None
        self.translation = None
        if args.transcription and engine.asr is not None:
            self.transcription = online_factory(
                args, engine.asr,
                language=session_language,
                scheduler=getattr(engine, "scheduler", None),
            )
            self.sep = engine.asr.sep
            self.tokens_alignment.sep = self.sep
        if args.diarization and engine.diarization_model is not None:
            self.diarization = online_diarization_factory(args, engine.diarization_model)
        if engine.translation_model is not None:
            if session_target_language and session_target_language != args.target_language:
                self.translation = session_translation_factory(
                    args, engine.translation_model, session_target_language
                )
            else:
                self.translation = online_translation_factory(args, engine.translation_model)
        elif session_target_language:
            logger.warning(
                "Session requested target_language=%r but server started without "
                "translation; ignoring.", session_target_language,
            )

    def _build_vad(self):
        if self.args.vac:
            if getattr(self.engine, "vad_scheduler", None) is not None:
                from ..audio.vad_batched import AsyncFixedVADIterator

                return AsyncFixedVADIterator(self.engine.vad_scheduler), True
            if self.engine.vac_model is not None:
                return FixedVADIterator(self.engine.vac_model.new_session()), False
        return None, False

    async def _on_ffmpeg_error(self, error_type: str) -> None:
        logger.error("FFmpeg error: %s", error_type)
        self._ffmpeg_error = error_type

    # -- compat accessors (tests / harness poke these) --

    @property
    def state(self) -> State:
        return self.store.state

    @property
    def lock(self) -> asyncio.Lock:
        return self.store.lock

    @property
    def current_silence(self) -> Optional[Silence]:
        return self.silence_gate.current

    @property
    def _silent_backend_warned(self) -> bool:
        return self._alarm.warned

    @property
    def total_pcm_samples(self) -> int:
        return self.ingest.total_samples

    @property
    def vac(self):
        return self.ingest.vad

    @property
    def _vac_async(self) -> bool:
        return self.ingest.vad_is_async

    # ------------------------------------------------------------------
    # Diagnostics (wlk diagnose probes these per interval; reference
    # cli.py:1253-1347 _probe_backend_state/_probe_pipeline_state)
    # ------------------------------------------------------------------

    def probe_internals(self) -> dict:
        """Pipeline-level + backend-internal state snapshot."""
        info = {
            "total_audio_sec": round(self.total_pcm_samples / self.sample_rate, 2),
            "is_stopping": self.is_stopping,
            "in_silence": self.current_silence is not None,
            "n_state_tokens": len(self.store.state.tokens),
        }
        for name in ("transcription", "diarization", "translation"):
            q = getattr(self, f"{name}_queue")
            if q is not None:
                info[f"{name}_queue_depth"] = q.qsize()
        sched = getattr(self.engine, "scheduler", None)
        if sched is not None and hasattr(sched, "stats"):
            info["scheduler"] = sched.stats()
        info["backend"] = probe_backend_state(self.transcription)
        return info

    # ------------------------------------------------------------------
    # Event fan-out (gate transitions + active audio → worker queues)
    # ------------------------------------------------------------------

    def _fanout_queues(self) -> List[asyncio.Queue]:
        out = []
        if self.transcription_queue:
            out.append(self.transcription_queue)
        if self.args.diarization and self.diarization_queue:
            out.append(self.diarization_queue)
        return out

    async def _fanout_silence(self, event: Silence) -> None:
        """Gate closed (silence began): notify every modality."""
        for q in self._fanout_queues():
            await q.put(event)
        if self.translation_queue:
            await self._router.flush()
            await self.translation_queue.put(event)

    async def _fanout_silence_end(self, sil: Silence) -> None:
        """Gate opened (silence ended): display long silences + notify."""
        if sil.duration and sil.duration > MIN_DURATION_REAL_SILENCE:
            await self.store.add_display_silence(sil)
        for q in self._fanout_queues():
            await q.put(sil)
        if self.translation_queue:
            await self._router.flush()
            await self.translation_queue.put(sil)

    async def on_silence_close(self, at_sample: int) -> None:
        await self.silence_gate.close(at_sample / SAMPLE_RATE)

    async def on_silence_open(self, at_sample: int) -> None:
        await self.silence_gate.open(at_sample / SAMPLE_RATE)

    async def on_active_audio(self, pcm: np.ndarray) -> None:
        if pcm is None or pcm.size == 0:
            return
        if self.transcription_queue:
            await self.transcription_queue.put(pcm.copy())
        if self.args.diarization and self.diarization_queue:
            await self.diarization_queue.put(pcm.copy())

    # ------------------------------------------------------------------
    # Input path
    # ------------------------------------------------------------------

    async def process_audio(self, message: Optional[bytes]) -> None:
        if not self.beg_loop:
            self.beg_loop = time()
            self.metrics.session_start = self.beg_loop
            self.silence_gate.open_initial()
            self.tokens_alignment.beg_loop = self.beg_loop

        if not message:
            logger.info("Empty audio message received; stopping.")
            self.is_stopping = True
            if self.is_pcm_input:
                await self.ingest.flush()
                await self._signal_input_complete()
            elif self.ffmpeg_manager:
                await self.ffmpeg_manager.close_stdin()
            return

        if self.is_stopping:
            logger.warning("AudioProcessor is stopping. Ignoring incoming audio.")
            return

        self.metrics.n_chunks_received += 1
        if self.is_pcm_input:
            self.ingest.feed(message)
            await self.ingest.pump()
        elif self.ffmpeg_manager:
            ok = await self.ffmpeg_manager.write_data(message)
            if not ok:
                state = await self.ffmpeg_manager.get_state()
                if state == FFmpegState.FAILED:
                    logger.error("FFmpeg is in FAILED state, cannot process audio")
                else:
                    logger.warning("Failed to write audio data to FFmpeg")
        else:
            logger.error("FFmpeg manager not initialized for non-PCM input.")

    async def _read_ffmpeg_stdout(self) -> None:
        """Pull decoded PCM out of ffmpeg at the pace audio arrives."""
        beg = time()
        while True:
            try:
                state = await self.ffmpeg_manager.get_state()
                if state in (FFmpegState.FAILED, FFmpegState.STOPPED):
                    if state == FFmpegState.FAILED:
                        logger.error("FFmpeg is in FAILED state, cannot read data")
                    break
                if state != FFmpegState.RUNNING:
                    await asyncio.sleep(0.1)
                    continue
                now = time()
                want = max(int(32000 * max(0.0, now - beg)), 4096)
                beg = now
                chunk = await self.ffmpeg_manager.read_data(want)
                if chunk is None:
                    await asyncio.sleep(0.05)
                    continue
                if chunk == b"":
                    logger.info("FFmpeg stdout reached EOF.")
                    break
                self.ingest.feed(chunk)
                await self.ingest.pump()
            except asyncio.CancelledError:
                return
            except Exception as e:
                logger.warning("Exception reading ffmpeg stdout: %s", e)
                await asyncio.sleep(0.2)

        await self.ingest.flush()
        if self.ffmpeg_manager:
            await self.ffmpeg_manager.stop()
        await self._signal_input_complete()

    async def _signal_input_complete(self) -> None:
        """Sentinel cascade: transcription first (it re-signals the rest when
        it drains), else straight to the other modalities."""
        if self.transcription_queue:
            await self.transcription_queue.put(SENTINEL)
            return
        for q in (self.diarization_queue, self.translation_queue):
            if q:
                await q.put(SENTINEL)

    # ------------------------------------------------------------------
    # Task lifecycle
    # ------------------------------------------------------------------

    def _spawn_workers(self) -> None:
        self._worker_tasks = []
        if self.transcription:
            worker = TranscribeWorker(
                self.transcription_queue, self.transcription, self.store,
                self._infer, self.metrics, self._alarm, self._router, self.sep,
            )
            worker._translation_backend = self.translation
            self._transcribe_worker = worker
            self._worker_tasks.append(
                asyncio.create_task(self._run_then_cascade(worker), name=worker.name)
            )
        if self.diarization:
            w = DiarizeWorker(self.diarization_queue, self.diarization, self.store)
            self._worker_tasks.append(asyncio.create_task(w.run(), name=w.name))
        if self.translation:
            w = TranslateWorker(
                self.translation_queue, self.translation, self.store, self._infer
            )
            self._worker_tasks.append(asyncio.create_task(w.run(), name=w.name))

    async def _run_then_cascade(self, worker: TranscribeWorker) -> None:
        await worker.run()
        if self.is_stopping:
            for q in (self.diarization_queue, self.translation_queue):
                if q:
                    await q.put(SENTINEL)

    async def create_tasks(self) -> AsyncGenerator[FrontData, None]:
        self._tasks = []
        if not self.is_pcm_input:
            if not await self.ffmpeg_manager.start():

                async def error_only():
                    yield FrontData(
                        status="error",
                        error="FFmpeg failed to start. Please check that FFmpeg is installed.",
                    )

                return error_only()
            self._tasks.append(
                asyncio.create_task(self._read_ffmpeg_stdout(), name="ffmpeg_reader")
            )

        self._spawn_workers()
        self._tasks.extend(self._worker_tasks)
        self._tasks.append(asyncio.create_task(self._watch_tasks(list(self._tasks))))
        return self._render_loop()

    async def _watch_tasks(self, watched: List[asyncio.Task]) -> None:
        """Log any worker that dies with an exception (failure detection)."""
        pending = [t for t in watched if t]
        while pending:
            try:
                await asyncio.sleep(10)
                for t in list(pending):
                    if t.done():
                        pending.remove(t)
                        exc = t.exception()
                        if exc:
                            logger.error("%s unexpectedly died: %s", t.get_name(), exc)
            except asyncio.CancelledError:
                return
            except Exception as e:
                logger.error("Error in watchdog task: %s", e, exc_info=True)

    def _pipeline_drained(self) -> bool:
        return all(t.done() for t in self._tasks[:-1])  # all but the watchdog

    async def cleanup(self) -> None:
        logger.info("Starting AudioProcessor cleanup.")
        self.is_stopping = True
        for t in self._tasks:
            if not t.done():
                t.cancel()
        if self._tasks:
            await asyncio.gather(*self._tasks, return_exceptions=True)
        if self.ffmpeg_manager:
            try:
                await self.ffmpeg_manager.stop()
            except Exception as e:
                logger.warning("Error stopping FFmpeg manager: %s", e)
        if self.diarization:
            self.diarization.close()
        if self.transcription and hasattr(self.transcription, "close"):
            self.transcription.close()
        if self.ingest.vad is not None and hasattr(self.ingest.vad, "close"):
            self.ingest.vad.close()
        self.metrics.total_audio_duration_s = self.ingest.seconds
        self.metrics.log_summary()
        if getattr(self, "_session_slot_held", False):
            self._session_slot_held = False
            self.engine.release_session()
        logger.info("AudioProcessor cleanup complete.")

    # ------------------------------------------------------------------
    # Output side: FrontData rendering
    # ------------------------------------------------------------------

    def _compose_frontdata(self, state: State, lines, diar_buf: str, trans_buf: str) -> FrontData:
        buffer_text = (
            state.buffer_transcription.text if state.buffer_transcription else ""
        )
        empty = not lines and not buffer_text and not diar_buf
        return FrontData(
            status="no_audio_detected" if empty else "active_transcription",
            lines=lines,
            buffer_transcription=buffer_text,
            buffer_diarization=diar_buf,
            buffer_translation=trans_buf,
            remaining_time_transcription=state.remaining_time_transcription,
            remaining_time_transcription_processing=state.remaining_time_transcription_processing,
            remaining_time_transcription_policy=state.remaining_time_transcription_policy,
            remaining_time_diarization=(
                state.remaining_time_diarization if self.args.diarization else 0
            ),
        )

    async def _render_loop(self) -> AsyncGenerator[FrontData, None]:
        """50 ms cadence: drain staging buffers → align → emit on change."""
        while True:
            try:
                if self._ffmpeg_error:
                    yield FrontData(status="error", error=f"FFmpeg error: {self._ffmpeg_error}")
                    self._ffmpeg_error = None
                    await asyncio.sleep(1)
                    continue

                self.tokens_alignment.update()
                lines, diar_buf, trans_buf = self.tokens_alignment.get_lines(
                    diarization=self.args.diarization,
                    translation=bool(self.translation),
                    current_silence=self.silence_gate.current,
                    audio_time=self.ingest.seconds,
                )
                state = await self.store.snapshot(
                    audio_seconds=self.ingest.seconds,
                    beg_loop=self.beg_loop,
                    transcription_enabled=getattr(self.args, "transcription", True),
                )
                response = self._compose_frontdata(state, lines, diar_buf, trans_buf)
                if response != self.last_response_content:
                    self.metrics.n_responses_sent += 1
                    yield response
                    self.last_response_content = response

                if self.is_stopping and self._pipeline_drained():
                    logger.info("Results formatter: all processors done; terminating.")
                    return
                await asyncio.sleep(0.05)
            except Exception:
                logger.warning("Exception in results_formatter: %s", traceback.format_exc())
                await asyncio.sleep(0.5)

    # kept under its reference name for integrators
    results_formatter = _render_loop
