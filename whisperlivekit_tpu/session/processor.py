"""AudioProcessor: per-connection asyncio pipeline.

Behavioral parity with reference audio_processor.py:54-1001 — PCM framing,
VAC event segmentation with sample-precise silence accounting, fan-out to
transcription/diarization/translation asyncio queues (one task each), lag
watermarks, silent-backend watchdog, results formatter, watchdog, cleanup.

The compute behind ``process_iter`` is the shared TPU engine; this module is
pure host asyncio orchestration.
"""

from __future__ import annotations

import asyncio
import logging
import traceback
from time import time
from typing import Any, AsyncGenerator, List, Optional, Union

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
MIN_DURATION_REAL_SILENCE = 5.0  # reference audio_processor.py:26


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
    """Wait for one item, then greedily concat contiguous PCM chunks
    (reference audio_processor.py:28-52)."""
    item = await queue.get()
    if item is SENTINEL or not isinstance(item, np.ndarray):
        return item
    chunks = [item]
    while True:
        try:
            nxt = queue.get_nowait()
        except asyncio.QueueEmpty:
            break
        if isinstance(nxt, np.ndarray):
            chunks.append(nxt)
        else:
            # non-PCM item: put it back for the next round
            queue.put_nowait(nxt)
            break
    return np.concatenate(chunks) if len(chunks) > 1 else chunks[0]


class AudioProcessor:
    """One instance per connection/session."""

    def __init__(self, **kwargs: Any) -> None:
        session_language = kwargs.pop("language", None)
        session_mode = kwargs.pop("mode", "full")
        session_target_language = kwargs.pop("target_language", None)

        engine = kwargs.pop("transcription_engine", None)
        if not isinstance(engine, TranscriptionEngine):
            engine = TranscriptionEngine(**kwargs)
        self.engine = engine

        self.args = engine.args
        self.sample_rate = 16000
        self.channels = 1
        chunk_seconds = self.args.vac_chunk_size if self.args.vac else self.args.min_chunk_size
        self.samples_per_sec = int(self.sample_rate * chunk_seconds)
        self.bytes_per_sample = 2
        self.bytes_per_sec = self.samples_per_sec * self.bytes_per_sample
        self.max_bytes_per_sec = 32000 * 5
        self.is_pcm_input = self.args.pcm_input

        self.is_stopping = False
        self.current_silence: Optional[Silence] = None
        self.state = State()
        self.lock = asyncio.Lock()
        self.sep = " "
        self.last_response_content = FrontData()
        self.beg_loop: Optional[float] = None

        self.tokens_alignment = TokensAlignment(
            self.state,
            self.args,
            self.sep,
            retention_seconds=resolve_retention_seconds(
                getattr(self.args, "retention_seconds", None), session_mode
            ),
        )

        self.vac = None
        self._vac_async = False
        if self.args.vac:
            if getattr(engine, "vad_scheduler", None) is not None:
                from ..audio.vad_batched import AsyncFixedVADIterator

                self.vac = AsyncFixedVADIterator(engine.vad_scheduler)
                self._vac_async = True
            elif engine.vac_model is not None:
                # per-session VAD state; the frame model clones its own state
                self.vac = FixedVADIterator(engine.vac_model.new_session())

        self.ffmpeg_manager: Optional[FFmpegManager] = None
        self.ffmpeg_reader_task: Optional[asyncio.Task] = None
        self._ffmpeg_error: Optional[str] = None
        if not self.is_pcm_input:
            self.ffmpeg_manager = FFmpegManager(self.sample_rate, self.channels)

            async def on_ffmpeg_error(error_type: str):
                logger.error("FFmpeg error: %s", error_type)
                self._ffmpeg_error = error_type

            self.ffmpeg_manager.on_error_callback = on_ffmpeg_error

        self.transcription_queue = asyncio.Queue() if self.args.transcription else None
        self.diarization_queue = asyncio.Queue() if self.args.diarization else None
        self.translation_queue = asyncio.Queue() if self.args.target_language else None
        self.pcm_buffer = bytearray()
        self.total_pcm_samples = 0
        self.transcription_task: Optional[asyncio.Task] = None
        self.diarization_task: Optional[asyncio.Task] = None
        self.translation_task: Optional[asyncio.Task] = None
        self.watchdog_task: Optional[asyncio.Task] = None
        self.all_tasks_for_cleanup: List[asyncio.Task] = []
        self.metrics = SessionMetrics()

        self.transcription = None
        self.diarization = None
        self.translation = None
        if self.args.transcription and engine.asr is not None:
            self.transcription = online_factory(
                self.args,
                engine.asr,
                language=session_language,
                scheduler=getattr(engine, "scheduler", None),
            )
            self.sep = engine.asr.sep
            self.tokens_alignment.sep = self.sep
        if self.args.diarization and engine.diarization_model is not None:
            self.diarization = online_diarization_factory(self.args, engine.diarization_model)
        if engine.translation_model is not None:
            if session_target_language and session_target_language != self.args.target_language:
                self.translation = session_translation_factory(
                    self.args, engine.translation_model, session_target_language
                )
            else:
                self.translation = online_translation_factory(self.args, engine.translation_model)
        elif session_target_language:
            logger.warning(
                "Session requested target_language=%r but server started without "
                "translation; ignoring.",
                session_target_language,
            )

        self.translate_on_complete = bool(getattr(self.args, "translate_on_complete", False))
        self._pending_translation_tokens: List[ASRToken] = []

        self._any_asr_output = False
        self._silent_backend_warned = False
        self._inline_inference = _inline_inference_default()

    async def _infer(self, fn, *args):
        """Run an inference callable: the scheduler's async variant when the
        processor exposes one (``<name>_async``), else inline or in a worker
        thread per the platform threading policy."""
        owner = getattr(fn, "__self__", None)
        async_fn = getattr(owner, fn.__name__ + "_async", None) if owner else None
        if async_fn is not None:
            return await async_fn(*args)
        if self._inline_inference:
            return fn(*args)
        return await asyncio.to_thread(fn, *args)

    # ------------------------------------------------------------------
    # Translation queueing (incl. translate-on-complete, reference :175-246)
    # ------------------------------------------------------------------

    async def _queue_tokens_for_translation(self, tokens: List[ASRToken]) -> None:
        if not self.translation_queue or not tokens:
            return
        if not self.translate_on_complete:
            for token in tokens:
                await self.translation_queue.put(token)
            return
        self._pending_translation_tokens.extend(tokens)
        last_punc = -1
        for i, token in enumerate(self._pending_translation_tokens):
            if token.has_punctuation():
                last_punc = i
        if last_punc >= 0:
            for token in self._pending_translation_tokens[: last_punc + 1]:
                await self.translation_queue.put(token)
            self._pending_translation_tokens = self._pending_translation_tokens[last_punc + 1 :]

    async def _flush_pending_translation_tokens(self) -> None:
        if self.translation_queue and self._pending_translation_tokens:
            for token in self._pending_translation_tokens:
                await self.translation_queue.put(token)
            self._pending_translation_tokens = []

    async def _queue_hypothesis_tail_for_translation(self, buffer_transcript) -> None:
        if not self.translation_queue or self.translation is None:
            return
        if not getattr(self.translation, "wants_hypothesis_tail", False):
            return
        text = (buffer_transcript.text or "").strip() if buffer_transcript else ""
        if not text:
            return
        await self.translation_queue.put(
            HypothesisTail(start=buffer_transcript.start, end=buffer_transcript.end, text=text)
        )

    # ------------------------------------------------------------------
    # Silent-backend watchdog (reference :198-220)
    # ------------------------------------------------------------------

    _SILENT_BACKEND_WARN_SECONDS = 20.0

    def _warn_if_backend_silent(self, audio_seconds: float) -> None:
        if self._silent_backend_warned or self._any_asr_output:
            return
        if audio_seconds < self._SILENT_BACKEND_WARN_SECONDS:
            return
        self._silent_backend_warned = True
        logger.error(
            "ASR backend produced no output after %.0f s of audio. The backend is "
            "likely failing on every chunk; check earlier warnings for the root cause.",
            audio_seconds,
        )

    # ------------------------------------------------------------------
    # Silence events (sample-precise, reference :248-305)
    # ------------------------------------------------------------------

    async def _push_silence_event(self) -> None:
        if self.transcription_queue:
            await self.transcription_queue.put(self.current_silence)
        if self.args.diarization and self.diarization_queue:
            await self.diarization_queue.put(self.current_silence)
        if self.translation_queue:
            await self._flush_pending_translation_tokens()
            await self.translation_queue.put(self.current_silence)

    async def _begin_silence(self, at_sample: Optional[int] = None) -> None:
        if self.current_silence:
            return
        audio_t = (
            at_sample if at_sample is not None else self.total_pcm_samples
        ) / self.sample_rate
        self.current_silence = Silence(is_starting=True, start=audio_t)
        start_event = Silence(is_starting=True, start=audio_t)
        if self.transcription_queue:
            await self.transcription_queue.put(start_event)
        if self.args.diarization and self.diarization_queue:
            await self.diarization_queue.put(start_event)
        if self.translation_queue:
            await self._flush_pending_translation_tokens()
            await self.translation_queue.put(start_event)

    async def _end_silence(self, at_sample: Optional[int] = None) -> None:
        if not self.current_silence:
            return
        audio_t = (
            at_sample if at_sample is not None else self.total_pcm_samples
        ) / self.sample_rate
        self.current_silence.end = audio_t
        self.current_silence.is_starting = False
        self.current_silence.has_ended = True
        self.current_silence.compute_duration()
        self.metrics.n_silence_events += 1
        if self.current_silence.duration is not None:
            self.metrics.total_silence_duration_s += self.current_silence.duration
        if self.current_silence.duration and self.current_silence.duration > MIN_DURATION_REAL_SILENCE:
            self.state.new_tokens.append(self.current_silence)
        await self._push_silence_event()
        self.current_silence = None

    async def _enqueue_active_audio(self, pcm_chunk: np.ndarray) -> None:
        if pcm_chunk is None or pcm_chunk.size == 0:
            return
        if self.transcription_queue:
            await self.transcription_queue.put(pcm_chunk.copy())
        if self.args.diarization and self.diarization_queue:
            await self.diarization_queue.put(pcm_chunk.copy())

    # ------------------------------------------------------------------
    # State / lag watermarks (reference :316-369)
    # ------------------------------------------------------------------

    @staticmethod
    def convert_pcm_to_float(pcm_buffer: Union[bytes, bytearray]) -> np.ndarray:
        from .. import native

        return native.s16le_to_f32(bytes(pcm_buffer))

    def _latest_committed_transcription_end(self) -> float:
        latest = self.state.end_transcription_committed
        if self.state.tokens:
            latest = max(latest, self.state.tokens[-1].end or 0.0)
        return latest

    async def get_current_state(self) -> State:
        async with self.lock:
            current_time = time()
            remaining_transcription = 0.0
            if self.state.end_buffer > 0 and self.beg_loop:
                remaining_transcription = max(
                    0, round(current_time - self.beg_loop - self.state.end_buffer, 1)
                )
            remaining_diarization = 0.0
            if self.state.tokens:
                latest_end = max(self.state.end_buffer, self.state.tokens[-1].end or 0)
                remaining_diarization = max(
                    0, round(latest_end - self.state.end_attributed_speaker, 1)
                )
            self.state.remaining_time_transcription = remaining_transcription
            self.state.remaining_time_diarization = remaining_diarization

            if getattr(self.args, "transcription", True):
                audio_received_end = self.total_pcm_samples / self.sample_rate
                processed_end = max(0.0, self.state.end_transcription_processed)
                committed_end = self._latest_committed_transcription_end()
                self.state.end_transcription_committed = committed_end
                self.state.remaining_time_transcription_processing = max(
                    0.0, round(audio_received_end - processed_end, 1)
                )
                self.state.remaining_time_transcription_policy = max(
                    0.0, round(processed_end - committed_end, 1)
                )
            else:
                self.state.remaining_time_transcription_processing = 0.0
                self.state.remaining_time_transcription_policy = 0.0
            return self.state

    def _prune_state_tokens(self) -> None:
        if not self.state.tokens:
            return
        retention = getattr(self.tokens_alignment, "_retention_seconds", 300.0)
        latest_end = max(self.state.end_buffer, self.state.tokens[-1].end)
        cutoff = latest_end - retention
        if cutoff <= 0:
            return
        for idx, token in enumerate(self.state.tokens):
            if token.end >= cutoff:
                if idx:
                    self.state.tokens = self.state.tokens[idx:]
                return
        self.state.tokens = self.state.tokens[-1:]

    # ------------------------------------------------------------------
    # FFmpeg reader (reference :371-431)
    # ------------------------------------------------------------------

    async def ffmpeg_stdout_reader(self) -> None:
        beg = time()
        cancelled = False
        while True:
            try:
                state = (
                    await self.ffmpeg_manager.get_state()
                    if self.ffmpeg_manager
                    else FFmpegState.STOPPED
                )
                if state == FFmpegState.FAILED:
                    logger.error("FFmpeg is in FAILED state, cannot read data")
                    break
                if state == FFmpegState.STOPPED:
                    break
                if state != FFmpegState.RUNNING:
                    await asyncio.sleep(0.1)
                    continue

                current_time = time()
                elapsed = max(0.0, current_time - beg)
                buffer_size = max(int(32000 * elapsed), 4096)
                beg = current_time

                chunk = await self.ffmpeg_manager.read_data(buffer_size)
                if chunk is None:
                    await asyncio.sleep(0.05)
                    continue
                if chunk == b"":
                    logger.info("FFmpeg stdout reached EOF.")
                    break
                self.pcm_buffer.extend(chunk)
                await self.handle_pcm_data()
            except asyncio.CancelledError:
                cancelled = True
                break
            except Exception as e:
                logger.warning("Exception in ffmpeg_stdout_reader: %s", e)
                await asyncio.sleep(0.2)

        if cancelled:
            return
        await self._flush_remaining_pcm()
        if self.ffmpeg_manager:
            await self.ffmpeg_manager.stop()
        await self._signal_input_complete()

    async def _signal_input_complete(self) -> None:
        if self.transcription_queue:
            await self.transcription_queue.put(SENTINEL)
            return
        if self.diarization_queue:
            await self.diarization_queue.put(SENTINEL)
        if self.translation_queue:
            await self.translation_queue.put(SENTINEL)

    # ------------------------------------------------------------------
    # Finish (reference :433-490)
    # ------------------------------------------------------------------

    async def _finish_transcription(self) -> None:
        if not self.transcription:
            return
        try:
            if hasattr(self.transcription, "finish"):
                final_tokens, end_time = await self._infer(self.transcription.finish)
            else:
                final_tokens, end_time = await self._infer(self.transcription.start_silence)
            final_tokens = final_tokens or []
            _buffer_transcript = self.transcription.get_buffer()
            if (
                not final_tokens
                and self.state.buffer_transcription
                and self.state.buffer_transcription.text
            ):
                pending = self.state.buffer_transcription
                text = pending.text.strip()
                if text:
                    start = pending.start if pending.start is not None else self.state.end_buffer
                    end = pending.end if pending.end is not None else end_time
                    if end is None or end < start:
                        end = start
                    final_tokens = [
                        ASRToken(
                            start=start,
                            end=end,
                            text=text,
                            detected_language=pending.detected_language,
                        )
                    ]
                    _buffer_transcript = Transcript()

            final_committed_end = final_tokens[-1].end if final_tokens else None
            async with self.lock:
                self.state.end_transcription_processed = max(
                    self.state.end_transcription_processed, end_time
                )
                if final_committed_end is not None:
                    self.state.end_transcription_committed = max(
                        self.state.end_transcription_committed, final_committed_end
                    )
            if final_tokens:
                self.metrics.n_tokens_produced += len(final_tokens)
                async with self.lock:
                    self.state.tokens.extend(final_tokens)
                    self.state.buffer_transcription = _buffer_transcript
                    self.state.end_buffer = max(self.state.end_buffer, end_time)
                    self.state.new_tokens.extend(final_tokens)
                    self.state.new_tokens_buffer = _buffer_transcript
                    self._prune_state_tokens()
                await self._queue_tokens_for_translation(final_tokens)
            await self._flush_pending_translation_tokens()
        except Exception as e:
            logger.warning("Error finishing transcription: %s", e)
            logger.debug(traceback.format_exc())

    # ------------------------------------------------------------------
    # Transcription consumer (reference :492-615)
    # ------------------------------------------------------------------

    async def transcription_processor(self) -> None:
        cumulative_pcm_duration_stream_time = 0.0
        while True:
            try:
                try:
                    item = await asyncio.wait_for(
                        get_all_from_queue(self.transcription_queue), timeout=0.5
                    )
                except asyncio.TimeoutError:
                    _buffer_transcript = self.transcription.get_buffer()
                    async with self.lock:
                        self.state.buffer_transcription = _buffer_transcript
                    continue

                if item is SENTINEL:
                    await self._finish_transcription()
                    break

                stream_time_end = cumulative_pcm_duration_stream_time
                new_tokens: List[ASRToken] = []
                current_audio_processed_upto = self.state.end_buffer

                if isinstance(item, Silence):
                    if item.is_starting:
                        new_tokens, current_audio_processed_upto = await self._infer(
                            self.transcription.start_silence
                        )
                    if item.has_ended:
                        cumulative_pcm_duration_stream_time += item.duration
                        current_audio_processed_upto = cumulative_pcm_duration_stream_time
                        self.transcription.end_silence(
                            item.duration,
                            self.state.tokens[-1].end if self.state.tokens else 0,
                        )
                    new_tokens = new_tokens or []
                    current_audio_processed_upto = max(
                        current_audio_processed_upto, stream_time_end
                    )
                elif isinstance(item, ChangeSpeaker):
                    self.transcription.new_speaker(item)
                    continue
                elif isinstance(item, np.ndarray):
                    cumulative_pcm_duration_stream_time += len(item) / self.sample_rate
                    stream_time_end = cumulative_pcm_duration_stream_time
                    self.transcription.insert_audio_chunk(item, stream_time_end)
                    _t0 = time()
                    new_tokens, current_audio_processed_upto = await self._infer(
                        self.transcription.process_iter
                    )
                    self.metrics.transcription_durations.append(time() - _t0)
                    self.metrics.n_transcription_calls += 1
                    new_tokens = new_tokens or []
                    self.metrics.n_tokens_produced += len(new_tokens)

                _buffer_transcript = self.transcription.get_buffer()
                buffer_text = _buffer_transcript.text

                if new_tokens:
                    validated_text = self.sep.join(t.text for t in new_tokens)
                    if buffer_text.startswith(validated_text):
                        _buffer_transcript.text = buffer_text[len(validated_text) :].lstrip()

                candidate_end_times = [self.state.end_buffer]
                if new_tokens:
                    candidate_end_times.append(new_tokens[-1].end)
                if _buffer_transcript.end is not None:
                    candidate_end_times.append(_buffer_transcript.end)
                candidate_end_times.append(current_audio_processed_upto)

                async with self.lock:
                    self.state.tokens.extend(new_tokens)
                    self.state.buffer_transcription = _buffer_transcript
                    self.state.end_buffer = max(candidate_end_times)
                    self.state.end_transcription_processed = max(
                        self.state.end_transcription_processed, current_audio_processed_upto
                    )
                    if new_tokens:
                        self.state.end_transcription_committed = max(
                            self.state.end_transcription_committed, new_tokens[-1].end or 0.0
                        )
                    self.state.new_tokens.extend(new_tokens)
                    self.state.new_tokens_buffer = _buffer_transcript
                    self._prune_state_tokens()

                if new_tokens or buffer_text.strip():
                    self._any_asr_output = True
                else:
                    self._warn_if_backend_silent(cumulative_pcm_duration_stream_time)

                await self._queue_tokens_for_translation(new_tokens)
                await self._queue_hypothesis_tail_for_translation(_buffer_transcript)
            except Exception as e:
                logger.warning("Exception in transcription_processor: %s", e)
                logger.warning(traceback.format_exc())

        if self.is_stopping:
            if self.diarization_queue:
                await self.diarization_queue.put(SENTINEL)
            if self.translation_queue:
                await self.translation_queue.put(SENTINEL)
        logger.info("Transcription processor task finished.")

    # ------------------------------------------------------------------
    # Diarization consumer (reference :617-673)
    # ------------------------------------------------------------------

    async def _update_diarization_state(self, segments) -> None:
        if not segments:
            return
        diar_end = max(getattr(s, "end", 0.0) for s in segments)
        async with self.lock:
            self.state.new_diarization.extend(segments)
            self.state.end_attributed_speaker = max(
                self.state.end_attributed_speaker, diar_end
            )

    async def _drain_diarization_buffer(self) -> None:
        while True:
            segments = await self.diarization.diarize()
            if not segments:
                break
            await self._update_diarization_state(segments)

    async def diarization_processor(self) -> None:
        has_buffer = hasattr(self.diarization, "buffer_audio")
        while True:
            try:
                item = await get_all_from_queue(self.diarization_queue)
                if item is SENTINEL:
                    break
                if isinstance(item, Silence):
                    if item.has_ended:
                        self.diarization.insert_silence(item.duration)
                    continue
                self.diarization.insert_audio_chunk(item)
                if has_buffer:
                    await self._drain_diarization_buffer()
                else:
                    segments = await self.diarization.diarize()
                    diar_end = max((getattr(s, "end", 0.0) for s in segments), default=0.0)
                    async with self.lock:
                        self.state.new_diarization = segments
                        self.state.end_attributed_speaker = max(
                            self.state.end_attributed_speaker, diar_end
                        )
            except Exception as e:
                logger.warning("Exception in diarization_processor: %s", e)
        if has_buffer:
            try:
                await self._drain_diarization_buffer()
            except Exception as e:
                logger.warning("Exception draining diarization buffer: %s", e)
        logger.info("Diarization processor task finished.")

    # ------------------------------------------------------------------
    # Translation consumer (reference :675-708)
    # ------------------------------------------------------------------

    async def translation_processor(self) -> None:
        while True:
            try:
                item = await get_all_from_queue(self.translation_queue)
                if item is SENTINEL:
                    break
                new_translation = None
                new_translation_buffer = None
                if isinstance(item, Silence):
                    if item.is_starting:
                        new_translation, new_translation_buffer = (
                            self.translation.validate_buffer_and_reset()
                        )
                    if item.has_ended:
                        self.translation.insert_silence(item.duration)
                        continue
                elif isinstance(item, ChangeSpeaker):
                    new_translation, new_translation_buffer = (
                        self.translation.validate_buffer_and_reset()
                    )
                else:
                    self.translation.insert_tokens(item)
                    new_translation, new_translation_buffer = await self._infer(
                        self.translation.process
                    )
                if new_translation is not None:
                    async with self.lock:
                        self.state.new_translation.append(new_translation)
                        self.state.new_translation_buffer = new_translation_buffer
            except Exception as e:
                logger.warning("Exception in translation_processor: %s", e)
        logger.info("Translation processor task finished.")

    # ------------------------------------------------------------------
    # Results formatter (reference :710-761)
    # ------------------------------------------------------------------

    async def results_formatter(self) -> AsyncGenerator[FrontData, None]:
        while True:
            try:
                if self._ffmpeg_error:
                    yield FrontData(status="error", error=f"FFmpeg error: {self._ffmpeg_error}")
                    self._ffmpeg_error = None
                    await asyncio.sleep(1)
                    continue

                self.tokens_alignment.update()
                lines, buffer_diarization_text, buffer_translation_text = (
                    self.tokens_alignment.get_lines(
                        diarization=self.args.diarization,
                        translation=bool(self.translation),
                        current_silence=self.current_silence,
                        audio_time=self.total_pcm_samples / self.sample_rate,
                    )
                )
                state = await self.get_current_state()
                buffer_transcription_text = (
                    state.buffer_transcription.text if state.buffer_transcription else ""
                )

                response_status = "active_transcription"
                if not lines and not buffer_transcription_text and not buffer_diarization_text:
                    response_status = "no_audio_detected"

                response = FrontData(
                    status=response_status,
                    lines=lines,
                    buffer_transcription=buffer_transcription_text,
                    buffer_diarization=buffer_diarization_text,
                    buffer_translation=buffer_translation_text,
                    remaining_time_transcription=state.remaining_time_transcription,
                    remaining_time_transcription_processing=state.remaining_time_transcription_processing,
                    remaining_time_transcription_policy=state.remaining_time_transcription_policy,
                    remaining_time_diarization=(
                        state.remaining_time_diarization if self.args.diarization else 0
                    ),
                )
                if response != self.last_response_content:
                    self.metrics.n_responses_sent += 1
                    yield response
                    self.last_response_content = response

                if self.is_stopping and self._processing_tasks_done():
                    logger.info("Results formatter: all processors done; terminating.")
                    return
                await asyncio.sleep(0.05)
            except Exception:
                logger.warning(
                    "Exception in results_formatter: %s", traceback.format_exc()
                )
                await asyncio.sleep(0.5)

    # ------------------------------------------------------------------
    # Task lifecycle (reference :763-860)
    # ------------------------------------------------------------------

    async def create_tasks(self) -> AsyncGenerator[FrontData, None]:
        self.all_tasks_for_cleanup = []
        watchdog_targets: List[asyncio.Task] = []

        if not self.is_pcm_input:
            success = await self.ffmpeg_manager.start()
            if not success:

                async def error_generator():
                    yield FrontData(
                        status="error",
                        error="FFmpeg failed to start. Please check that FFmpeg is installed.",
                    )

                return error_generator()
            self.ffmpeg_reader_task = asyncio.create_task(self.ffmpeg_stdout_reader())
            self.all_tasks_for_cleanup.append(self.ffmpeg_reader_task)
            watchdog_targets.append(self.ffmpeg_reader_task)

        if self.transcription:
            self.transcription_task = asyncio.create_task(self.transcription_processor())
            self.all_tasks_for_cleanup.append(self.transcription_task)
            watchdog_targets.append(self.transcription_task)
        if self.diarization:
            self.diarization_task = asyncio.create_task(self.diarization_processor())
            self.all_tasks_for_cleanup.append(self.diarization_task)
            watchdog_targets.append(self.diarization_task)
        if self.translation:
            self.translation_task = asyncio.create_task(self.translation_processor())
            self.all_tasks_for_cleanup.append(self.translation_task)
            watchdog_targets.append(self.translation_task)

        self.watchdog_task = asyncio.create_task(self.watchdog(watchdog_targets))
        self.all_tasks_for_cleanup.append(self.watchdog_task)
        return self.results_formatter()

    async def watchdog(self, tasks_to_monitor: List[asyncio.Task]) -> None:
        remaining = [t for t in tasks_to_monitor if t]
        while True:
            try:
                if not remaining:
                    return
                await asyncio.sleep(10)
                for task in list(remaining):
                    if task.done():
                        exc = task.exception()
                        name = task.get_name()
                        if exc:
                            logger.error("%s unexpectedly died: %s", name, exc)
                        remaining.remove(task)
            except asyncio.CancelledError:
                break
            except Exception as e:
                logger.error("Error in watchdog task: %s", e, exc_info=True)

    async def cleanup(self) -> None:
        logger.info("Starting AudioProcessor cleanup.")
        self.is_stopping = True
        for task in self.all_tasks_for_cleanup:
            if task and not task.done():
                task.cancel()
        created = [t for t in self.all_tasks_for_cleanup if t]
        if created:
            await asyncio.gather(*created, return_exceptions=True)
        if not self.is_pcm_input and self.ffmpeg_manager:
            try:
                await self.ffmpeg_manager.stop()
            except Exception as e:
                logger.warning("Error stopping FFmpeg manager: %s", e)
        if self.diarization:
            self.diarization.close()
        if self.transcription and hasattr(self.transcription, "close"):
            self.transcription.close()
        if self.vac is not None and hasattr(self.vac, "close"):
            self.vac.close()
        self.metrics.total_audio_duration_s = self.total_pcm_samples / self.sample_rate
        self.metrics.log_summary()
        logger.info("AudioProcessor cleanup complete.")

    def _processing_tasks_done(self) -> bool:
        tasks = [
            self.transcription_task,
            self.diarization_task,
            self.translation_task,
            self.ffmpeg_reader_task,
        ]
        return all(t.done() for t in tasks if t)

    # ------------------------------------------------------------------
    # Input (reference :862-982)
    # ------------------------------------------------------------------

    async def process_audio(self, message: Optional[bytes]) -> None:
        if not self.beg_loop:
            self.beg_loop = time()
            self.metrics.session_start = self.beg_loop
            self.current_silence = Silence(start=0.0, is_starting=True)
            self.tokens_alignment.beg_loop = self.beg_loop

        if not message:
            logger.info("Empty audio message received; stopping.")
            self.is_stopping = True
            if self.is_pcm_input:
                if self.pcm_buffer:
                    await self._flush_remaining_pcm()
                await self._signal_input_complete()
            elif self.ffmpeg_manager:
                await self.ffmpeg_manager.close_stdin()
            return

        if self.is_stopping:
            logger.warning("AudioProcessor is stopping. Ignoring incoming audio.")
            return

        self.metrics.n_chunks_received += 1
        if self.is_pcm_input:
            self.pcm_buffer.extend(message)
            await self.handle_pcm_data()
        else:
            if not self.ffmpeg_manager:
                logger.error("FFmpeg manager not initialized for non-PCM input.")
                return
            ok = await self.ffmpeg_manager.write_data(message)
            if not ok:
                state = await self.ffmpeg_manager.get_state()
                if state == FFmpegState.FAILED:
                    logger.error("FFmpeg is in FAILED state, cannot process audio")
                else:
                    logger.warning("Failed to write audio data to FFmpeg")

    async def handle_pcm_data(self) -> None:
        # Without VAC there is no detector to end the opening silence.
        if not self.args.vac and self.current_silence:
            await self._end_silence()

        if len(self.pcm_buffer) < self.bytes_per_sec:
            return
        if len(self.pcm_buffer) > self.max_bytes_per_sec:
            logger.warning(
                "Audio buffer too large: %.2fs; consider a smaller model.",
                len(self.pcm_buffer) / self.bytes_per_sec,
            )

        chunk_size = min(len(self.pcm_buffer), self.max_bytes_per_sec)
        aligned = (chunk_size // self.bytes_per_sample) * self.bytes_per_sample
        if aligned == 0:
            return
        pcm_array = self.convert_pcm_to_float(self.pcm_buffer[:aligned])
        self.pcm_buffer = self.pcm_buffer[aligned:]

        num_samples = len(pcm_array)
        chunk_sample_start = self.total_pcm_samples
        chunk_sample_end = chunk_sample_start + num_samples

        vad_events = []
        if self.args.vac and self.vac:
            if self._vac_async:
                vad_events = await self.vac(pcm_array) or []
            else:
                vad_events = self.vac(pcm_array) or []

        # Segment the chunk around VAD boundaries (sample-precise; clamped to
        # the chunk so active+silence durations sum exactly to stream time).
        last_offset = 0
        for event in vad_events:
            if "start" in event and self.current_silence:
                start_eff = max(chunk_sample_start, min(chunk_sample_end, int(event["start"])))
                await self._end_silence(at_sample=start_eff)
                last_offset = start_eff - chunk_sample_start
            if "end" in event and not self.current_silence:
                end_eff = max(chunk_sample_start, min(chunk_sample_end, int(event["end"])))
                end_offset = end_eff - chunk_sample_start
                if end_offset > last_offset:
                    await self._enqueue_active_audio(pcm_array[last_offset:end_offset])
                await self._begin_silence(at_sample=end_eff)
                last_offset = end_offset

        if not self.current_silence and last_offset < num_samples:
            await self._enqueue_active_audio(pcm_array[last_offset:])

        self.total_pcm_samples = chunk_sample_end

        if not self.args.transcription and not self.args.diarization:
            await asyncio.sleep(0.1)

    async def _flush_remaining_pcm(self) -> None:
        if not self.pcm_buffer:
            return
        aligned = (len(self.pcm_buffer) // self.bytes_per_sample) * self.bytes_per_sample
        if aligned == 0:
            return
        pcm_array = self.convert_pcm_to_float(self.pcm_buffer[:aligned])
        self.pcm_buffer = self.pcm_buffer[aligned:]
        if self.current_silence:
            await self._end_silence(at_sample=self.total_pcm_samples)
        self.total_pcm_samples += len(pcm_array)
        await self._enqueue_active_audio(pcm_array)
        logger.info(
            "Flushed remaining PCM buffer: %d samples (%.2fs)",
            len(pcm_array),
            len(pcm_array) / self.sample_rate,
        )
