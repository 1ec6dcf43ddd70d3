"""TokensAlignment: merge ASR tokens, diarization and translation into lines.

Behavioral parity with reference tokens_alignment.py:19-303 — punctuation
segmentation, speaker attribution by max time-overlap, silence segments
(speaker = -2), translation attachment by time containment, and retention
pruning (unlimited in mode=full, 300 s default in mode=diff; semantics spec
in reference docs/alignement_principles.md).
"""

from __future__ import annotations

import math
from dataclasses import replace
from time import time
from typing import Any, List, Optional, Tuple, Union

from ..timed import (
    ASRToken,
    PuncSegment,
    Segment,
    Silence,
    SilentSegment,
    SpeakerSegment,
    TimedText,
)

_DEFAULT_RETENTION_SECONDS = 300.0


def resolve_retention_seconds(requested: Optional[float], mode: str) -> float:
    """Explicit setting wins (≤0 = unlimited); otherwise full-mode clients get
    unlimited history, diff-mode clients the bounded default."""
    if requested is not None:
        return math.inf if float(requested) <= 0 else float(requested)
    return _DEFAULT_RETENTION_SECONDS if mode == "diff" else math.inf


class TokensAlignment:
    def __init__(
        self,
        state: Any,
        args: Any,
        sep: Optional[str],
        retention_seconds: Optional[float] = None,
    ) -> None:
        self.state = state
        self.diarization = getattr(args, "diarization", False)

        self.all_tokens: List[Union[ASRToken, Silence]] = []
        self.all_diarization_segments: List[SpeakerSegment] = []
        self.all_translation_segments: List[Any] = []

        self.new_tokens: List[Union[ASRToken, Silence]] = []
        self.new_diarization: List[SpeakerSegment] = []
        self.new_translation: List[Any] = []
        self.new_translation_buffer: Union[TimedText, str] = TimedText()
        self.new_tokens_buffer: List[Any] = []
        self.sep: str = sep if sep is not None else " "
        self.beg_loop: Optional[float] = None

        self.validated_segments: List[Segment] = []
        self.current_line_tokens: List[ASRToken] = []
        self.diarization_buffer: List[ASRToken] = []
        self.unvalidated_tokens: List[Any] = []

        self._retention_seconds: float = (
            retention_seconds if retention_seconds is not None else _DEFAULT_RETENTION_SECONDS
        )

    # ---- ingestion -----------------------------------------------------------

    def update(self) -> None:
        """Drain state.new_* staging buffers into the running context."""
        self.new_tokens, self.state.new_tokens = self.state.new_tokens, []
        self.new_diarization, self.state.new_diarization = self.state.new_diarization, []
        self.new_translation, self.state.new_translation = self.state.new_translation, []
        self.new_tokens_buffer, self.state.new_tokens_buffer = self.state.new_tokens_buffer, []

        self.all_tokens.extend(self.new_tokens)
        self.all_diarization_segments.extend(self.new_diarization)
        self.all_translation_segments.extend(self.new_translation)
        self.new_translation_buffer = self.state.new_translation_buffer

    # ---- pruning --------------------------------------------------------------

    def _prune(self) -> None:
        if not self.all_tokens or math.isinf(self._retention_seconds):
            return
        latest = self.all_tokens[-1].end
        cutoff = latest - self._retention_seconds
        if cutoff <= 0:
            return

        def prune(items: list) -> list:
            for i, item in enumerate(items):
                if item.end >= cutoff:
                    return items[i:] if i else items
            return []

        self.all_tokens = prune(self.all_tokens)
        self.all_diarization_segments = prune(self.all_diarization_segments)
        self.all_translation_segments = prune(self.all_translation_segments)
        self.validated_segments = prune(self.validated_segments)
        self.current_line_tokens = prune(self.current_line_tokens)
        self.unvalidated_tokens = prune(self.unvalidated_tokens)

    # ---- translation attach ------------------------------------------------------

    def add_translation(self, segment: Segment) -> None:
        if segment.translation is None:
            segment.translation = ""
        for ts in self.all_translation_segments:
            if ts.is_within(segment):
                if ts.text:
                    segment.translation += ts.text + self.sep
            elif segment.translation:
                break

    # ---- punctuation segmentation ---------------------------------------------

    def compute_punctuations_segments(self) -> List[PuncSegment]:
        segments: List[PuncSegment] = []
        start_idx = 0
        for i, token in enumerate(self.all_tokens):
            if token.is_silence():
                prev = PuncSegment.from_tokens(tokens=self.all_tokens[start_idx:i])
                if prev:
                    segments.append(prev)
                segments.append(PuncSegment.from_tokens(tokens=[token], is_silence=True))
                start_idx = i + 1
            elif token.has_punctuation():
                segments.append(
                    PuncSegment.from_tokens(tokens=self.all_tokens[start_idx : i + 1])
                )
                start_idx = i + 1
        final = PuncSegment.from_tokens(tokens=self.all_tokens[start_idx:])
        if final:
            segments.append(final)
        return segments

    # ---- diarization merge/attribution ---------------------------------------------

    def concatenate_diar_segments(self) -> List[SpeakerSegment]:
        """Merge same-speaker runs, on copies (in-place growth would corrupt
        the stored spans a little more on every refresh — reference
        tokens_alignment.py:188-195)."""
        if not self.all_diarization_segments:
            return []
        merged = [replace(self.all_diarization_segments[0])]
        for seg in self.all_diarization_segments[1:]:
            if seg.speaker == merged[-1].speaker:
                merged[-1].end = seg.end
            else:
                merged.append(replace(seg))
        return merged

    @staticmethod
    def intersection_duration(a: TimedText, b: TimedText) -> float:
        return max(0, min(a.end, b.end) - max(a.start, b.start))

    def get_lines_diarization(self) -> Tuple[List[Segment], str]:
        diarization_buffer = ""
        punc_segments = self.compute_punctuations_segments()
        diar_segments = self.concatenate_diar_segments()
        for ps in punc_segments:
            if ps.is_silence():
                continue
            if diar_segments and ps.start >= diar_segments[-1].end:
                diarization_buffer += ps.text
            else:
                max_overlap, best = 0.0, 1
                for ds in diar_segments:
                    overlap = self.intersection_duration(ps, ds)
                    if overlap > max_overlap:
                        max_overlap, best = overlap, ds.speaker + 1
                ps.speaker = best

        segments: List[Segment] = []
        if punc_segments:
            segments = [punc_segments[0]]
            for seg in punc_segments[1:]:
                if seg.speaker == segments[-1].speaker:
                    if segments[-1].text:
                        segments[-1].text += seg.text
                    segments[-1].end = seg.end
                else:
                    segments.append(seg)
        return segments, diarization_buffer

    # ---- main view --------------------------------------------------------------

    def get_lines(
        self,
        diarization: bool = False,
        translation: bool = False,
        current_silence: Optional[Silence] = None,
        audio_time: Optional[float] = None,
    ) -> Tuple[List[Segment], str, str]:
        # ongoing-silence end: audio-stream clock, not wall-clock
        if audio_time is not None:
            silence_now = audio_time
        else:
            silence_now = time() - self.beg_loop if self.beg_loop else 0.0

        if diarization:
            segments, diarization_buffer = self.get_lines_diarization()
        else:
            diarization_buffer = ""
            for token in self.new_tokens:
                if isinstance(token, Silence):
                    if self.current_line_tokens:
                        self.validated_segments.append(
                            Segment.from_tokens(self.current_line_tokens)
                        )
                        self.current_line_tokens = []
                    end_silence = token.end if token.has_ended else silence_now
                    if self.validated_segments and self.validated_segments[-1].is_silence():
                        self.validated_segments[-1].end = end_silence
                    else:
                        self.validated_segments.append(
                            SilentSegment(start=token.start, end=end_silence)
                        )
                else:
                    self.current_line_tokens.append(token)

            segments = list(self.validated_segments)
            if self.current_line_tokens:
                segments.append(Segment.from_tokens(self.current_line_tokens))

        if current_silence:
            end_silence = current_silence.end if current_silence.has_ended else silence_now
            if segments and segments[-1].is_silence():
                segments[-1] = SilentSegment(start=segments[-1].start, end=end_silence)
            else:
                segments.append(SilentSegment(start=current_silence.start, end=end_silence))

        if translation:
            for seg in segments:
                if not seg.is_silence():
                    self.add_translation(seg)

        self._prune()
        buffer_translation = (
            self.new_translation_buffer.text
            if isinstance(self.new_translation_buffer, TimedText)
            else (self.new_translation_buffer or "")
        )
        return segments, diarization_buffer, buffer_translation
