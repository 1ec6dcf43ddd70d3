"""Per-session runtime metrics (reference metrics_collector.py:16-83 parity).

Zero-dependency counters; logged as one structured SESSION_METRICS line on
cleanup and queryable by the harness/diagnose surfaces.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List

logger = logging.getLogger(__name__)


@dataclass
class SessionMetrics:
    session_start: float = 0.0
    total_audio_duration_s: float = 0.0
    total_processing_time_s: float = 0.0

    n_chunks_received: int = 0
    n_transcription_calls: int = 0
    n_tokens_produced: int = 0
    n_responses_sent: int = 0

    transcription_durations: List[float] = field(default_factory=list)

    n_silence_events: int = 0
    total_silence_duration_s: float = 0.0

    @property
    def rtf(self) -> float:
        if self.total_audio_duration_s <= 0:
            return 0.0
        total = self.total_processing_time_s or sum(self.transcription_durations)
        return total / self.total_audio_duration_s

    @property
    def avg_latency_ms(self) -> float:
        if not self.transcription_durations:
            return 0.0
        return 1000 * sum(self.transcription_durations) / len(self.transcription_durations)

    @property
    def p95_latency_ms(self) -> float:
        if not self.transcription_durations:
            return 0.0
        d = sorted(self.transcription_durations)
        return 1000 * d[min(int(len(d) * 0.95), len(d) - 1)]

    def to_dict(self) -> Dict:
        return {
            "session_start": self.session_start,
            "total_audio_duration_s": round(self.total_audio_duration_s, 3),
            "total_processing_time_s": round(
                self.total_processing_time_s or sum(self.transcription_durations), 3
            ),
            "rtf": round(self.rtf, 3),
            "n_chunks_received": self.n_chunks_received,
            "n_transcription_calls": self.n_transcription_calls,
            "n_tokens_produced": self.n_tokens_produced,
            "n_responses_sent": self.n_responses_sent,
            "avg_latency_ms": round(self.avg_latency_ms, 2),
            "p95_latency_ms": round(self.p95_latency_ms, 2),
            "n_silence_events": self.n_silence_events,
            "total_silence_duration_s": round(self.total_silence_duration_s, 3),
        }

    def log_summary(self) -> None:
        d = self.to_dict()
        d["session_elapsed_s"] = (
            round(time.time() - self.session_start, 3) if self.session_start else 0
        )
        logger.info("SESSION_METRICS %s", d)
