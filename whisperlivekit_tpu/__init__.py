"""whisperlivekit_tpu — TPU-native real-time streaming speech-to-text framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
QuentinFuxa/WhisperLiveKit: multi-session WebSocket streaming ASR with
AlignAtt (SimulStreaming) and LocalAgreement policies, VAD gating, speaker
diarization, simultaneous translation, and OpenAI/Deepgram-compatible APIs —
driven by a shared, jit-compiled, batched TPU engine.
"""

__version__ = "0.1.0"

from .config import WLKConfig, WhisperLiveKitConfig, parse_cors_origins  # noqa: F401
from .timed import (  # noqa: F401
    ASRToken,
    ChangeSpeaker,
    FrontData,
    HypothesisTail,
    Segment,
    Silence,
    SpeakerSegment,
    State,
    Transcript,
    Translation,
)
