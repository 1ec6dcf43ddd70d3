"""Speaker diarization backends.

Round-1 surface: the session-facing contract (``insert_audio_chunk``,
``async diarize() -> List[SpeakerSegment]``, ``insert_silence``, ``close``,
reference audio_processor.py:641-673) plus an energy-change heuristic
backend. The streaming Sortformer JAX port (reference
diarization/sortformer_backend.py) lands next round; its session state is
already shaped as a pytree in sortformer.py.
"""

from .energy import EnergyDiarization, load_diarization_model  # noqa: F401
