"""Simultaneous translation backends.

Session contract (reference translation_alignatt.py:129-181,
audio_processor.py:675-708): ``insert_tokens(items)``, ``process() ->
(Translation|None, TimedText)``, ``validate_buffer_and_reset()``,
``insert_silence(duration)``.

Backends:
- NLLB in-process (JAX encoder-decoder) — weights required, loader pending.
- AlignAtt MT sidecar over WebSocket (`translation_backend=alignatt`) —
  pure host code, see alignatt_client.py.
"""

from .base import load_translation_model  # noqa: F401
