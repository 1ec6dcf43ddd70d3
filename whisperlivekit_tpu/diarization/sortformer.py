"""Streaming Sortformer diarization in JAX — weight port pending.

The reference runs NVIDIA diar_streaming_sortformer_4spk-v2 through NeMo
(reference diarization/sortformer_backend.py:50-128). The JAX port requires
the NeMo checkpoint converted to a pytree; until `wlk pull` fetches it this
module raises and the energy backend serves as fallback.
"""

from __future__ import annotations


def load_sortformer(config):
    raise NotImplementedError(
        "streaming Sortformer JAX port requires converted NeMo weights; "
        "run `wlk pull sortformer` with network access (planned)"
    )
