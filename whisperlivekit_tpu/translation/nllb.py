"""NLLB-600M/1.3B in JAX (in-process simultaneous translation) — loader.

Requires HF NLLB weights on disk (facebook/nllb-200-distilled-600M). The
encoder-decoder forward will share the transformer primitives in
models/whisper/model.py; weight conversion lands with `wlk pull nllb`.
"""

from __future__ import annotations


def load_nllb(config):
    raise NotImplementedError(
        "in-process NLLB requires downloaded weights; run `wlk pull nllb` "
        "with network access (planned), or use translation_backend=alignatt"
    )


class NLLBOnlineTranslation:  # pragma: no cover - constructed only after load_nllb
    def __init__(self, model, src: str, tgt: str):
        raise NotImplementedError
