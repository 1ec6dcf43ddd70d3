"""Translation model loading + session contract base.

The reference loads the external `nllw` package for in-process NLLB
(reference core.py:261-289) or connects to an AlignAtt MT sidecar.
Here: the sidecar client is native (host WebSocket code); the in-process
JAX NLLB backend loads HF NLLB weights when present.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

from ..timed import ASRToken, TimedText, Translation

logger = logging.getLogger(__name__)


class OnlineTranslationBase:
    """Per-session translation contract."""

    wants_hypothesis_tail = False

    def insert_tokens(self, items: List[ASRToken]) -> None:
        raise NotImplementedError

    def process(self) -> Tuple[Optional[Translation], TimedText]:
        raise NotImplementedError

    def validate_buffer_and_reset(self) -> Tuple[Optional[Translation], TimedText]:
        raise NotImplementedError

    def insert_silence(self, duration: float) -> None:
        raise NotImplementedError


class EchoTranslation(OnlineTranslationBase):
    """Degenerate pass-through used when no translation weights exist: emits
    the source text as the 'translation' at segment boundaries, so the full
    translation plumbing (queues, alignment attachment, wire fields) can run
    and be tested without NLLB weights."""

    def __init__(self, src: str, tgt: str):
        self.src, self.tgt = src, tgt
        self._pending: List[ASRToken] = []

    def insert_tokens(self, items) -> None:
        if isinstance(items, list):
            self._pending.extend(items)
        else:
            self._pending.append(items)

    def _emit(self) -> Tuple[Optional[Translation], TimedText]:
        if not self._pending:
            return None, TimedText()
        text = "".join(t.text or "" for t in self._pending if isinstance(t, ASRToken))
        tr = Translation(
            start=self._pending[0].start, end=self._pending[-1].end, text=text
        )
        self._pending = []
        return tr, TimedText()

    def process(self):
        # emit at punctuation boundaries, else keep buffering
        if any(t.has_punctuation() for t in self._pending if isinstance(t, ASRToken)):
            return self._emit()
        return None, TimedText(text="".join(t.text or "" for t in self._pending))

    def validate_buffer_and_reset(self):
        return self._emit()

    def insert_silence(self, duration: float) -> None:
        pass


class _SharedTranslationModel:
    def __init__(self, config):
        self.config = config
        self.backend = getattr(config, "translation_backend", "nllb")

    def new_session(self, src: str, tgt: str) -> OnlineTranslationBase:
        if self.backend == "alignatt":
            from .alignatt_client import AlignAttTranslationClient

            return AlignAttTranslationClient(self.config, src, tgt)
        try:
            from .nllb import NLLBOnlineTranslation, load_nllb

            model = load_nllb(self.config)
            return NLLBOnlineTranslation(model, src, tgt)
        except Exception as e:
            logger.warning("NLLB unavailable (%s); using echo translation", e)
            return EchoTranslation(src, tgt)


def load_translation_model(config) -> _SharedTranslationModel:
    return _SharedTranslationModel(config)
