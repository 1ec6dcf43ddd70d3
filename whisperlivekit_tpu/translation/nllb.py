"""NLLB loader + online simultaneous-translation session.

Replaces the reference's external `nllw` in-process backend (reference
core.py:261-289, translation.py:18-47). Weights load from an HF NLLB
checkpoint directory (M2M100 state dict → stacked pytree); the session
implements the translation contract consumed by the pipeline
(insert_tokens / process / validate_buffer_and_reset / insert_silence,
reference audio_processor.py:675-708): source tokens buffer up, every
process() re-translates the open segment as the draft, and punctuation
closes segments into committed Translations.
"""

from __future__ import annotations

import json
import logging
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..timed import ASRToken, TimedText, Translation
from . import nllb_model as nm

logger = logging.getLogger(__name__)

# FLORES-200 language codes for the languages whisper emits, used to form
# NLLB language tokens (public NLLB data; extend as needed).
FLORES = {
    "en": "eng_Latn", "fr": "fra_Latn", "de": "deu_Latn", "es": "spa_Latn",
    "it": "ita_Latn", "pt": "por_Latn", "nl": "nld_Latn", "pl": "pol_Latn",
    "ru": "rus_Cyrl", "uk": "ukr_Cyrl", "zh": "zho_Hans", "ja": "jpn_Jpan",
    "ko": "kor_Hang", "ar": "arb_Arab", "tr": "tur_Latn", "hi": "hin_Deva",
    "vi": "vie_Latn", "id": "ind_Latn", "th": "tha_Thai", "sv": "swe_Latn",
    "da": "dan_Latn", "no": "nob_Latn", "fi": "fin_Latn", "cs": "ces_Latn",
    "ro": "ron_Latn", "hu": "hun_Latn", "el": "ell_Grek", "he": "heb_Hebr",
    "bg": "bul_Cyrl", "ca": "cat_Latn", "fa": "pes_Arab", "ur": "urd_Arab",
}


def _nllb_language_code(lang: str) -> str:
    """whisper code or FLORES code → FLORES code (reference core.py
    `_nllw_language_code` role)."""
    if "_" in lang:
        return lang
    code = FLORES.get(lang.lower())
    if code is None:
        raise ValueError(f"no FLORES mapping for language {lang!r}")
    return code


# ---------------------------------------------------------------------------
# Weight conversion (HF M2M100 → stacked pytree)
# ---------------------------------------------------------------------------


def convert_hf_state_dict(sd: Dict[str, np.ndarray], dims: nm.NLLBDims, dtype=jnp.float32):
    def lin(prefix):
        return {
            "w": jnp.asarray(sd[f"{prefix}.weight"].T, dtype),
            "b": jnp.asarray(sd[f"{prefix}.bias"], dtype),
        }

    def ln(prefix):
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{prefix}.bias"], dtype),
        }

    def attn(prefix):
        return {
            "q": lin(f"{prefix}.q_proj"),
            "k": lin(f"{prefix}.k_proj"),
            "v": lin(f"{prefix}.v_proj"),
            "o": lin(f"{prefix}.out_proj"),
        }

    def layer(prefix, cross):
        p = {
            "attn_ln": ln(f"{prefix}.self_attn_layer_norm"),
            "attn": attn(f"{prefix}.self_attn"),
            "ffn_ln": ln(f"{prefix}.final_layer_norm"),
            "fc1": lin(f"{prefix}.fc1"),
            "fc2": lin(f"{prefix}.fc2"),
        }
        if cross:
            p["cross_ln"] = ln(f"{prefix}.encoder_attn_layer_norm")
            p["cross"] = attn(f"{prefix}.encoder_attn")
        return p

    def stack(items):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *items)

    emb_key = "model.shared.weight" if "model.shared.weight" in sd else "shared.weight"
    return {
        "emb": jnp.asarray(sd[emb_key], dtype),
        "encoder": {
            "blocks": stack(
                [layer(f"model.encoder.layers.{i}", False) for i in range(dims.encoder_layers)]
            ),
            "ln": ln("model.encoder.layer_norm"),
        },
        "decoder": {
            "blocks": stack(
                [layer(f"model.decoder.layers.{i}", True) for i in range(dims.decoder_layers)]
            ),
            "ln": ln("model.decoder.layer_norm"),
        },
    }


def dims_from_hf_config(cfg: dict) -> nm.NLLBDims:
    return nm.NLLBDims(
        vocab_size=cfg["vocab_size"],
        d_model=cfg["d_model"],
        encoder_layers=cfg["encoder_layers"],
        decoder_layers=cfg["decoder_layers"],
        heads=cfg["encoder_attention_heads"],
        ffn_dim=cfg["encoder_ffn_dim"],
        max_positions=cfg.get("max_position_embeddings", 1024),
        pad_token_id=cfg.get("pad_token_id", 1),
    )


class NLLBModel:
    """Loaded model + tokenizer + compiled translate."""

    def __init__(self, params, dims: nm.NLLBDims, tokenizer):
        self.params = params
        self.dims = dims
        self.tokenizer = tokenizer  # HF fast tokenizer
        self.eos = 2
        self.max_src = 256

    def translate(self, text: str, src: str, tgt: str, max_len: int = 128) -> str:
        if not text.strip():
            return ""
        src_code, tgt_code = _nllb_language_code(src), _nllb_language_code(tgt)
        ids = self.tokenizer.encode(text).ids if hasattr(self.tokenizer, "encode") else None
        if ids is None:
            return ""
        src_lang_id = self._lang_id(src_code)
        tgt_lang_id = self._lang_id(tgt_code)
        tokens = [src_lang_id] + ids[: self.max_src - 2] + [self.eos]
        S = 1 << max(4, (len(tokens) - 1).bit_length())  # pad bucket
        src_tokens = np.full((1, S), self.dims.pad_token_id, np.int32)
        src_tokens[0, : len(tokens)] = tokens
        src_mask = np.zeros((1, S), bool)
        src_mask[0, : len(tokens)] = True

        out = nm.greedy_translate(
            self.params,
            jnp.asarray(src_tokens),
            jnp.asarray(src_mask),
            jnp.asarray([tgt_lang_id], jnp.int32),
            self.eos,
            self.dims,
            max_len,
        )
        out = [int(t) for t in np.asarray(out[0])]
        out = [t for t in out[1:] if t != self.eos]  # drop forced lang token + eos
        return self.tokenizer.decode(out)

    def _lang_id(self, flores_code: str) -> int:
        tok = self.tokenizer.token_to_id(flores_code)
        if tok is None:
            raise ValueError(f"tokenizer lacks language token {flores_code}")
        return tok


def load_nllb(config) -> NLLBModel:
    """Load from an HF checkpoint dir (config.model_cache_dir search or
    nllb_size-resolved HF cache)."""
    from ..models.whisper.load import _read_safetensors_dir

    size = getattr(config, "nllb_size", "600M")
    repo = nm.HF_NLLB_REPOS.get(size)
    path = None
    hub = Path.home() / ".cache" / "huggingface" / "hub"
    if repo:
        snaps = hub / f"models--{repo.replace('/', '--')}" / "snapshots"
        if snaps.exists():
            found = sorted(snaps.iterdir())
            path = found[-1] if found else None
    if path is None:
        raise FileNotFoundError(
            f"no local NLLB-{size} weights; run `wlk pull nllb` with network access"
        )
    cfg = json.loads((path / "config.json").read_text())
    dims = dims_from_hf_config(cfg)
    sd = _read_safetensors_dir(path)
    params = convert_hf_state_dict(sd, dims, dtype=jnp.bfloat16)
    from tokenizers import Tokenizer as HFTokenizer

    tokenizer = HFTokenizer.from_file(str(path / "tokenizer.json"))
    return NLLBModel(params, dims, tokenizer)


# ---------------------------------------------------------------------------
# Online session (pipeline contract)
# ---------------------------------------------------------------------------


_SENTENCE_END = re.compile(r"[.!?。！？]")


class NLLBOnlineTranslation:
    wants_hypothesis_tail = False

    def __init__(self, model: NLLBModel, src: str, tgt: str):
        self.model = model
        self.src, self.tgt = src, tgt
        self._pending: List[ASRToken] = []

    def insert_tokens(self, items) -> None:
        items = items if isinstance(items, list) else [items]
        for it in items:
            if isinstance(it, ASRToken):
                self._pending.append(it)

    def insert_silence(self, duration: float) -> None:
        pass

    def _source_text(self) -> str:
        return "".join(t.text or "" for t in self._pending)

    def _emit(self) -> Tuple[Optional[Translation], TimedText]:
        if not self._pending:
            return None, TimedText()
        text = self.model.translate(self._source_text(), self.src, self.tgt)
        tr = Translation(start=self._pending[0].start, end=self._pending[-1].end, text=text)
        self._pending = []
        return tr, TimedText()

    def process(self) -> Tuple[Optional[Translation], TimedText]:
        if any(t.has_punctuation() for t in self._pending):
            return self._emit()
        draft = self.model.translate(self._source_text(), self.src, self.tgt, max_len=64)
        return None, TimedText(text=draft)

    def validate_buffer_and_reset(self) -> Tuple[Optional[Translation], TimedText]:
        return self._emit()
