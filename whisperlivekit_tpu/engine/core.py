"""TranscriptionEngine: the shared, load-once model state + per-session factories.

Reference parity: core.py:37-361 — thread-safe double-checked-lock singleton
holding the expensive state (Whisper params on TPU, VAD model, diarization,
translation), with ``online_factory`` / ``online_diarization_factory`` /
``online_translation_factory`` creating cheap per-session processors.

Weight resolution: real checkpoints via models.whisper.load (HF/OpenAI/LoRA);
``--model-path random`` (or a "random:<size>" model size) initializes random
weights with the catalog dimensions — the CI/bench path on hosts without
downloaded checkpoints (weights don't change compute speed).
"""

from __future__ import annotations

import logging
import threading
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import WLKConfig
from ..models.whisper import model as wm
from ..models.whisper.dims import MODEL_DIMS, ModelDimensions
from ..models.whisper.load import load_model
from ..models.whisper.tokenizer import get_tokenizer

logger = logging.getLogger(__name__)


class EngineAtCapacity(RuntimeError):
    """New session exceeds the chip's admission capacity.

    Raised by AudioProcessor construction when the engine already serves
    ``session_capacity()`` sessions. Servers translate this into an explicit
    "busy" rejection instead of admitting the session onto the full
    re-encode fallback path, which would degrade every live session
    (the cross-KV pool slots are the serving path at large models)."""


def _dtype_from_str(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[name]


def load_whisper_params(config: WLKConfig):
    """Resolve + load whisper weights per config. Returns (params, dims, name)."""
    dtype = _dtype_from_str(config.param_dtype)
    size = config.model_size
    path = config.model_path or config.model_dir

    if (path and str(path).startswith("random")) or size.startswith("random"):
        spec = size.split(":", 1)[-1] if ":" in size else ("base" if size.startswith("random") else size)
        if path and ":" in str(path):
            spec = str(path).split(":", 1)[1]
        dims = MODEL_DIMS.get(spec, MODEL_DIMS["base"])
        logger.warning("Initializing RANDOM weights (%s dims) — bench/CI mode", spec)
        params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=dtype)
        name = spec
    else:
        target = path or size
        params, dims, name = load_model(target, dtype=dtype, lora_path=config.lora_path,
                                        cache_dir=config.model_cache_dir)
    if getattr(config, "decoder_dtype", "bf16") == "f8":
        logger.info("Quantizing decoder block weights to f8_e4m3 (weight-only)")
        params = wm.quantize_decoder_f8(params)
    return params, dims, name


class SimulStreamingASR:
    """Backend holder for the AlignAtt policy (reference simul_whisper/backend.py:289-566)."""

    sep = ""

    def __init__(self, config: WLKConfig, params, dims: ModelDimensions, model_name):
        from ..streaming.alignatt import AlignAttConfig, AlignAttEngine

        self.config = config
        self.dims = dims
        language = config.lan if config.lan != "auto" else "auto"
        tok_lang = language if language != "auto" else "en"
        task = "translate" if config.direct_english_translation else "transcribe"
        self.tokenizer = get_tokenizer(
            dims.multilingual,
            num_languages=dims.num_languages,
            language=tok_lang if dims.multilingual else None,
            task=task if dims.multilingual else None,
        )
        align_pairs = None
        if config.custom_alignment_heads:
            idx = [int(x) for x in str(config.custom_alignment_heads).split(",") if x.strip()]
            align_pairs = [(i // dims.n_text_head, i % dims.n_text_head) for i in idx]
        self.cfg = AlignAttConfig(
            segment_length=config.min_chunk_size,
            frame_threshold=config.frame_threshold,
            audio_max_len=config.audio_max_len,
            audio_min_len=config.audio_min_len,
            language=language,
            task=task,
            decoder_type=config.decoder_type or ("beam" if config.beams > 1 else "greedy"),
            beam_size=config.beams,
            init_prompt=config.init_prompt,
            static_init_prompt=config.static_init_prompt,
            max_context_tokens=config.max_context_tokens,
            never_fire=config.never_fire,
            cif_ckpt_path=config.cif_ckpt_path,
            xkv_f8=getattr(config, "xkv_f8", False),
            xkv_cache={"on": True, "off": False}.get(
                getattr(config, "xkv_cache", "auto"), "auto"
            ),
            xkv_cache_dtype=getattr(config, "xkv_cache_dtype", "bf16"),
            anchor_cohorts=int(getattr(config, "xkv_anchor_cohorts", 1) or 1),
            max_steps=int(getattr(config, "max_decode_steps", 32) or 32),
            serving_prefix_cap=int(getattr(config, "serving_prefix_cap", 0) or 0),
            serving_commit_budget=int(
                getattr(config, "serving_commit_budget", 16)
            ),
        )
        self.engine = AlignAttEngine(
            params, dims, self.tokenizer, self.cfg, model_name=model_name,
            align_pairs=align_pairs,
        )


class LocalAgreementASR:
    """Backend holder for the LocalAgreement policy — wraps the batch decoder."""

    sep = " "

    def __init__(self, config: WLKConfig, params, dims: ModelDimensions, model_name):
        from ..decoding.task import WhisperDecoder
        from ..streaming.local_agreement import JAXWhisperASR

        self.config = config
        self.dims = dims
        self.decoder = WhisperDecoder(params, dims)
        self.asr = JAXWhisperASR(
            self.decoder,
            language=config.lan,
            model_name=model_name,
            buffer_trimming=config.buffer_trimming,
            buffer_trimming_sec=config.buffer_trimming_sec,
            confidence_validation=config.confidence_validation,
            beam_size=config.beams if config.beams > 1 else None,
        )


class CloudASRHolder(LocalAgreementASR):
    """Backend holder for the OpenAI-compatible cloud API (reference
    local_agreement/backends.py:222-287): LocalAgreement policy over a
    remote /v1/audio/transcriptions — no local weights at all."""

    def __init__(self, config: WLKConfig):
        from ..streaming.cloud_backend import CloudWhisperASR

        self.config = config
        self.dims = None
        self.decoder = None
        self.asr = CloudWhisperASR(
            language=config.lan,
            model_name=(
                config.model_size if config.model_size and not str(
                    config.model_size).startswith("random:") else "whisper-1"
            ),
            base_url=getattr(config, "openai_base_url", None),
        )
        if config.direct_english_translation:
            self.asr.direct_english_translation = True


class VoxtralHolder:
    """Backend holder for the Voxtral audio-LLM (windowed streaming)."""

    sep = ""

    def __init__(self, asr):
        self.asr = asr


class TranscriptionEngine:
    """Thread-safe singleton (reference core.py:37-79)."""

    _instance: Optional["TranscriptionEngine"] = None
    _lock = threading.Lock()

    def __new__(cls, *args, **kwargs):
        if cls._instance is None:
            with cls._lock:
                if cls._instance is None:
                    inst = super().__new__(cls)
                    inst._initialized = False
                    cls._instance = inst
        return cls._instance

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._instance = None

    def __init__(self, config: Optional[WLKConfig] = None, **kwargs):
        if self._initialized:
            return
        with self._lock:
            if self._initialized:
                return
            if config is None:
                config = WLKConfig.from_kwargs(**kwargs)
            self._do_init(config)
            self._initialized = True

    def _do_init(self, config: WLKConfig) -> None:
        from ..compile_cache import enable_compile_cache

        enable_compile_cache()
        self.config = config
        self.args = config  # reference exposes config as .args (core.py:97)
        self.asr: Any = None
        self.vac_model = None
        self.diarization_model = None
        self.translation_model = None
        self._active_sessions = 0
        self._session_lock = threading.Lock()

        self.scheduler = None
        if config.transcription and config.backend == "openai-api":
            self.asr = CloudASRHolder(config)
            logger.info("Loaded OpenAI-compatible cloud backend (LocalAgreement)")
        elif config.transcription and (config.backend or "").startswith("qwen3"):
            if getattr(config, "qwen3_audio_backend", "causal") == "windowed":
                logger.warning(
                    "qwen3 windowed re-encode mode is served by the causal "
                    "tower on this build (the windowed policy exists for "
                    "whisper backends via --backend-policy windowed); "
                    "continuing with causal"
                )
            from ..streaming.qwen3_causal import load_qwen3_causal

            self.asr = load_qwen3_causal(config)
            if config.scheduler:
                from ..streaming.qwen3_batch import CausalBatchService

                # pooled KV is ~100 MB/lane at 0.6b scale; cap the lane count
                self.scheduler = CausalBatchService(
                    self.asr, capacity=min(config.max_batch_sessions, 32)
                )
            logger.info("Loaded Qwen3-ASR causal backend (append-only tower)")
        elif config.transcription and (config.backend or "").startswith("voxtral"):
            if config.backend_policy in ("causal", "realtime"):
                from ..streaming.voxtral_realtime import load_voxtral_realtime

                self.asr = load_voxtral_realtime(config)
                if config.scheduler:
                    from ..streaming.qwen3_batch import CausalBatchService

                    self.scheduler = CausalBatchService(
                        self.asr, capacity=min(config.max_batch_sessions, 16)
                    )  # 4B-scale tower: larger per-lane KV
                logger.info("Loaded Voxtral realtime backend (causal streaming)")
            else:
                from ..models.voxtral_backend import VoxtralASR, load_voxtral

                params, vdims, tok = load_voxtral(config.model_path)
                self.asr = VoxtralHolder(
                    VoxtralASR(
                        params, vdims, tok,
                        buffer_trimming=config.buffer_trimming,
                        buffer_trimming_sec=config.buffer_trimming_sec,
                    )
                )
                logger.info("Loaded Voxtral backend (windowed streaming policy)")
        elif config.transcription:
            params, dims, name = load_whisper_params(config)
            if config.backend_policy in ("localagreement", "windowed"):
                self.asr = LocalAgreementASR(config, params, dims, name)
            else:
                self.asr = SimulStreamingASR(config, params, dims, name)
                if config.scheduler:
                    from .scheduler import BatchScheduler

                    self.scheduler = BatchScheduler(
                        self.asr.engine,
                        max_lanes=config.max_batch_sessions,
                        profile_dir=config.profile_dir,
                        incremental_encode=getattr(
                            config, "incremental_encode", True
                        ),
                    )
            logger.info(
                "Loaded whisper %s (%d-layer enc / %d-layer dec, %s) policy=%s",
                name, dims.n_audio_layer, dims.n_text_layer, config.param_dtype,
                config.backend_policy,
            )

        self.vad_scheduler = None
        if config.vac:
            if config.vad_backend == "jax-batched":
                try:
                    from ..audio.vad_batched import BatchedVADScheduler

                    self.vad_scheduler = BatchedVADScheduler(
                        max_lanes=4 * config.max_batch_sessions
                    )
                    logger.info("batched JAX VAD scheduler enabled")
                except Exception as e:
                    logger.warning("jax-batched VAD unavailable (%s); host VAD", e)
            if self.vad_scheduler is None:
                from ..audio.vad import load_vad_model

                self.vac_model = load_vad_model()

        if config.diarization:
            from ..diarization import load_diarization_model

            self.diarization_model = load_diarization_model(config)

        if config.target_language:
            from ..translation import load_translation_model

            self.translation_model = load_translation_model(config)

        if config.warmup_file:
            self.warmup(config.warmup_file)

    # ---- admission ---------------------------------------------------------

    def session_capacity(self) -> Optional[int]:
        """Max concurrent sessions this chip serves without degrading.

        ``config.max_sessions`` > 0 overrides; otherwise the pooled-slot
        count when the cross-KV pool is the serving path (sessions beyond
        it would run the full re-encode fallback every tick and poison the
        group cadence), else None (unbounded — scheduler rotation absorbs
        overload for the cheaper models)."""
        cap = int(getattr(getattr(self, "config", None), "max_sessions", 0) or 0)
        if cap > 0:
            return cap
        sched = getattr(self, "scheduler", None)
        xkv = getattr(sched, "xkv", None) if sched is not None else None
        if xkv is not None:
            return xkv.max_groups * xkv.group_width
        return None

    def _ensure_session_state(self) -> None:
        # test fakes stub _do_init; create the counters on first use
        if not hasattr(self, "_session_lock"):
            self._session_lock = threading.Lock()
            self._active_sessions = 0

    def acquire_session(self) -> None:
        self._ensure_session_state()
        cap = self.session_capacity()
        with self._session_lock:
            if cap is not None and self._active_sessions >= cap:
                raise EngineAtCapacity(
                    f"engine at capacity ({self._active_sessions}/{cap} sessions)"
                )
            self._active_sessions += 1

    def release_session(self) -> None:
        self._ensure_session_state()
        with self._session_lock:
            if self._active_sessions > 0:
                self._active_sessions -= 1

    @property
    def active_sessions(self) -> int:
        return getattr(self, "_active_sessions", 0)

    def warmup_synthetic(self) -> None:
        """Compile the streaming tick before the first session (fail-loud,
        reference warmup.py:51-61): one infer over synthetic audio so the
        first client never waits on XLA compilation."""
        import numpy as np

        if self.asr is None:
            return
        proc = online_factory(self.config, self.asr, scheduler=self.scheduler)
        audio = np.zeros(16000, np.float32)
        if getattr(proc, "process_iter_async", None) is not None and getattr(
            proc, "service", None
        ) is not None:
            # pooled causal path: compile the batched op programs when we own
            # the loop; inside a running loop (server startup) warm the
            # local-mode programs instead — still fail-loud, and the pooled
            # compile lands on the first session
            import asyncio

            async def _warm():
                proc.insert_audio_chunk(audio, 1.0)
                await proc.process_iter_async(is_last=True)
                proc.close()

            try:
                asyncio.get_running_loop()
            except RuntimeError:
                asyncio.run(_warm())
            else:
                local = online_factory(self.config, self.asr)
                if hasattr(local, "warmup"):
                    local.warmup(audio)  # causal: is_last pads a full block
                else:
                    local.insert_audio_chunk(audio, 1.0)
                    local.process_iter()
        elif hasattr(proc, "warmup"):
            proc.warmup(audio)
        else:
            proc.insert_audio_chunk(audio, 1.0)
            proc.process_iter()
        if hasattr(proc, "close"):
            proc.close()  # release pooled lanes/slots held by the warmup session
        logger.info("Engine warmup complete (streaming tick compiled)")

    def warmup(self, path: str) -> None:
        """One real inference at startup; raises if broken (reference
        warmup.py:51-61 fail-loud guard)."""
        import numpy as np

        from ..audio.io import load_audio

        audio = load_audio(path)[: 16000 * 5]
        proc = online_factory(self.config, self.asr)
        if hasattr(proc, "warmup"):
            proc.warmup(audio)
        else:
            proc.insert_audio_chunk(np.asarray(audio), len(audio) / 16000)
            proc.process_iter()
        logger.info("Warmup inference OK")


# ---------------------------------------------------------------------------
# Per-session factories (reference core.py:292-361)
# ---------------------------------------------------------------------------


def online_factory(config: WLKConfig, asr, language: Optional[str] = None, scheduler=None):
    from ..streaming.qwen3_causal import Qwen3CausalASR, Qwen3CausalProcessor
    from ..streaming.voxtral_realtime import VoxtralRealtimeASR, VoxtralRealtimeProcessor

    causal_service = None
    if scheduler is not None and hasattr(scheduler, "pools"):
        causal_service = scheduler  # CausalBatchService
    if isinstance(asr, VoxtralRealtimeASR):  # subclass: check before the base
        return VoxtralRealtimeProcessor(asr, service=causal_service)
    if isinstance(asr, Qwen3CausalASR):
        return Qwen3CausalProcessor(asr, service=causal_service)
    if isinstance(asr, VoxtralHolder):
        from ..streaming.windowed import WindowedStreamingProcessor

        return WindowedStreamingProcessor(asr.asr)
    if isinstance(asr, LocalAgreementASR):
        from ..streaming.local_agreement import OnlineASRProcessor
        from ..streaming.windowed import WindowedStreamingProcessor

        backend = asr.asr
        if language and language != config.lan:
            from ..streaming.session_proxy import SessionASRProxy

            backend = SessionASRProxy(backend, language)
        if config.backend_policy == "windowed":
            return WindowedStreamingProcessor(
                backend,
                hold_back_words=getattr(config, "holdback_words", 6),
                chunk_sec=getattr(config, "qwen3_chunk_sec", 0.0),
                right_context_ms=getattr(config, "qwen3_right_context_ms", 0),
                context=getattr(config, "qwen3_context", ""),
            )
        return OnlineASRProcessor(backend)

    from ..streaming.simul_processor import SimulStreamingOnlineProcessor

    tokenizer = None
    if language and language not in ("auto", config.lan):
        tokenizer = get_tokenizer(
            asr.dims.multilingual,
            num_languages=asr.dims.num_languages,
            language=language,
            task=asr.cfg.task,
        )
    return SimulStreamingOnlineProcessor(asr.engine, tokenizer=tokenizer, scheduler=scheduler)


def online_diarization_factory(config: WLKConfig, diarization_model):
    if diarization_model is None:
        return None
    return diarization_model.new_session()


def online_translation_factory(config: WLKConfig, translation_model):
    if translation_model is None:
        return None
    return translation_model.new_session(
        src=config.lan if config.lan != "auto" else "en",
        tgt=config.target_language,
    )


def session_translation_factory(config: WLKConfig, translation_model, target_language: str):
    if translation_model is None:
        return None
    return translation_model.new_session(
        src=config.lan if config.lan != "auto" else "en",
        tgt=target_language,
    )
