"""Weight loading: OpenAI .pt / HF safetensors / random init → JAX pytree.

Equivalent role to the reference loader (reference whisper/__init__.py:397-637:
official .pt checkpoints, HF sharded safetensors with state-dict key
conversion, dims inference from config.json, LoRA adapter merge), re-targeted
at the stacked-layer pytree of :mod:`.model`.
"""

from __future__ import annotations

import json
import logging
import re
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .dims import MODEL_DIMS, ModelDimensions

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Raw state-dict readers
# ---------------------------------------------------------------------------


def _read_safetensors_dir(path: Path) -> Dict[str, np.ndarray]:
    from safetensors import numpy as st_np

    index = path / "model.safetensors.index.json"
    tensors: Dict[str, np.ndarray] = {}
    if index.exists():
        shards = sorted(set(json.loads(index.read_text())["weight_map"].values()))
        for shard in shards:
            tensors.update(st_np.load_file(path / shard))
    else:
        files = sorted(path.glob("*.safetensors"))
        if not files:
            raise FileNotFoundError(f"no safetensors in {path}")
        for f in files:
            tensors.update(st_np.load_file(f))
    return tensors


def _read_torch_pt(path: Path) -> Tuple[Dict[str, np.ndarray], Optional[dict]]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dims_cfg = ckpt.get("dims") if isinstance(ckpt, dict) else None
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    np_sd = {k: v.to(torch.float32).numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return np_sd, dims_cfg


# ---------------------------------------------------------------------------
# Dims inference
# ---------------------------------------------------------------------------


def dims_from_hf_config(cfg: dict) -> ModelDimensions:
    """Build ModelDimensions from an HF whisper config.json (reference
    whisper/__init__.py `_infer_dims_from_config`)."""
    return ModelDimensions(
        n_mels=cfg.get("num_mel_bins", 80),
        n_audio_ctx=cfg.get("max_source_positions", 1500),
        n_audio_state=cfg["d_model"],
        n_audio_head=cfg["encoder_attention_heads"],
        n_audio_layer=cfg["encoder_layers"],
        n_vocab=cfg["vocab_size"],
        n_text_ctx=cfg.get("max_target_positions", 448),
        n_text_state=cfg["d_model"],
        n_text_head=cfg["decoder_attention_heads"],
        n_text_layer=cfg["decoder_layers"],
    )


def guess_size_name(dims: ModelDimensions) -> Optional[str]:
    for name, d in MODEL_DIMS.items():
        if d == dims:
            return name
    return None


# ---------------------------------------------------------------------------
# State-dict → pytree conversion
# ---------------------------------------------------------------------------


def _stack_layers(per_layer: list) -> dict:
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def _from_canonical(get, dims: ModelDimensions, dtype) -> dict:
    """Build the pytree from a canonical accessor ``get(name) -> np.ndarray``.

    Canonical names follow the OpenAI layout; format adapters below remap
    HF names onto it.
    """

    def lin(prefix, bias=True, transpose=True):
        w = get(f"{prefix}.weight")
        p = {"w": jnp.asarray(w.T if transpose else w, dtype)}
        if bias:
            b = get(f"{prefix}.bias")
            if b is not None:
                p["b"] = jnp.asarray(b, dtype)
        return p

    def ln(prefix):
        return {
            "scale": jnp.asarray(get(f"{prefix}.weight"), dtype),
            "bias": jnp.asarray(get(f"{prefix}.bias"), dtype),
        }

    def attn(prefix):
        return {
            "q": lin(f"{prefix}.query"),
            "k": lin(f"{prefix}.key", bias=False),
            "v": lin(f"{prefix}.value"),
            "o": lin(f"{prefix}.out"),
        }

    def block(prefix, cross):
        p = {
            "attn_ln": ln(f"{prefix}.attn_ln"),
            "attn": attn(f"{prefix}.attn"),
            "mlp_ln": ln(f"{prefix}.mlp_ln"),
            "mlp": {"fc1": lin(f"{prefix}.mlp.0"), "fc2": lin(f"{prefix}.mlp.2")},
        }
        if cross:
            p["cross_ln"] = ln(f"{prefix}.cross_attn_ln")
            p["cross"] = attn(f"{prefix}.cross_attn")
        return p

    encoder = {
        "conv1": {
            "w": jnp.asarray(get("encoder.conv1.weight"), dtype),
            "b": jnp.asarray(get("encoder.conv1.bias"), dtype),
        },
        "conv2": {
            "w": jnp.asarray(get("encoder.conv2.weight"), dtype),
            "b": jnp.asarray(get("encoder.conv2.bias"), dtype),
        },
        "blocks": _stack_layers(
            [block(f"encoder.blocks.{i}", cross=False) for i in range(dims.n_audio_layer)]
        ),
        "ln_post": ln("encoder.ln_post"),
    }
    decoder = {
        "tok_emb": jnp.asarray(get("decoder.token_embedding.weight"), dtype),
        "pos_emb": jnp.asarray(get("decoder.positional_embedding"), dtype),
        "blocks": _stack_layers(
            [block(f"decoder.blocks.{i}", cross=True) for i in range(dims.n_text_layer)]
        ),
        "ln": ln("decoder.ln"),
    }
    return {"encoder": encoder, "decoder": decoder}


def convert_openai_state_dict(sd: Dict[str, np.ndarray], dims: ModelDimensions, dtype=jnp.float32):
    def get(name):
        return sd.get(name)

    return _from_canonical(get, dims, dtype)


# HF → canonical key mapping (reference `_convert_hf_state_dict`,
# whisper/__init__.py).
_HF_PATTERNS = [
    (r"^model\.", ""),
    (r"^proj_out\.", "decoder.token_embedding."),
    (r"^encoder\.layers\.", "encoder.blocks."),
    (r"^decoder\.layers\.", "decoder.blocks."),
    (r"\.self_attn\.q_proj\.", ".attn.query."),
    (r"\.self_attn\.k_proj\.", ".attn.key."),
    (r"\.self_attn\.v_proj\.", ".attn.value."),
    (r"\.self_attn\.out_proj\.", ".attn.out."),
    (r"\.self_attn_layer_norm\.", ".attn_ln."),
    (r"\.encoder_attn\.q_proj\.", ".cross_attn.query."),
    (r"\.encoder_attn\.k_proj\.", ".cross_attn.key."),
    (r"\.encoder_attn\.v_proj\.", ".cross_attn.value."),
    (r"\.encoder_attn\.out_proj\.", ".cross_attn.out."),
    (r"\.encoder_attn_layer_norm\.", ".cross_attn_ln."),
    (r"\.fc1\.", ".mlp.0."),
    (r"\.fc2\.", ".mlp.2."),
    (r"(encoder|decoder)\.blocks\.(\d+)\.final_layer_norm\.", r"\1.blocks.\2.mlp_ln."),
    (r"^encoder\.layer_norm\.", "encoder.ln_post."),
    (r"^decoder\.layer_norm\.", "decoder.ln."),
    (r"^decoder\.embed_tokens\.", "decoder.token_embedding."),
    (r"^decoder\.embed_positions\.weight$", "decoder.positional_embedding"),
    (r"^encoder\.embed_positions\.weight$", "encoder.positional_embedding"),
]


def hf_key_to_canonical(key: str) -> str:
    for pat, repl in _HF_PATTERNS:
        key = re.sub(pat, repl, key)
    return key


def convert_hf_state_dict(sd: Dict[str, np.ndarray], dims: ModelDimensions, dtype=jnp.float32):
    canon = {hf_key_to_canonical(k): v for k, v in sd.items()}

    def get(name):
        return canon.get(name)

    return _from_canonical(get, dims, dtype)


# ---------------------------------------------------------------------------
# LoRA merge (PEFT adapter format, reference whisper/__init__.py:.
# `_apply_lora_adapter`: W += B @ A * alpha / r)
# ---------------------------------------------------------------------------


def apply_lora(params: dict, lora_dir: str | Path, dtype=jnp.float32) -> dict:
    lora_dir = Path(lora_dir)
    cfg = json.loads((lora_dir / "adapter_config.json").read_text())
    scaling = cfg.get("lora_alpha", 16) / cfg.get("r", 16)
    from safetensors import numpy as st_np

    f = lora_dir / "adapter_model.safetensors"
    sd = st_np.load_file(f)

    merged = 0
    for key in list(sd):
        if not key.endswith("lora_A.weight"):
            continue
        base_key = key.replace("base_model.model.", "").replace(".lora_A.weight", "")
        a, b = sd[key], sd[key.replace("lora_A", "lora_B")]
        delta = (b.astype(np.float32) @ a.astype(np.float32)) * scaling
        canon = hf_key_to_canonical(base_key + ".weight")
        path = _canonical_to_pytree_path(canon)
        if path is None:
            logger.warning("LoRA key %s not mappable, skipped", key)
            continue
        params = _add_at_path(params, path, delta.T, dtype)
        merged += 1
    logger.info("merged %d LoRA matrices (scale %.3f)", merged, scaling)
    return params


def _canonical_to_pytree_path(canon: str):
    m = re.match(
        r"(encoder|decoder)\.blocks\.(\d+)\.(attn|cross_attn)\.(query|key|value|out)\.weight",
        canon,
    )
    if not m:
        return None
    tower, layer, which, proj = m.groups()
    attn_key = "attn" if which == "attn" else "cross"
    proj_key = {"query": "q", "key": "k", "value": "v", "out": "o"}[proj]
    return (tower, "blocks", attn_key, proj_key, "w", int(layer))


def _add_at_path(params, path, delta, dtype):
    tower, _, attn_key, proj_key, _, layer = path
    w = params[tower]["blocks"][attn_key][proj_key]["w"]
    w = w.at[layer].add(jnp.asarray(delta, w.dtype))
    params[tower]["blocks"][attn_key][proj_key]["w"] = w
    return params


# ---------------------------------------------------------------------------
# Native checkpoint format (orbax) — fast load path after one-time conversion
# ---------------------------------------------------------------------------


def save_native(params: dict, dims: ModelDimensions, path: str | Path) -> None:
    """Write the converted pytree + dims as an orbax checkpoint
    (`wlk convert`); loading this skips torch/state-dict surgery entirely."""
    import dataclasses

    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    # orbax refuses to overwrite; converting twice to the same destination
    # (or retraining into a previous run's --out-native) should replace it
    if (path / "params").exists():
        import shutil

        shutil.rmtree(path / "params")
    ckptr.save(path / "params", params)
    (path / "dims.json").write_text(json.dumps(dataclasses.asdict(dims)))


def load_native(path: str | Path, dtype=None) -> Tuple[dict, ModelDimensions]:
    import jax
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    dims = ModelDimensions(**json.loads((path / "dims.json").read_text()))
    ckptr = ocp.PyTreeCheckpointer()
    params = ckptr.restore(path / "params")
    params = jax.tree.map(jnp.asarray, params)
    if dtype is not None:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return params, dims


# ---------------------------------------------------------------------------
# Top-level loader
# ---------------------------------------------------------------------------


def detect_format(path: Path) -> str:
    """'openai' (.pt), 'hf' (safetensors dir), or 'unknown'.

    Mirrors the reference's format detection (model_paths.py:8-215) minus the
    CT2/MLX formats, which have no TPU role.
    """
    if path.is_file() and path.suffix in (".pt", ".bin", ".pth"):
        return "openai"
    if path.is_dir() and (path / "dims.json").exists():
        return "native"
    if path.is_dir():
        if (path / "config.json").exists() and (
            list(path.glob("*.safetensors")) or (path / "model.safetensors.index.json").exists()
        ):
            return "hf"
        if list(path.glob("*.pt")):
            return "openai"
    return "unknown"


def load_model(
    name_or_path: str,
    dtype=jnp.bfloat16,
    lora_path: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> Tuple[dict, ModelDimensions, Optional[str]]:
    """Load weights by size name (resolved via HF cache / local dirs) or path.

    Returns (params, dims, size_name or None).
    """
    path = Path(name_or_path).expanduser()
    size_name: Optional[str] = None

    if not path.exists() and name_or_path in MODEL_DIMS:
        size_name = name_or_path
        resolved = _resolve_size_to_path(name_or_path, cache_dir)
        if resolved is None:
            raise FileNotFoundError(
                f"no local weights for '{name_or_path}'; run `wlk pull {name_or_path}` "
                "with network access, or pass --model-path"
            )
        path = resolved

    fmt = detect_format(path)
    if fmt == "native":
        params, dims = load_native(path, dtype=dtype)
        if lora_path:
            params = apply_lora(params, lora_path, dtype)
        return params, dims, guess_size_name(dims)
    if fmt == "openai":
        f = path if path.is_file() else next(iter(path.glob("*.pt")))
        sd, dims_cfg = _read_torch_pt(f)
        dims = (
            ModelDimensions(**dims_cfg)
            if dims_cfg
            else _infer_dims_from_openai_sd(sd)
        )
        params = convert_openai_state_dict(sd, dims, dtype)
    elif fmt == "hf":
        cfg = json.loads((path / "config.json").read_text())
        dims = dims_from_hf_config(cfg)
        sd = _read_safetensors_dir(path)
        params = convert_hf_state_dict(sd, dims, dtype)
    else:
        raise ValueError(f"unrecognized model format at {path}")

    if size_name is None:
        size_name = guess_size_name(dims)
    if lora_path:
        params = apply_lora(params, lora_path, dtype)
    return params, dims, size_name


def _resolve_size_to_path(size: str, cache_dir: Optional[str]) -> Optional[Path]:
    """Search local caches for weights of a named size (HF hub cache layout)."""
    from .dims import HF_REPOS

    roots = []
    if cache_dir:
        roots.append(Path(cache_dir))
    roots.append(Path.home() / ".cache" / "huggingface" / "hub")
    roots.append(Path.home() / ".cache" / "whisper")
    repo = HF_REPOS.get(size, f"openai/whisper-{size}")
    for root in roots:
        if not root.exists():
            continue
        hub_dir = root / f"models--{repo.replace('/', '--')}" / "snapshots"
        if hub_dir.exists():
            snaps = sorted(hub_dir.iterdir())
            if snaps:
                return snaps[-1]
        pt = root / f"{size}.pt"
        if pt.exists():
            return pt
    return None


def _infer_dims_from_openai_sd(sd: Dict[str, np.ndarray]) -> ModelDimensions:
    n_mels = sd["encoder.conv1.weight"].shape[1]
    d = sd["encoder.conv1.weight"].shape[0]
    n_audio_layer = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"encoder\.blocks\.(\d+)\.", k))
    )
    n_text_layer = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"decoder\.blocks\.(\d+)\.", k))
    )
    n_vocab, _ = sd["decoder.token_embedding.weight"].shape
    n_text_ctx = sd["decoder.positional_embedding"].shape[0]
    head_dim = 64
    return ModelDimensions(
        n_mels=n_mels,
        n_audio_ctx=1500,
        n_audio_state=d,
        n_audio_head=d // head_dim,
        n_audio_layer=n_audio_layer,
        n_vocab=n_vocab,
        n_text_ctx=n_text_ctx,
        n_text_state=d,
        n_text_head=d // head_dim,
        n_text_layer=n_text_layer,
    )
