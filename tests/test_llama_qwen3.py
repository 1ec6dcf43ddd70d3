"""Llama/Qwen3 text towers: torch parity (prefill + incremental)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from whisperlivekit_tpu.models import llama as LM

transformers = pytest.importorskip("transformers")


def _run_parity(hf, dims, qk_norm_name=None):
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = LM.convert_hf_state_dict(sd, dims, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, dims.vocab_size, (2, 9)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    cache = LM.init_cache(dims, 2, 16)
    emb = LM.embed_tokens(params, jnp.asarray(ids.astype(np.int32)))
    logits, _ = LM.forward(params, emb, jnp.zeros((2,), jnp.int32), cache, dims)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=5e-3)

    # incremental == prefill
    cache = LM.init_cache(dims, 2, 16)
    outs = []
    for s in range(9):
        e = LM.embed_tokens(params, jnp.asarray(ids[:, s : s + 1].astype(np.int32)))
        lg, cache = LM.forward(params, e, jnp.full((2,), s, jnp.int32), cache, dims)
        outs.append(np.asarray(lg)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), ref, rtol=2e-3, atol=5e-3)


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval()
    _run_parity(hf, LM.dims_from_hf_config(cfg.to_dict()))


def test_qwen3_parity():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, max_position_embeddings=128,
        head_dim=16, tie_word_embeddings=False,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(1)
    hf = Qwen3ForCausalLM(cfg).eval()
    dims = LM.dims_from_hf_config(cfg.to_dict())
    dims = LM.LlamaDims(**{**dims.__dict__, "qk_norm": True})
    _run_parity(hf, dims)
