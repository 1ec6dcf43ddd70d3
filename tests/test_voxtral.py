"""Voxtral JAX parity vs transformers torch (random weights, tiny config)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from whisperlivekit_tpu.models import llama as LM
from whisperlivekit_tpu.models import voxtral as V
from whisperlivekit_tpu.models.whisper import model as wm

transformers = pytest.importorskip("transformers")

MEL_LEN = 40  # 2 * max_source_positions


@pytest.fixture(scope="module")
def setup():
    from transformers import VoxtralConfig
    from transformers.models.voxtral.modeling_voxtral import VoxtralForConditionalGeneration

    cfg = VoxtralConfig(
        audio_config=dict(
            num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
            intermediate_size=256, num_mel_bins=32, max_source_positions=20,
        ),
        text_config=dict(
            num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=128, vocab_size=256,
            head_dim=16, rope_theta=10000.0, tie_word_embeddings=False,
            max_position_embeddings=256,
        ),
        audio_token_id=7,
    )
    cfg._attn_implementation = "eager"
    cfg.audio_config._attn_implementation = "eager"
    cfg.text_config._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = VoxtralForConditionalGeneration(cfg).eval()
    # align random encoder positions to sinusoids (real ckpts use sinusoids)
    sin = wm.sinusoids(20, 64)
    with torch.no_grad():
        hf.audio_tower.embed_positions.weight.copy_(torch.from_numpy(sin))

    dims = V.dims_from_hf_config(
        {
            "audio_config": cfg.audio_config.to_dict(),
            "text_config": cfg.text_config.to_dict(),
            "audio_token_id": cfg.audio_token_id,
        }
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = V.convert_hf_state_dict(sd, dims, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 32, MEL_LEN)).astype(np.float32)
    # prompt: [bos, audio x5 (=20 frames / 4), text...]
    n_audio_tok = 20 // 4
    prompt = np.array([[1] + [7] * n_audio_tok + [30, 31, 32]], dtype=np.int64)
    return hf, dims, params, mel, prompt


def test_audio_features_parity(setup):
    hf, dims, params, mel, _ = setup
    with torch.no_grad():
        ref = hf.get_audio_features(torch.from_numpy(mel)).numpy()  # [T_audio, D]
    ours = np.asarray(V.audio_features(params, jnp.asarray(mel), dims))[0]
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_full_logits_parity(setup):
    hf, dims, params, mel, prompt = setup
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(prompt),
            input_features=torch.from_numpy(mel),
        ).logits.numpy()
    cache = LM.init_cache(dims.text, 1, 32)
    logits, _ = V.forward(
        params, jnp.asarray(prompt.astype(np.int32)), jnp.asarray(mel),
        jnp.zeros((1,), jnp.int32), cache, dims,
    )
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=5e-3)


def test_greedy_generate_matches_hf(setup):
    hf, dims, params, mel, prompt = setup
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.from_numpy(prompt),
            input_features=torch.from_numpy(mel),
            max_new_tokens=8,
            do_sample=False,
            eos_token_id=2,
            pad_token_id=0,
        ).numpy()[0, prompt.shape[1] :]
    out = V.greedy_generate(
        params, jnp.asarray(prompt.astype(np.int32)), jnp.asarray(mel), 2, dims, 8
    )
    ours = [int(t) for t in np.asarray(out[0])]

    def trim(seq):
        o = []
        for t in seq:
            o.append(int(t))
            if t == 2:
                break
        return o

    assert trim(ours) == trim(list(ref))
