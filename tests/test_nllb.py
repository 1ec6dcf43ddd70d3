"""NLLB (M2M100) JAX parity vs transformers torch with random weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from whisperlivekit_tpu.translation import nllb as N
from whisperlivekit_tpu.translation import nllb_model as nm

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def setup():
    from transformers import M2M100Config, M2M100ForConditionalGeneration

    cfg = M2M100Config(
        vocab_size=512,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_position_embeddings=128,
        scale_embedding=True,
        activation_function="relu",
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
        decoder_start_token_id=2,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = M2M100ForConditionalGeneration(cfg).eval()
    dims = N.dims_from_hf_config(cfg.to_dict())
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = N.convert_hf_state_dict(sd, dims, dtype=jnp.float32)
    return hf, dims, params


def test_encoder_parity(setup):
    hf, dims, params = setup
    rng = np.random.default_rng(0)
    tokens = rng.integers(3, 500, (2, 9)).astype(np.int64)
    with torch.no_grad():
        ref = hf.model.encoder(torch.from_numpy(tokens)).last_hidden_state.numpy()
    ours = np.asarray(
        nm.encode(params, jnp.asarray(tokens.astype(np.int32)), dims,
                  pad_mask=jnp.ones((2, 9), bool))
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_seq2seq_logits_parity(setup):
    hf, dims, params = setup
    rng = np.random.default_rng(1)
    src = rng.integers(3, 500, (2, 7)).astype(np.int64)
    dec = rng.integers(3, 500, (2, 5)).astype(np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(src),
            decoder_input_ids=torch.from_numpy(dec),
        ).logits.numpy()

    enc = nm.encode(params, jnp.asarray(src.astype(np.int32)), dims,
                    pad_mask=jnp.ones((2, 7), bool))
    xk, xv = nm.cross_kv(params, enc, dims)
    cache = nm.init_cache(dims, 2, 16)
    logits, _ = nm.decode(
        params, jnp.asarray(dec.astype(np.int32)), jnp.zeros((2,), jnp.int32),
        xk, xv, cache, dims, enc_pad_mask=jnp.ones((2, 7), bool),
    )
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=5e-3)


def test_padded_source_parity(setup):
    """Right-padded source with attention mask must match unpadded."""
    hf, dims, params = setup
    rng = np.random.default_rng(2)
    src = rng.integers(3, 500, (1, 6)).astype(np.int32)
    padded = np.full((1, 10), dims.pad_token_id, np.int32)
    padded[0, :6] = src[0]
    mask = np.zeros((1, 10), bool)
    mask[0, :6] = True

    enc_a = nm.encode(params, jnp.asarray(src), dims, pad_mask=jnp.ones((1, 6), bool))
    enc_b = nm.encode(params, jnp.asarray(padded), dims, pad_mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(enc_a), np.asarray(enc_b)[:, :6], rtol=1e-4, atol=1e-4
    )


def test_greedy_translate_matches_hf_generate(setup):
    hf, dims, params = setup
    rng = np.random.default_rng(3)
    src = rng.integers(3, 500, (1, 6)).astype(np.int64)
    forced = 100  # pretend language token
    with torch.no_grad():
        ref = hf.generate(
            torch.from_numpy(src),
            forced_bos_token_id=forced,
            num_beams=1,
            do_sample=False,
            max_length=12,
        ).numpy()[0]

    out = nm.greedy_translate(
        params,
        jnp.asarray(src.astype(np.int32)),
        jnp.ones((1, 6), bool),
        jnp.asarray([forced], jnp.int32),
        2,
        dims,
        12,
    )
    ours = [int(t) for t in np.asarray(out[0])]
    # HF output: [decoder_start(=eos), forced, tokens..., eos]; ours: [forced, ...]
    ref_seq = [int(t) for t in ref[1:]]
    n = min(len(ref_seq), len(ours))
    # compare until first eos
    def trim(seq):
        out = []
        for t in seq:
            out.append(t)
            if t == 2 and len(out) > 1:
                break
        return out

    assert trim(ours)[: len(trim(ref_seq))] == trim(ref_seq)


def test_language_code_mapping():
    assert N._nllb_language_code("en") == "eng_Latn"
    assert N._nllb_language_code("fra_Latn") == "fra_Latn"
    with pytest.raises(ValueError):
        N._nllb_language_code("xx")
