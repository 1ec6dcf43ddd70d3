"""Numerical parity of the JAX Whisper vs torch (transformers) with random weights.

The oracle is HuggingFace's WhisperForConditionalGeneration — an independent
public implementation of the same architecture — randomly initialized with a
tiny config, converted through our HF loader path, and compared end to end.
This validates both the model math and the HF state-dict conversion.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from whisperlivekit_tpu.models.whisper import load as L
from whisperlivekit_tpu.models.whisper import model as M

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def setup():
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        vocab_size=1000,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=50,
        max_target_positions=32,
        activation_function="gelu",
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    cfg._attn_implementation = "eager"  # sdpa can't return attention weights
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(cfg).eval()
    # Random-init HF models have random encoder position embeddings; real
    # checkpoints (and our encoder) use fixed sinusoids — align them.
    sin = M.sinusoids(cfg.max_source_positions, cfg.d_model)
    with torch.no_grad():
        hf.model.encoder.embed_positions.weight.copy_(torch.from_numpy(sin))

    dims = L.dims_from_hf_config(cfg.to_dict())
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = L.convert_hf_state_dict(sd, dims, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    return hf, dims, params, mel


def test_encoder_parity(setup):
    hf, dims, params, mel = setup
    with torch.no_grad():
        ref = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(M.encode(params, jnp.asarray(mel), dims))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_decoder_prefill_parity(setup):
    hf, dims, params, mel = setup
    tokens = np.array([[5, 17, 42, 99, 3, 7, 11], [1, 2, 3, 4, 5, 6, 7]], dtype=np.int32)
    with torch.no_grad():
        out = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
            output_attentions=True,
        )
        ref_logits = out.logits.numpy()
        ref_xattn = [a.numpy() for a in out.cross_attentions]  # per layer [B,H,S,T]

    enc = M.encode(params, jnp.asarray(mel), dims)
    xkv = M.cross_kv(params, enc, dims)
    cache = M.init_cache(dims, batch=2)
    align = M.AlignSpec.from_pairs([(0, 1), (1, 0), (1, 3)])
    logits, align_probs, cache = M.decode(
        params, jnp.asarray(tokens), jnp.zeros(2, jnp.int32), xkv, cache, dims, align=align
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=2e-3, atol=5e-3)

    # alignment-head cross attention parity
    probs = np.asarray(align_probs)  # [K,B,S,T]
    np.testing.assert_allclose(probs[0], ref_xattn[0][:, 1], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(probs[1], ref_xattn[1][:, 0], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(probs[2], ref_xattn[1][:, 3], rtol=2e-3, atol=1e-4)


def test_incremental_equals_prefill(setup):
    _, dims, params, mel = setup
    tokens = np.array([[5, 17, 42, 99, 3, 7, 11], [1, 2, 3, 4, 5, 6, 7]], dtype=np.int32)
    enc = M.encode(params, jnp.asarray(mel), dims)
    xkv = M.cross_kv(params, enc, dims)

    cache = M.init_cache(dims, batch=2)
    full_logits, _, _ = M.decode(
        params, jnp.asarray(tokens), jnp.zeros(2, jnp.int32), xkv, cache, dims
    )

    cache = M.init_cache(dims, batch=2)
    step_logits = []
    for s in range(tokens.shape[1]):
        lg, _, cache = M.decode(
            params,
            jnp.asarray(tokens[:, s : s + 1]),
            jnp.full((2,), s, jnp.int32),
            xkv,
            cache,
            dims,
        )
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), rtol=2e-3, atol=5e-3)


def test_per_lane_positions(setup):
    """Lanes at different decode depths in one batch must match per-lane runs."""
    _, dims, params, mel = setup
    enc = M.encode(params, jnp.asarray(mel), dims)
    xkv = M.cross_kv(params, enc, dims)

    # Lane 0: prefill 3 tokens then step; lane 1: prefill 5 then step.
    t0 = np.array([5, 17, 42], dtype=np.int32)
    t1 = np.array([1, 2, 3, 4, 5], dtype=np.int32)

    # Reference: run each lane alone (batch of 1, same enc row).
    def run_alone(lane, toks, step_tok):
        xkv1 = M.CrossKV(k=xkv.k[:, lane : lane + 1], v=xkv.v[:, lane : lane + 1])
        cache = M.init_cache(dims, batch=1)
        _, _, cache = M.decode(
            params, jnp.asarray(toks[None]), jnp.zeros(1, jnp.int32), xkv1, cache, dims
        )
        lg, _, _ = M.decode(
            params,
            jnp.asarray([[step_tok]], jnp.int32),
            jnp.array([len(toks)], jnp.int32),
            xkv1,
            cache,
            dims,
        )
        return np.asarray(lg)[0, 0]

    ref0 = run_alone(0, t0, 9)
    ref1 = run_alone(1, t1, 9)

    # Batched: pad lane 0's prompt, use per-lane pos.
    cache = M.init_cache(dims, batch=2)
    padded = np.stack([np.pad(t0, (0, 2)), t1])
    _, _, cache = M.decode(
        params, jnp.asarray(padded), jnp.zeros(2, jnp.int32), xkv, cache, dims
    )
    lg, _, _ = M.decode(
        params,
        jnp.asarray([[9], [9]], jnp.int32),
        jnp.array([3, 5], jnp.int32),
        xkv,
        cache,
        dims,
    )
    np.testing.assert_allclose(np.asarray(lg)[0, 0], ref0, rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(lg)[1, 0], ref1, rtol=2e-3, atol=5e-3)


def test_openai_format_roundtrip(tmp_path, setup):
    """OpenAI .pt loading path: save canonical-keyed torch ckpt, load, compare."""
    hf, dims, params, mel = setup
    sd = {k: v for k, v in hf.state_dict().items()}
    canon = {}
    for k, v in sd.items():
        ck = L.hf_key_to_canonical(k)
        canon[ck] = v if ck != "encoder.positional_embedding" else v
    ckpt = {
        "dims": {
            "n_mels": dims.n_mels,
            "n_audio_ctx": dims.n_audio_ctx,
            "n_audio_state": dims.n_audio_state,
            "n_audio_head": dims.n_audio_head,
            "n_audio_layer": dims.n_audio_layer,
            "n_vocab": dims.n_vocab,
            "n_text_ctx": dims.n_text_ctx,
            "n_text_state": dims.n_text_state,
            "n_text_head": dims.n_text_head,
            "n_text_layer": dims.n_text_layer,
        },
        "model_state_dict": canon,
    }
    path = tmp_path / "model.pt"
    torch.save(ckpt, path)
    params2, dims2, _ = L.load_model(str(path), dtype=jnp.float32)
    assert dims2.n_audio_ctx == dims.n_audio_ctx

    mel_j = jnp.asarray(mel)
    out1 = np.asarray(M.encode(params, mel_j, dims))
    out2 = np.asarray(M.encode(params2, mel_j, dims2))
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)

def test_transposed_xkv_equivalence(setup):
    """xkv_transposed ([B,H,Dh,T], the decode fast path) matches the default
    layout for both prefill (S>1, align_reduce) and S=1 steps."""
    hf, dims, params, mel = setup
    tokens = np.array([[5, 17, 42, 99], [1, 2, 3, 4]], dtype=np.int32)
    enc = M.encode(params, jnp.asarray(mel), dims)
    align = M.AlignSpec.from_pairs([(0, 1), (1, 0), (1, 3)])

    xkv = M.cross_kv(params, enc, dims)
    xkv_t = M.cross_kv(params, enc, dims, transposed=True)
    assert xkv_t.k.shape == (
        dims.n_text_layer, 2, dims.n_text_head, dims.head_dim, enc.shape[1]
    )

    # prefill with align reductions (the tick prefill path)
    plen = jnp.asarray([4, 3], jnp.int32)
    row_mask = (jnp.arange(4)[None, :] < plen[:, None]).astype(jnp.float32)
    last_onehot = (jnp.arange(4)[None, :] == (plen - 1)[:, None]).astype(jnp.float32)
    lg0, (a0, q0, l0), c0 = M.decode(
        params, jnp.asarray(tokens), jnp.zeros(2, jnp.int32), xkv,
        M.init_cache(dims, 2), dims, align=align,
        align_reduce=(row_mask, last_onehot),
    )
    lg1, (a1, q1, l1), c1 = M.decode(
        params, jnp.asarray(tokens), jnp.zeros(2, jnp.int32), xkv_t,
        M.init_cache(dims, 2), dims, align=align,
        align_reduce=(row_mask, last_onehot), xkv_transposed=True,
    )
    np.testing.assert_allclose(np.asarray(lg0), np.asarray(lg1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-5, atol=1e-6)

    # one S=1 decode step from the prefilled caches
    step = jnp.asarray([[7], [9]], jnp.int32)
    pos = jnp.asarray([4, 4], jnp.int32)
    s_lg0, s_ap0, _ = M.decode(params, step, pos, xkv, c0, dims, align=align)
    s_lg1, s_ap1, _ = M.decode(
        params, step, pos, xkv_t, c1, dims, align=align, xkv_transposed=True
    )
    np.testing.assert_allclose(np.asarray(s_lg0), np.asarray(s_lg1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_ap0), np.asarray(s_ap1), rtol=1e-5, atol=1e-6)


def test_decoder_f8_quantization(setup):
    """Weight-only f8 decoder (config decoder_dtype=f8): the {w, w_scale}
    form must reconstruct weights within e4m3 mantissa error and keep the
    decode numerically close — greedy argmax agreement is measured on the
    TPU probe (scripts/probe_decoder_f8.py); here we pin the machinery."""
    hf, dims, params, mel = setup
    qp = M.quantize_decoder_f8(params)

    q = qp["decoder"]["blocks"]["attn"]["q"]
    assert q["w"].dtype == jnp.float8_e4m3fn
    assert q["w_scale"].shape == (dims.n_text_layer, dims.n_text_state)
    # dequantized weight ≈ original within e4m3 relative precision (2^-3
    # mantissa step, so ~6% worst-case relative error per element)
    w0 = np.asarray(params["decoder"]["blocks"]["attn"]["q"]["w"], np.float32)
    wq = np.asarray(q["w"].astype(jnp.float32)) * np.asarray(q["w_scale"])[:, None, :]
    denom = np.maximum(np.abs(w0), np.abs(w0).max() * 1e-3)
    assert np.max(np.abs(wq - w0) / denom) < 0.07
    # encoder + cross k/v + embeddings untouched
    assert qp["encoder"] is params["encoder"]
    assert qp["decoder"]["blocks"]["cross"]["k"] is params["decoder"]["blocks"]["cross"]["k"]
    assert qp["decoder"]["tok_emb"] is params["decoder"]["tok_emb"]

    tokens = np.array([[5, 17, 42, 99, 3, 7, 11], [1, 2, 3, 4, 5, 6, 7]], dtype=np.int32)
    enc = M.encode(params, jnp.asarray(mel), dims)
    xkv = M.cross_kv(params, enc, dims)
    ref_logits, _, _ = M.decode(
        params, jnp.asarray(tokens), jnp.zeros(2, jnp.int32), xkv,
        M.init_cache(dims, batch=2), dims,
    )
    f8_logits, _, _ = M.decode(
        qp, jnp.asarray(tokens), jnp.zeros(2, jnp.int32), xkv,
        M.init_cache(dims, batch=2), dims,
    )
    ref = np.asarray(ref_logits)
    f8 = np.asarray(f8_logits)
    assert np.all(np.isfinite(f8))
    # logit perturbation stays small relative to the logit scale…
    assert np.abs(f8 - ref).max() / np.abs(ref).max() < 0.2
    # …and the greedy path barely moves on random weights
    agree = (ref.argmax(-1) == f8.argmax(-1)).mean()
    assert agree >= 0.8
