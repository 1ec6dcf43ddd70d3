"""Sortformer tensor-layout convention spec (VERDICT r2 #6).

Numerical parity against NVIDIA's real ``diar_streaming_sortformer_4spk-v2``
checkpoint needs a networked host (scripts/verify_sortformer.py). What CAN
be proven here, with torch's functional ops as the independent oracle, is
every layout convention a converted checkpoint depends on — the exact class
of bug ("one transposed weight or wrong rel-pos convention") that would pass
shape tests and produce garbage speakers:

  1. dw-striding subsampling == torch Conv2d(stride=2, padding=1) stack with
     NeMo's channel-major flatten (``x.transpose(1, 2).reshape(b, t, -1)``)
     — pinned end-to-end through the converter, on odd AND even lengths
     (XLA SAME padding differs from torch's explicit padding=1 on even
     lengths; that bug was live until this spec).
  2. rel-pos table: row j encodes relative position (T-1-j), interleaved
     sin/cos (NeMo RelPositionalEncoding).
  3. rel-pos attention == a naive O(T²) Transformer-XL implementation that
     explicitly gathers R_{s-t}: score(s,t) = [(q_s+u)·k_t + (q_s+v)·R_{s-t}]
     /√dh (pins the shift trick, the bias placement, and the sign).
  4. conformer depthwise conv == torch conv1d(groups=d, padding=K//2) under
     the converter's [d,1,K] → [K,d] mapping.
  5. NeMo xscale: conformer inputs are scaled by √d_encoder before layer 0.
  6. converter orientation: torch Linear [O,I] → w=[I,O]; conv2d [O,I,kH,kW]
     → HWIO; depthwise conv1d [d,1,K] → [K,d].
  7. FIFO timeline: chunks append at fifo_len; on overflow the OLDEST rows
     pop into the speaker cache in arrival order (reference
     diarization/sortformer_backend.py:130-336 streaming semantics).
  8. static-shape padding inside [spkcache | fifo | chunk] is invisible to
     the head (attention-masked), so garbage in dead rows can't leak.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import whisperlivekit_tpu.diarization.sortformer_jax as S
from tests.test_sortformer_jax import synthetic_nemo_state_dict

DIMS = S.DEV_TINY


@pytest.fixture(scope="module")
def converted():
    sd = synthetic_nemo_state_dict(DIMS, seed=3)
    # arch dims are inferred from shapes; streaming geometry (fifo/chunk
    # lengths) is runtime config — pin DEV_TINY's so the FIFO spec is exact
    params, dims = S.convert_nemo_state_dict(sd, dims=DIMS)
    return sd, params, dims


# ---------------------------------------------------------------------------
# 1. subsampling vs torch (the converter-to-forward round trip)
# ---------------------------------------------------------------------------


def torch_dw_striding(sd, mel: np.ndarray) -> np.ndarray:
    """NeMo ConvSubsampling('dw_striding') in torch functional form."""
    t = lambda k: torch.from_numpy(sd[k])
    x = torch.from_numpy(mel)[:, None]  # [B, 1, T, M]
    x = F.relu(F.conv2d(x, t("encoder.pre_encode.conv.0.weight"),
                        t("encoder.pre_encode.conv.0.bias"), stride=2, padding=1))
    C = sd["encoder.pre_encode.conv.0.weight"].shape[0]
    for stage in (2, 5):
        x = F.conv2d(x, t(f"encoder.pre_encode.conv.{stage}.weight"),
                     t(f"encoder.pre_encode.conv.{stage}.bias"),
                     stride=2, padding=1, groups=C)
        x = F.relu(F.conv2d(x, t(f"encoder.pre_encode.conv.{stage + 1}.weight"),
                            t(f"encoder.pre_encode.conv.{stage + 1}.bias")))
    b, c, tt, f = x.shape
    x = x.transpose(1, 2).reshape(b, tt, c * f)  # channel-major flatten
    y = x @ t("encoder.pre_encode.out.weight").T + t("encoder.pre_encode.out.bias")
    return y.numpy()


@pytest.mark.parametrize("T", [37, 40, 48, 199])
def test_subsampling_matches_torch(converted, T):
    sd, params, dims = converted
    mel = np.random.default_rng(T).standard_normal((2, T, dims.n_mels)).astype(np.float32)
    want = torch_dw_striding(sd, mel)
    got = np.asarray(S.subsample(params, jnp.asarray(mel), dims))
    assert got.shape == want.shape == (2, -(-T // 8), dims.d_encoder)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# 2-3. relative-position conventions
# ---------------------------------------------------------------------------


def test_relpos_table_row_convention():
    T, d = 5, 8
    pe = S._relpos_table(T, d)
    assert pe.shape == (2 * T - 1, d)
    div = np.exp(np.arange(0, d, 2) * -(math.log(10000.0) / d))
    for j, pos in enumerate(range(T - 1, -T, -1)):  # row j ↔ position T-1-j
        np.testing.assert_allclose(pe[j, 0::2], np.sin(pos * div), atol=1e-6)
        np.testing.assert_allclose(pe[j, 1::2], np.cos(pos * div), atol=1e-6)
    # position 0 sits at row T-1
    np.testing.assert_allclose(pe[T - 1, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[T - 1, 1::2], 1.0, atol=1e-7)


def test_relpos_attention_matches_naive_gather(converted):
    _, params, dims = converted
    attn = jax.tree.map(lambda a: a[0], params["conformer"])["attn"]
    H = dims.encoder_heads
    B, T, d = 2, 6, dims.d_encoder
    x = np.random.default_rng(0).standard_normal((B, T, d)).astype(np.float32)
    pe = S._relpos_table(T, d)

    W = {k: np.asarray(attn[k]["w"]) for k in ("q", "k", "v", "o", "pos")}
    bias = {k: np.asarray(attn[k]["b"]) for k in ("q", "k", "v", "o")}
    u = np.asarray(attn["bias_u"])  # [H, dh]
    v_b = np.asarray(attn["bias_v"])
    dh = d // H
    q = (x @ W["q"] + bias["q"]).reshape(B, T, H, dh)
    k = (x @ W["k"] + bias["k"]).reshape(B, T, H, dh)
    v = (x @ W["v"] + bias["v"]).reshape(B, T, H, dh)
    pos = (pe @ W["pos"]).reshape(2 * T - 1, H, dh)

    scores = np.zeros((B, H, T, T), np.float32)
    for s in range(T):
        for t in range(T):
            # R_{s-t} lives at row (T-1) - (s-t)
            r = pos[(T - 1) - (s - t)]
            scores[:, :, s, t] = (
                np.einsum("bhd,bhd->bh", q[:, s] + u, k[:, t])
                + np.einsum("bhd,hd->bh", q[:, s] + v_b, r)
            )
    scores /= math.sqrt(dh)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ctx = np.einsum("bhst,bthd->bshd", probs, v).reshape(B, T, d)
    want = ctx @ W["o"] + bias["o"]

    got = np.asarray(S._relpos_attend(jnp.asarray(x), attn, jnp.asarray(pe), H))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# 4. conformer depthwise conv vs torch conv1d
# ---------------------------------------------------------------------------


def test_depthwise_conv_matches_torch(converted):
    sd, params, dims = converted
    K, d = dims.conv_kernel, dims.d_encoder
    h = np.random.default_rng(1).standard_normal((2, 11, d)).astype(np.float32)
    tw = torch.from_numpy(sd["encoder.layers.0.conv.depthwise_conv.weight"])
    tb = torch.from_numpy(sd["encoder.layers.0.conv.depthwise_conv.bias"])
    want = F.conv1d(torch.from_numpy(h).transpose(1, 2), tw, tb,
                    padding=K // 2, groups=d).transpose(1, 2).numpy()

    p = jax.tree.map(lambda a: a[0], params["conformer"])["conv_dw"]
    pad = K // 2
    hp = jnp.pad(jnp.asarray(h), ((0, 0), (pad, pad), (0, 0)))
    windows = jnp.stack([hp[:, i: i + h.shape[1]] for i in range(K)], axis=-1)
    got = np.asarray(jnp.einsum("btdk,kd->btd", windows, p["w"]) + p["b"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# 5. xscale
# ---------------------------------------------------------------------------


def test_conformer_applies_xscale_before_layers(converted):
    _, params, dims = converted
    empty = {**params, "conformer": jax.tree.map(lambda a: a[0:0], params["conformer"])}
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, dims.d_encoder)),
                    jnp.float32)
    out = S.conformer(empty, x, dims)  # zero layers: only the input scale runs
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x) * math.sqrt(dims.d_encoder), rtol=1e-6
    )


# ---------------------------------------------------------------------------
# 6. converter orientation
# ---------------------------------------------------------------------------


def test_converter_weight_orientation(converted):
    sd, params, dims = converted
    np.testing.assert_array_equal(
        np.asarray(params["proj"]["w"]),
        sd["sortformer_modules.encoder_proj.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(params["sub0"]["w"]),
        sd["encoder.pre_encode.conv.0.weight"].transpose(2, 3, 1, 0),
    )
    dw0 = jax.tree.map(lambda a: a[0], params["conformer"])["conv_dw"]["w"]
    np.testing.assert_array_equal(
        np.asarray(dw0),
        sd["encoder.layers.0.conv.depthwise_conv.weight"][:, 0, :].T,
    )
    # torch Linear semantics: y = x @ W.T + b  ⇔  _dense with w = W.T
    Wt = sd["sortformer_modules.encoder_proj.weight"]
    x = np.random.default_rng(4).standard_normal((3, Wt.shape[1])).astype(np.float32)
    want = x @ Wt.T + sd["sortformer_modules.encoder_proj.bias"]
    got = np.asarray(S._dense(jnp.asarray(x), params["proj"]))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# 7. FIFO timeline
# ---------------------------------------------------------------------------


def test_fifo_append_and_pop_order(converted):
    _, params, dims = converted
    rng = np.random.default_rng(5)
    n_chunk = 5  # ceil(40 / 8) for DEV_TINY's 40-mel chunks
    assert dims.fifo_len == 12
    mels = [jnp.asarray(rng.standard_normal((1, dims.chunk_mel_frames, dims.n_mels)),
                        jnp.float32) for _ in range(3)]
    embs = [np.asarray(S.encode_chunk(params, m, dims)) for m in mels]

    st = S.init_state(dims, 1)
    _, st = S.streaming_step(params, st, mels[0], dims)
    assert int(st.fifo_len[0]) == n_chunk
    np.testing.assert_allclose(np.asarray(st.fifo[0, :n_chunk]), embs[0][0],
                               atol=1e-5, rtol=1e-5)

    _, st = S.streaming_step(params, st, mels[1], dims)
    assert int(st.fifo_len[0]) == 2 * n_chunk
    np.testing.assert_allclose(np.asarray(st.fifo[0, n_chunk:2 * n_chunk]),
                               embs[1][0], atol=1e-5, rtol=1e-5)

    # third chunk overflows by 3: oldest 3 rows (chunk0[0:3]) pop to the
    # speaker cache; the surviving timeline is [chunk0[3:] chunk1 chunk2]
    _, st = S.streaming_step(params, st, mels[2], dims)
    assert int(st.fifo_len[0]) == dims.fifo_len
    np.testing.assert_allclose(np.asarray(st.fifo[0, 0]), embs[0][0, 3],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.fifo[0, -n_chunk:]), embs[2][0],
                               atol=1e-5, rtol=1e-5)
    assert int(st.spkcache_len[0]) > 0  # popped rows were compressed in


# ---------------------------------------------------------------------------
# 8. padding rows are attention-invisible
# ---------------------------------------------------------------------------


def test_dead_state_rows_cannot_leak(converted):
    _, params, dims = converted
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.standard_normal((1, dims.chunk_mel_frames, dims.n_mels)),
                      jnp.float32)

    def state_with(dead_fill: float) -> S.StreamingState:
        st = S.init_state(dims, 1)
        cache = np.full((1, dims.spkcache_len, dims.d_model), dead_fill, np.float32)
        fifo = np.full((1, dims.fifo_len, dims.d_model), dead_fill, np.float32)
        live = np.random.default_rng(7)
        cache[0, :2] = live.standard_normal((2, dims.d_model))
        fifo[0, :3] = live.standard_normal((3, dims.d_model))
        return st._replace(
            spkcache=jnp.asarray(cache), fifo=jnp.asarray(fifo),
            spkcache_len=jnp.asarray([2], jnp.int32),
            fifo_len=jnp.asarray([3], jnp.int32),
        )

    preds_zero, _ = S.streaming_step(params, state_with(0.0), mel, dims)
    preds_junk, _ = S.streaming_step(params, state_with(1e3), mel, dims)
    np.testing.assert_array_equal(np.asarray(preds_zero), np.asarray(preds_junk))


def test_ceil_div3_is_ceil_div8():
    for t in range(1, 300):
        assert S._ceil_div3(t) == -(-t // 8)


# ---------------------------------------------------------------------------
# 9. FIFO-compress / speaker-cache quota (VERDICT r3 next #7: the remaining
#    un-oracled state transition) vs an independent per-row numpy oracle
# ---------------------------------------------------------------------------


def _numpy_compress_oracle(cache, cache_preds, cache_len, popped, popped_preds,
                           popped_valid, mean_sil, n_sil, Lc, n_spk):
    """Reference semantics (reference sortformer_backend.py:130-336): merge
    popped FIFO frames into the bounded cache by per-speaker confidence
    quota over [cache | popped], arrival order preserved; confidently-silent
    popped frames feed the running mean silence embedding, which pads the
    unfilled cache rows."""
    B, Lp, D = popped.shape
    quota = max(Lc // n_spk, 1)
    out_cache = np.zeros((B, Lc, D), np.float32)
    out_preds = np.zeros((B, Lc, n_spk), np.float32)
    out_len = np.zeros(B, np.int32)
    out_sil = mean_sil.copy()
    out_nsil = n_sil.copy()
    for b in range(B):
        cand = np.concatenate([cache[b], popped[b]], 0)
        preds = np.concatenate([cache_preds[b], popped_preds[b]], 0)
        valid = np.concatenate([np.arange(Lc) < cache_len[b], popped_valid[b]])
        sil_mask = popped_valid[b] & (popped_preds[b].max(-1) < 0.5)
        ns = n_sil[b] + sil_mask.sum()
        if ns > 0:
            out_sil[b] = (
                mean_sil[b] * n_sil[b] + popped[b][sil_mask].sum(0)
            ) / ns
        out_nsil[b] = ns
        keep = np.zeros(len(cand), bool)
        for s in range(n_spk):
            score = np.where(valid, preds[:, s], -np.inf)
            idx = np.argsort(-score, kind="stable")[:quota]
            keep[idx[score[idx] > 0.05]] = True
        order = np.sort(np.nonzero(keep)[0])[:Lc]
        out_len[b] = len(order)
        out_cache[b] = out_sil[b]  # NeMo pads the cache with the silence mean
        out_cache[b, : len(order)] = cand[order]
        out_preds[b, : len(order)] = preds[order]
    return out_cache, out_preds, out_len, out_sil, out_nsil


def test_compress_quota_matches_numpy_oracle():
    dims = DIMS
    Lc, n_spk, D = dims.spkcache_len, dims.max_speakers, dims.d_model
    rng = np.random.default_rng(11)
    B, Lp = 4, 6
    # rows: full cache / partial cache / empty cache / partial popped
    cache_len = np.array([Lc, Lc // 2, 0, 3], np.int32)
    popped_valid = np.ones((B, Lp), bool)
    popped_valid[3, 4:] = False
    cache = rng.standard_normal((B, Lc, D)).astype(np.float32)
    popped = rng.standard_normal((B, Lp, D)).astype(np.float32)
    cache_preds = rng.uniform(0, 1, (B, Lc, n_spk)).astype(np.float32)
    popped_preds = rng.uniform(0, 1, (B, Lp, n_spk)).astype(np.float32)
    # make some popped frames confidently silent (max prob < 0.5)
    popped_preds[:, 0] *= 0.3
    mean_sil = rng.standard_normal((B, D)).astype(np.float32)
    n_sil = np.array([0, 5, 2, 0], np.int32)

    st = S.init_state(dims, B)._replace(
        spkcache=jnp.asarray(cache),
        spkcache_preds=jnp.asarray(cache_preds),
        spkcache_len=jnp.asarray(cache_len),
        mean_sil_emb=jnp.asarray(mean_sil),
        n_sil_frames=jnp.asarray(n_sil),
    )
    new = S._compress_into_cache(
        st, jnp.asarray(popped), jnp.asarray(popped_preds),
        jnp.asarray(popped_valid), dims,
    )
    o_cache, o_preds, o_len, o_sil, o_nsil = _numpy_compress_oracle(
        cache, cache_preds, cache_len, popped, popped_preds, popped_valid,
        mean_sil, n_sil, Lc, n_spk,
    )
    np.testing.assert_array_equal(np.asarray(new.spkcache_len), o_len)
    np.testing.assert_array_equal(np.asarray(new.n_sil_frames), o_nsil)
    np.testing.assert_allclose(np.asarray(new.mean_sil_emb), o_sil,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new.spkcache), o_cache,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new.spkcache_preds), o_preds,
                               atol=1e-5, rtol=1e-5)
    # the quota must actually bind: with 4 speakers x quota over 22
    # candidates, at least one valid candidate was dropped somewhere
    total_valid = cache_len.sum() + popped_valid.sum()
    assert o_len.sum() < total_valid
