"""Group-resident cross-KV cache (XKVGroupPool) program invariants.

- the pooled anchor program's tick outputs equal the legacy full-window
  program exactly (pool writeback is output-invariant; the anchor decodes
  from the freshly projected dense cross-KV);
- the pooled incremental tick splices exactly the aligned 256-column
  window [align128(win-128), +256) with the projection of an independently
  re-derived 384-frame tail encode, leaving every other column cached;
- inactive slots (win == 0) never write into the pool.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_asset
from whisperlivekit_tpu.models.whisper import model as M
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.streaming import alignatt as A

pytestmark = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)

EOT, TS_BEGIN, NO_SPEECH, SPACE = 50257, 50364, 50362, 220
B = 2
TAIL = 128
STEPS = 4


@pytest.fixture(scope="module")
def setup():
    dims = MODEL_DIMS["dev-tiny"]
    params = M.init_params(dims, jax.random.PRNGKey(0))
    from whisperlivekit_tpu.models.whisper.dims import default_alignment_heads

    pairs = np.asarray(default_alignment_heads(dims, None), np.int32).reshape(-1, 2)
    suppress = np.zeros(dims.n_vocab, np.float32)
    suppress[TS_BEGIN:] = -np.inf
    return dims, params, jnp.asarray(suppress), jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])


def _audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000
    sig = 0.3 * np.sin(2 * np.pi * (150 + 40 * seed) * t) + 0.05 * rng.standard_normal(n)
    out = np.zeros((B, A.N_SAMPLES), np.float32)
    for b in range(B):
        out[b, :n] = np.roll(sig, 100 * b)[:n]
    return out


def _core(dims, suppress, aL, aH, content):
    prefix = np.full((B, 64), EOT, np.int32)
    prefix[:, 0:4] = [50258, 50259, 50359, 50363]
    return (
        jnp.asarray(prefix), jnp.full((B,), 4, jnp.int32),
        jnp.zeros((B,), jnp.int32), jnp.full((B,), content, jnp.int32),
        jnp.full((B,), -200, jnp.int32), jnp.zeros((B,), bool),
        jnp.full((B,), 10**6, jnp.int32), suppress, aL, aH,
        jnp.int32(2), jnp.int32(10**9), jnp.float32(2.0),
        jnp.ones((B,), bool),
        jnp.zeros((dims.n_audio_state,), jnp.float32), jnp.float32(0.0),
    )


def _statics(dims):
    return dict(
        dims=dims, p_max=64, max_steps=STEPS, eot=EOT, ts_begin=TS_BEGIN,
        no_speech_tok=NO_SPEECH, space_tok=SPACE,
    )


def _pool(dims, dtype=jnp.float32):
    t_pad = -(-dims.n_audio_ctx // 128) * 128
    shape = (dims.n_text_layer, B, dims.n_text_head, dims.head_dim, t_pad)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _enc_pool(dims):
    return jnp.zeros((B + 1, dims.n_audio_ctx, dims.n_audio_state), jnp.float32)



def _skv_pools(dims, aL, statics):
    """Self-KV/stat/token pools matching XKVGroupPool's per-group arrays."""
    Wc = 64 + statics["max_steps"] + 2
    K = int(aL.shape[0])
    T = dims.n_audio_ctx
    sshape = (dims.n_text_layer, B, Wc, dims.n_text_head, dims.head_dim)
    return (
        jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32),
        jnp.zeros((B, K, T), jnp.float32), jnp.zeros((B, K, T), jnp.float32),
        jnp.zeros((B, K, T), jnp.float32), jnp.zeros((B,), jnp.float32),
        jnp.zeros((B, dims.n_text_ctx), jnp.int32),
    )


ENC_LANES = None  # set per call: rows 1..B (0 is scratch)


def test_pooled_anchor_equals_legacy(setup):
    dims, params, suppress, aL, aH = setup
    audio = jnp.asarray(_audio(4.0))
    core = _core(dims, suppress, aL, aH, content=200)
    statics = _statics(dims)

    want = A.alignatt_tick(params, audio, *core, **statics)  # packed [B, 2S+5]

    k, v = _pool(dims)
    got = A.alignatt_tick_anchor_pooled(
        params, audio, k, v, _enc_pool(dims), *_skv_pools(dims, aL, statics),
        jnp.arange(1, B + 1, dtype=jnp.int32),
        jnp.arange(B, dtype=jnp.int32), *core, **statics
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got[0]))
    # pool rows were written (non-zero where the projection is non-zero)
    assert float(jnp.abs(got[1]).sum()) > 0
    # the prefill seeded the self-KV pool rows and gate stats
    assert float(jnp.abs(got[4]).sum()) > 0
    assert float(np.asarray(got[9]).min()) > 0  # acount = prefix_len + steps


def test_group_anchor_equals_legacy(setup):
    """Whole-group anchor (layer-scanned in-place pool rebuild) must decode
    identically to the legacy full-window program (bf16/f32 pool)."""
    dims, params, suppress, aL, aH = setup
    audio = jnp.asarray(_audio(4.0, seed=3))
    core = _core(dims, suppress, aL, aH, content=200)
    statics = _statics(dims)

    want = np.asarray(A.alignatt_tick(params, audio, *core, **statics))
    k, v = _pool(dims)
    got = A.alignatt_tick_anchor_group(
        params, audio, k, v, _enc_pool(dims), *_skv_pools(dims, aL, statics),
        jnp.arange(1, B + 1, dtype=jnp.int32), *core, **statics
    )
    gotp = np.asarray(got[0])
    # tokens/frames/stats bit-equal; no_speech_p (float bits, last column)
    # may drift 1 ulp: the pooled decode softmaxes over masked padding
    # columns, which reorders the f32 accumulation
    np.testing.assert_array_equal(want[:, :-1], gotp[:, :-1])
    np.testing.assert_allclose(
        want[:, -1].view(np.float32), gotp[:, -1].view(np.float32),
        rtol=1e-5, atol=1e-6,
    )
    # the rebuilt pool matches the reference projection
    enc = A._tick_front(params, audio, dims, False)
    from whisperlivekit_tpu.models.whisper import model as wm

    ref = wm.cross_kv(params, enc, dims, transposed=True)
    np.testing.assert_allclose(
        np.asarray(got[1])[..., : dims.n_audio_ctx], np.asarray(ref.k),
        rtol=2e-5, atol=2e-5,
    )


def test_pooled_inc_splices_per_spec(setup):
    """The pooled inc tick derives its own coordinates: columns
    [align128(win-128), +256) of the pool must equal the cross-KV
    projection of a 384-frame tail encoded at align128(win-128)-128 —
    re-derived independently here — and all other columns stay cached."""
    from whisperlivekit_tpu.ops.xkv_merge import W_SPLICE

    dims, params, suppress, aL, aH = setup
    statics = _statics(dims)
    audio6 = _audio(6.0, seed=1)
    audio_i16 = jnp.asarray(
        (np.clip(audio6, -1, 1 - 1 / 32768) * 32768.0).astype(np.int16)
    )
    content = 300  # win >= W_SPLICE: the splice window is [128, 384)
    core6 = _core(dims, suppress, aL, aH, content=content)

    tail_frames = 160
    enc_lanes = jnp.arange(1, B + 1, dtype=jnp.int32)
    k, v = _pool(dims)
    out = A.alignatt_tick_anchor_pooled(
        params, jnp.asarray(audio6), k, v, _enc_pool(dims),
        *_skv_pools(dims, aL, statics), enc_lanes,
        jnp.arange(B, dtype=jnp.int32), *core6, **statics,
    )
    k, v, enc_pool = out[1], out[2], out[3]
    before_k = np.asarray(k).copy()

    ts = content - tail_frames
    ws = content - 50 - 16
    inc = A.alignatt_tick_inc_pooled(
        params, audio_i16, k, v, enc_pool,
        jnp.arange(B, dtype=jnp.int32), enc_lanes,
        jnp.full((B,), ts, jnp.int32), jnp.full((B,), content, jnp.int32),
        jnp.full((B,), ws, jnp.int32),
        *core6, **statics, tail_frames=tail_frames,
    )
    got_k = np.asarray(inc[-3])
    rows_after = np.asarray(inc[-1])[1 : B + 1]  # updated cached rows
    dst0 = ((content - 128) // 128) * 128  # 128

    # the splice window must equal the projection of the UPDATED rows
    from whisperlivekit_tpu.models.whisper import model as wm

    ref = wm.cross_kv(
        params, jnp.asarray(rows_after[:, dst0 : dst0 + W_SPLICE]), dims,
        transposed=True,
    )
    np.testing.assert_allclose(
        got_k[:, :, :, :, dst0 : dst0 + W_SPLICE], np.asarray(ref.k),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(got_k[:, :, :, :, :dst0], before_k[:, :, :, :, :dst0])
    np.testing.assert_array_equal(
        got_k[:, :, :, :, dst0 + W_SPLICE :], before_k[:, :, :, :, dst0 + W_SPLICE :]
    )



def test_odd_tail_start_covers_newest_frame(setup):
    """tail_start rounds UP to even on device: with an odd plan tail_start
    the newest window frame must still be encoded and merged (a down-
    rounding variant silently fed frame win-1 a duplicate of win-2)."""
    dims, params, suppress, aL, aH = setup
    statics = _statics(dims)
    audio6 = _audio(6.0, seed=7)
    audio_i16 = jnp.asarray(
        (np.clip(audio6, -1, 1 - 1 / 32768) * 32768.0).astype(np.int16)
    )
    content, tail = 289, 160
    ts_plan = content - tail + 1  # 130 -> odd 130? ensure odd:
    ts_plan = ts_plan + (1 - ts_plan % 2)  # force odd
    core = _core(dims, suppress, aL, aH, content=content)
    k, v = _pool(dims)
    out = A.alignatt_tick_anchor_pooled(
        params, jnp.asarray(audio6), k, v, _enc_pool(dims),
        *_skv_pools(dims, aL, statics),
        jnp.arange(1, B + 1, dtype=jnp.int32),
        jnp.arange(B, dtype=jnp.int32), *core, **statics,
    )
    k, v, enc_pool = out[1], out[2], out[3]

    inc = A.alignatt_tick_inc_pooled(
        params, audio_i16, k, v, enc_pool,
        jnp.arange(B, dtype=jnp.int32), jnp.arange(1, B + 1, dtype=jnp.int32),
        jnp.full((B,), ts_plan, jnp.int32), jnp.full((B,), content, jnp.int32),
        jnp.full((B,), content - 40, jnp.int32),
        *core, **statics, tail_frames=tail,
    )
    rows_after = np.asarray(inc[-1])[1 : B + 1]

    # reference: encode from the even-rounded origin and check the newest
    # frame's row matches (not a stale/duplicated value)
    from whisperlivekit_tpu.models.whisper import model as wm

    ts_dev = ts_plan + (ts_plan & 1)
    S_tail = (tail + 1) * 320
    src = np.asarray(audio_i16).astype(np.float32) / 32768.0
    buf = np.zeros((B, S_tail), np.float32)
    seg = src[:, ts_dev * 320 : ts_dev * 320 + S_tail]
    buf[:, : seg.shape[1]] = seg
    mel = A.log_mel_spectrogram(
        jnp.asarray(buf), n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT
    )
    mel = A.pad_or_trim(mel, 2 * tail)
    enc_tail = wm.encode(params, mel, dims, pos_start=jnp.full((B,), ts_dev, jnp.int32))
    want_last = np.asarray(enc_tail)[:, content - 1 - ts_dev]
    np.testing.assert_allclose(
        rows_after[:, content - 1], want_last, rtol=1e-5, atol=1e-5
    )


def test_inactive_slots_write_nothing(setup):
    dims, params, suppress, aL, aH = setup
    statics = _statics(dims)
    audio5 = _audio(5.0, seed=2)
    audio_i16 = jnp.asarray(
        (np.clip(audio5, -1, 1 - 1 / 32768) * 32768.0).astype(np.int16)
    )
    core5 = _core(dims, suppress, aL, aH, content=280)
    # slot 1 inactive: win_frames = 0 must leave its pool row untouched
    win = jnp.asarray([280, 0], jnp.int32)
    k, v = _pool(dims)
    out = A.alignatt_tick_inc_pooled(
        params, audio_i16, k.at[:, 1].set(7.0), v.at[:, 1].set(7.0),
        _enc_pool(dims), jnp.arange(B, dtype=jnp.int32),
        jnp.arange(1, B + 1, dtype=jnp.int32),
        jnp.full((B,), 120, jnp.int32), win,
        jnp.full((B,), 150, jnp.int32),
        *core5, **statics, tail_frames=160,
    )
    np.testing.assert_array_equal(np.asarray(out[-3][:, 1]), 7.0)
    np.testing.assert_array_equal(np.asarray(out[-2][:, 1]), 7.0)
