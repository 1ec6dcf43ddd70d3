"""Native pcm_runtime vs numpy fallback equivalence."""

import numpy as np
import pytest

from whisperlivekit_tpu import native as N


@pytest.fixture(scope="module")
def lib():
    lib = N.get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


def test_s16_roundtrip(lib):
    rng = np.random.default_rng(0)
    audio = (0.8 * rng.standard_normal(10000)).clip(-1, 0.999).astype(np.float32)
    b = N.f32_to_s16le(audio)
    back = N.s16le_to_f32(b)
    np.testing.assert_allclose(back, audio, atol=1.0 / 32000)

    # match numpy reference conversion exactly
    ref = np.frombuffer(b, dtype="<i2").astype(np.float32) / 32768.0
    np.testing.assert_array_equal(back, ref)


def test_streaming_resampler_matches_offline(lib):
    rng = np.random.default_rng(1)
    sr_in = 48000
    audio = rng.standard_normal(sr_in).astype(np.float32)  # 1 s

    # streamed in uneven chunks
    rs = N.StreamingResampler(sr_in, 16000)
    outs = []
    i = 0
    for size in (480, 1333, 7, 4800, 10000, 100000):
        chunk = audio[i : i + size]
        if len(chunk) == 0:
            break
        outs.append(rs.process(chunk))
        i += len(chunk)
    streamed = np.concatenate(outs)

    # one-shot through a fresh resampler
    rs2 = N.StreamingResampler(sr_in, 16000)
    oneshot = rs2.process(audio)

    n = min(len(streamed), len(oneshot))
    assert n > 15000
    np.testing.assert_allclose(streamed[:n], oneshot[:n], atol=1e-6)


def test_resampler_rate_correct(lib):
    rs = N.StreamingResampler(44100, 16000)
    out = rs.process(np.zeros(44100, np.float32))
    assert abs(len(out) - 16000) < 8


def test_ring_buffer(lib):
    rb = N.RingBuffer(1024)
    data = np.arange(600, dtype=np.float32)
    assert rb.push(data) == 600
    assert len(rb) == 600
    out = rb.pop(100)
    np.testing.assert_array_equal(out, data[:100])
    assert len(rb) == 500
    # wrap-around
    assert rb.push(np.arange(500, dtype=np.float32)) == 500
    assert len(rb) == 1000
    rest = rb.pop(2000)
    assert len(rest) == 1000
    np.testing.assert_array_equal(rest[:500], data[100:])

    # capacity limit
    rb2 = N.RingBuffer(10)
    assert rb2.push(np.ones(20, np.float32)) == 10
    assert rb2.push(np.ones(5, np.float32)) == 0
