"""Bench dataset + report machinery (reference benchmark/datasets.py +
report.py roles), hermetic via the synthetic dataset."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from whisperlivekit_tpu.bench.datasets import REGISTRY, fetch
from whisperlivekit_tpu.bench.report import aggregate, build_report, render_table


def test_registry_covers_reference_corpora():
    names = set(REGISTRY)
    assert {"librispeech_clean", "librispeech_other", "ami_ihm", "synthetic"} <= names
    assert {n for n in names if n.startswith("mls_")} >= {"mls_fr", "mls_de", "mls_es"}
    assert any(n.startswith("fleurs_") for n in names)


def test_synthetic_fetch_and_manifest(tmp_path):
    samples = fetch("synthetic", n_samples=3, cache_dir=tmp_path)
    assert len(samples) == 3
    for s in samples:
        assert Path(s.audio_path).exists()
        assert s.reference
        assert s.language == "en"
    # second fetch comes from the manifest (no regeneration)
    manifest = tmp_path / "synthetic" / "manifest.json"
    before = manifest.stat().st_mtime_ns
    again = fetch("synthetic", n_samples=2, cache_dir=tmp_path)
    assert len(again) == 2
    assert manifest.stat().st_mtime_ns == before


def test_unknown_dataset():
    with pytest.raises(KeyError):
        fetch("nope")


def test_aggregate_and_table():
    results = [
        {"language": "en", "dataset": "librispeech_clean", "wer": 0.05, "rtf": 0.1,
         "duration_s": 10, "first_word_latency": 0.4},
        {"language": "en", "dataset": "librispeech_clean", "wer": 0.07, "rtf": 0.2,
         "duration_s": 20, "first_word_latency": 0.6},
        {"language": "fr", "dataset": "mls_fr", "wer": 0.10, "rtf": 0.3,
         "duration_s": 5, "first_word_latency": None},
    ]
    rows = aggregate(results)
    assert len(rows) == 2
    en = next(r for r in rows if r["language"] == "en")
    assert en["n"] == 2 and en["wer"] == 0.06 and en["audio_s"] == 30
    fr = next(r for r in rows if r["language"] == "fr")
    assert fr["first_word_s"] is None

    table = render_table(rows)
    assert "librispeech_clean" in table and "mls_fr" in table
    report = build_report(results, {"model": "x"})
    assert report["overall"]["n"] == 3


@pytest.mark.slow
def test_bench_cli_synthetic(tmp_path):
    """End-to-end: `wlk bench --dataset synthetic` over random dev-tiny."""
    out = tmp_path / "report.json"
    cmd = [
        sys.executable, "-m", "whisperlivekit_tpu.cli", "bench",
        "--dataset", "synthetic", "--n", "1", "--json", str(out),
        "--model-size", "random:dev-tiny", "--lan", "en", "--no-vac",
        "--log-level", "ERROR",
    ]
    env = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
           "WLK_BENCH_CACHE": str(tmp_path)}
    import os

    env = {**os.environ, **env}
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=900, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(out.read_text())
    assert report["overall"]["n"] == 1
    assert report["per_language"][0]["dataset"] == "synthetic"


def test_arm_temp_probe_matches_aot_readout():
    """The bench HBM precheck's temp figure must be the compiler's own
    number, not a blanket margin (VERDICT r4 task #6: the 3 GB guess passed
    the B=40 bf16 arm that then OOM'd). Pin the plumbing: _arm_temp_bytes
    == max over the two programs of the AOT memory_analysis temp size at
    the same shapes."""
    import jax
    import jax.numpy as jnp

    import bench
    from whisperlivekit_tpu.models.whisper import model as wm
    from whisperlivekit_tpu.models.whisper.dims import (
        MODEL_DIMS,
        default_alignment_heads,
    )
    from whisperlivekit_tpu.streaming import alignatt as A

    dims = MODEL_DIMS["dev-tiny"]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    K = len(default_alignment_heads(dims, None))
    B, tail = 4, 160
    got = bench._arm_temp_bytes(dims, B, jnp.bfloat16, K, tail, params)
    assert got is not None and got > 0

    # independent readout at the same shapes (the helper's contract)
    sds = jax.ShapeDtypeStruct
    p_sds = jax.tree.map(lambda x: sds(x.shape, x.dtype), params)
    L, H, Dh = dims.n_text_layer, dims.n_text_head, dims.head_dim
    T, d = dims.n_audio_ctx, dims.n_audio_state
    Tp = -(-T // 128) * 128
    Wc = (bench.SERVING_PREFIX_CAP + bench.SERVING_COMMIT_BUDGET
          + bench.DECODE_STEPS + 2)
    kv = sds((L, B, H, Dh, Tp), jnp.bfloat16)
    skv = sds((L, B, Wc, H, Dh), jnp.bfloat16)
    stat = sds((B, K, T), jnp.float32)
    i32 = lambda *s: sds(s, jnp.int32)  # noqa: E731
    pools = (
        sds((B, 16000 * 30), jnp.int16), kv, kv,
        sds((B + 1, T, d), jnp.bfloat16), skv, skv, stat, stat, stat,
        sds((B,), jnp.float32), i32(B, dims.n_text_ctx),
    )
    core_tail = (
        i32(B), i32(B), sds((B,), bool), i32(B),
        sds((dims.n_vocab,), jnp.float32),
        sds((K,), jnp.int32), sds((K,), jnp.int32),
        sds((), jnp.int32), sds((), jnp.int32), sds((), jnp.float32),
        sds((B,), bool), sds((d,), jnp.float32), sds((), jnp.float32),
    )
    statics = dict(
        dims=dims, max_steps=bench.DECODE_STEPS, eot=bench.EOT,
        ts_begin=bench.TS_BEGIN, no_speech_tok=bench.NO_SPEECH,
        space_tok=bench.SPACE,
    )
    t_inc = int(getattr(
        A.alignatt_tick_inc_skv.lower(
            p_sds, *pools, i32(B), i32(B), i32(B), i32(B), i32(B),
            i32(B, A.SKV_REFRESH_ROWS), i32(B, A.SKV_REFRESH_ROWS),
            i32(B), *core_tail, **statics, tail_frames=tail,
        ).compile().memory_analysis(), "temp_size_in_bytes", 0))
    t_anchor = int(getattr(
        A.alignatt_tick_anchor_group.lower(
            p_sds, *pools, i32(B),
            i32(B, bench.SERVING_PREFIX_CAP), i32(B), i32(B), *core_tail,
            **statics, p_max=bench.SERVING_PREFIX_CAP,
        ).compile().memory_analysis(), "temp_size_in_bytes", 0))
    assert got == max(t_inc, t_anchor)
