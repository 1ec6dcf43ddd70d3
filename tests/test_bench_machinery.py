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
