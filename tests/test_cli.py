"""CLI surface tests: transcribe, check, models, diagnose, arg parsing."""

import json
import subprocess
import sys
import wave
from pathlib import Path

import numpy as np
import pytest

from conftest import REPO_ROOT, reference_asset

needs_vocab = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)

# Disable the axon TPU plugin in subprocesses (it overrides JAX_PLATFORMS).
CLI_ENV_FLAGS = dict(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")


def make_wav(path: Path, seconds=2.0):
    t = np.arange(int(16000 * seconds)) / 16000
    sig = 0.3 * np.sin(2 * np.pi * 220 * t)
    pcm = (sig * 32767).astype("<i2").tobytes()
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm)


def run_cli(*args, timeout=600):
    import os

    env = dict(os.environ)
    env.update(CLI_ENV_FLAGS)
    return subprocess.run(
        [sys.executable, "-m", "whisperlivekit_tpu.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        env=env,
        timeout=timeout,
    )


def test_parse_args_defaults():
    from whisperlivekit_tpu.cli_args import parse_args

    cfg = parse_args([])
    assert cfg.model_size == "base"
    assert cfg.backend_policy == "simulstreaming"
    cfg = parse_args(["--model-size", "small.en", "--no-vac", "--port", "9000"])
    assert cfg.model_size == "small.en"
    assert cfg.lan == "en"  # .en implies english
    assert cfg.vac is False
    assert cfg.port == 9000
    cfg = parse_args(["--backend-policy", "2"])
    assert cfg.backend_policy == "localagreement"
    cfg = parse_args(["--language", "fr", "--model", "tiny"])
    assert cfg.lan == "fr" and cfg.model_size == "tiny"


def test_models_and_check():
    r = run_cli("models")
    assert r.returncode == 0
    assert "large-v3" in r.stdout and "tiny" in r.stdout
    r = run_cli("check")
    assert "jax:" in r.stdout
    assert "device matmul: ok" in r.stdout


@needs_vocab
def test_transcribe_command(tmp_path):
    wav = tmp_path / "t.wav"
    make_wav(wav)
    r = run_cli(
        "transcribe", str(wav), "--output-format", "json",
        "--model-size", "random:dev-tiny", "--lan", "en",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.loads(r.stdout)
    assert "text" in data and "lines" in data


@needs_vocab
def test_diagnose_command(tmp_path):
    wav = tmp_path / "t.wav"
    make_wav(wav, seconds=3.0)
    r = run_cli(
        "diagnose", str(wav), "--model-size", "random:dev-tiny", "--lan", "en",
    )
    # random weights may legitimately produce empty output -> nonzero exit,
    # but the health-check report must print.
    assert "rtf_under_2" in r.stdout, r.stderr[-2000:]
    assert "timing_monotonic" in r.stdout
