#!/usr/bin/env python
"""Download public assets (requires network): tokenizer BPE ranks, Silero VAD.

The framework vendors no binary assets; this script populates
$WLK_TPU_ASSET_DIR (default ~/.cache/wlk-tpu/assets) with:
- gpt2.tiktoken / multilingual.tiktoken (OpenAI Whisper BPE ranks)
- silero_vad.jit (Silero VAD v5/v6 weights)

Model weights are fetched separately with `wlk pull <size>`.
"""

from __future__ import annotations

import os
import sys
import urllib.request
from pathlib import Path

ASSETS = {
    "gpt2.tiktoken": (
        "https://raw.githubusercontent.com/openai/whisper/main/whisper/assets/gpt2.tiktoken"
    ),
    "multilingual.tiktoken": (
        "https://raw.githubusercontent.com/openai/whisper/main/whisper/assets/multilingual.tiktoken"
    ),
    "silero_vad.jit": (
        "https://github.com/snakers4/silero-vad/raw/master/src/silero_vad/data/silero_vad.jit"
    ),
}


def main() -> int:
    out_dir = Path(
        os.environ.get("WLK_TPU_ASSET_DIR", Path.home() / ".cache" / "wlk-tpu" / "assets")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    failed = 0
    for name, url in ASSETS.items():
        dest = out_dir / name
        if dest.exists():
            print(f"{name}: already present")
            continue
        try:
            print(f"{name}: downloading from {url}")
            urllib.request.urlretrieve(url, dest)
            print(f"{name}: -> {dest} ({dest.stat().st_size} bytes)")
        except Exception as e:
            failed += 1
            print(f"{name}: FAILED ({e})", file=sys.stderr)
    if not failed:
        print(f"\nDone. export WLK_TPU_ASSET_DIR={out_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
