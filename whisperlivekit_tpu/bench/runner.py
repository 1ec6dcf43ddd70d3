"""`wlk bench`: quality/latency benchmark over audio files.

Reference parity: benchmark/runner.py:15-180 + report.py — run samples
through the in-process TestHarness, report WER / RTF / first-word latency /
per-call ASR latency, with JSON export. Datasets are local files here
(reference auto-downloads LibriSpeech/MLS/FLEURS/AMI; zero-egress hosts pass
--audio FILE --ref TEXTFILE pairs or a directory).
"""

from __future__ import annotations

import asyncio
import json
import sys
import time
from pathlib import Path
from typing import List, Optional

from ..harness.wer import compute_wer


def _pairs_from_dir(d: Path) -> List[tuple]:
    pairs = []
    for wav in sorted(d.glob("*.wav")):
        txt = wav.with_suffix(".txt")
        pairs.append((wav, txt if txt.exists() else None))
    return pairs


async def bench_one(path: Path, ref_text: Optional[str], config, speed: float) -> dict:
    from ..harness.harness import TestHarness
    from dataclasses import asdict

    kw = asdict(config)
    kw["pcm_input"] = True

    first_word_latency = None
    t_start = time.perf_counter()

    async with TestHarness(**kw) as h:
        t_feed0 = time.perf_counter()

        def on_update(state):
            nonlocal first_word_latency
            if first_word_latency is None and state.text.strip():
                first_word_latency = time.perf_counter() - t_feed0

        h.on_update(on_update)
        await h.feed(str(path), speed=speed)
        await h.drain(1.0)
        final = await h.finish(timeout=300)
        processing = time.perf_counter() - t_feed0
        audio_s = h.audio_position
        out = {
            "file": str(path),
            "audio_s": round(audio_s, 2),
            "processing_s": round(processing, 2),
            "rtf": round(processing / audio_s, 4) if audio_s else None,
            "first_word_latency_s": round(first_word_latency, 3)
            if first_word_latency
            else None,
            "text": final.text,
            "metrics": h.metrics.to_dict(),
        }
        if ref_text:
            out["wer"] = round(compute_wer(ref_text, final.text)["wer"], 4)
        return out


def main(argv: List[str]) -> int:
    from ..cli import _pop_flag
    from ..cli_args import parse_args

    audio = _pop_flag(argv, "--audio")
    ref = _pop_flag(argv, "--ref")
    dataset_dir = _pop_flag(argv, "--dataset-dir")
    out_json = _pop_flag(argv, "--json")
    speed = float(_pop_flag(argv, "--speed", "0"))
    config = parse_args(argv)

    pairs: List[tuple] = []
    if audio:
        pairs.append((Path(audio), Path(ref) if ref else None))
    elif dataset_dir:
        pairs = _pairs_from_dir(Path(dataset_dir))
    if not pairs:
        print(
            "usage: wlk bench --audio FILE [--ref TEXT_FILE] | --dataset-dir DIR "
            "[--speed 0|1] [--json OUT] [flags]",
            file=sys.stderr,
        )
        return 2

    results = []
    for wav, txt in pairs:
        ref_text = txt.read_text().strip() if txt else None
        res = asyncio.run(bench_one(wav, ref_text, config, speed))
        results.append(res)
        wer = f" wer={res['wer']:.3f}" if "wer" in res else ""
        print(
            f"{wav.name}: rtf={res['rtf']}{wer} "
            f"first_word={res['first_word_latency_s']}s",
            file=sys.stderr,
        )

    rtfs = [r["rtf"] for r in results if r["rtf"]]
    summary = {
        "n_samples": len(results),
        "avg_rtf": round(sum(rtfs) / len(rtfs), 4) if rtfs else None,
        "avg_wer": round(
            sum(r["wer"] for r in results if "wer" in r)
            / max(sum(1 for r in results if "wer" in r), 1),
            4,
        )
        if any("wer" in r for r in results)
        else None,
        "results": results,
    }
    if out_json:
        Path(out_json).write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items() if k != "results"}))
    return 0
