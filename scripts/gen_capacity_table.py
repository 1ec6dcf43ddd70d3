"""Generate docs/perf/CAPACITY.md — the ONE place capacity claims live.

VERDICT r3 weak #7: three documents carried independently-stale copies of
the headline streams-per-chip number, which is how a regressed benchmark
shipped under docs still claiming "north-star MET". Now:

- `python bench.py --out docs/perf/capacity_rN.json --round N` writes the
  measured sweep artifact;
- this script renders it to docs/perf/CAPACITY.md (stamped with the round,
  device, and source file);
- README.md / COVERAGE.md / docs/perf/README.md REFERENCE the table instead
  of carrying numbers.

Usage:
    python scripts/gen_capacity_table.py docs/perf/capacity_r4.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

NORTH_STAR = 64  # BASELINE.json: >=64 real-time large-v3 streams per chip


def render(art: dict, src_name: str) -> str:
    subs = art["sub_metrics"]
    head = art["headline"]
    # Both north-star clauses (BASELINE.json): >=64 streams AND p50
    # word-emission <= 500 ms. bench.py's peak picker enforces the latency
    # clause (LATENCY_P50_BUDGET_S), so `headline.value` is the
    # latency-honest peak; the unconstrained max is reported alongside.
    hl_tick = subs.get("large-v3_peak_tick_ms")
    hl_raw = subs.get("large-v3_peak_streams_unconstrained")
    lines = [
        "# Capacity (generated — do not edit)",
        "",
        f"Source: `{src_name}` (bench.py sweep, round {art.get('round')}, "
        f"device {art.get('device')}).",
        f"Regenerate with `python scripts/gen_capacity_table.py {src_name}`.",
        "",
        f"**Headline: {head['value']} concurrent real-time large-v3 streams "
        f"per chip at <= 500 ms p50 tick latency**"
        + (f" (amortized tick {hl_tick} ms; " if hl_tick is not None else " (")
        + f"{head['vs_baseline']}x the reference's best large-model "
        "streaming figure — faster-whisper SimulStreaming large-v3-turbo "
        "compute-aware RTF 0.144 on H100, BASELINE.md). "
        + (
            f"Unconstrained peak ignoring the latency clause: "
            f"{hl_raw} streams. "
            if hl_raw is not None and hl_raw != head["value"]
            else ""
        )
        + (
            f"North-star (>= {NORTH_STAR} @ large-v3 AND p50 <= 500 ms): "
            "**MET**."
            if head["value"] >= NORTH_STAR
            else f"North-star (>= {NORTH_STAR} @ large-v3 AND p50 <= 500 ms): "
            "**NOT MET**."
        ),
        "",
        "| model | B | pool | inc tick | anchor | amortized | streams |",
        "|---|---|---|---|---|---|---|",
    ]
    peaks = []
    for key, v in subs.items():
        if key.endswith("_peak_streams"):
            peaks.append((key[: -len("_peak_streams")], v))
            continue
        if key.endswith("_peak_streams_unconstrained") or key.endswith(
            "_peak_tick_ms"
        ):
            continue
        model, Bs, dt = key.rsplit("_", 2)
        if not isinstance(v, dict):
            lines.append(f"| {model} | {Bs[1:]} | {dt} | — | — | — | {v} |")
            continue
        lines.append(
            f"| {model} | {Bs[1:]} | {dt} | {v['inc_ms']} ms | "
            f"{v['anchor_ms']} ms | {v['amortized_ms']} ms | "
            f"**{v['streams']}** |"
        )
    lines.append("")
    for model, v in peaks:
        tick = subs.get(f"{model}_peak_tick_ms")
        raw = subs.get(f"{model}_peak_streams_unconstrained")
        extra = f" (amortized tick {tick} ms)" if tick is not None else ""
        if raw is not None and raw != v:
            extra += f"; unconstrained {raw}"
        lines.append(f"- {model} peak @ <= 500 ms p50: **{v} streams**{extra}")
    lines += [
        "",
        "Capacity model: streams = B / amortized tick time; one tick consumes "
        "1 s of audio per lane; whole-group re-anchor amortized once per "
        "eviction block (15 ticks). Pool dtypes: bf16 = bitwise-exact pooled "
        "ticks; f8 = f8_e4m3 cross-KV pool (capacity mode); f8d = f8 pool + "
        "weight-only f8 decoder linears (quality-gated separately, "
        "docs/perf/INC_ENCODE_ADJUDICATION.md). `SKIPPED` arms failed the "
        "resident-pool HBM budget precheck and are configurations the "
        "serving allocator would never build.",
        "",
        "History: r1 24.9 -> r2 73.5 -> r3 58.9 (self-KV pool sized to the "
        "top prefix bucket regressed the tick and OOM'd B=32; see "
        "docs/perf/probe_skv_width.json) -> r4 re-won with the "
        "serving-prefix-cap sizing fix (79.9 unconstrained at B=48, 601 ms "
        "tick — over the latency budget) -> r5 headline is the "
        "latency-constrained peak (bench.py enforces the 500 ms clause in "
        "peak selection) and the pool carries serving_commit_budget rows "
        "(~5 tick-model streams spent to stop mid-epoch head trims from "
        "running the padded full-width refresh every group tick — bought "
        "measured e2e from 0 sustained (r3/r4) to 32). Note the B=32 f8 "
        "tick-model optimum does NOT transfer to serving defaults: one "
        "width-32 group measures worse end-to-end than two 24-wide groups "
        "under real anchor churn (docs/perf/e2e_width32_r5.json), so the "
        "auto lane cap stays 24 (engine/scheduler.py:_auto_lane_cap).",
    ]
    return "\n".join(lines) + "\n"


def e2e_section() -> list:
    """Append the measured end-to-end serving co-headline (VERDICT r4 task
    #3: the e2e number lives NEXT TO the tick-model number, and when they
    disagree the attribution counters say why)."""
    candidates = sorted(
        Path("docs/perf").glob("e2e_serving_r*.json"),
        key=lambda p: p.stat().st_mtime,
    )
    if not candidates:
        return []
    src = candidates[-1]  # newest sweep is the committed truth
    d = json.loads(src.read_text())
    lines = [
        "",
        "## Measured end-to-end serving (same chip, live sessions)",
        "",
        f"Source: `{src.name}` (scripts/bench_e2e_serving.py — real asyncio "
        "sessions through the scheduler: staggered admission, VAD, "
        "real-time audio pacing, word emission on the session clock; "
        "5-minute measured windows).",
        "",
        f"- **{d['max_sustained_streams_at_500ms_p50']} streams at "
        "<= 500 ms p50 word-emission** (the north-star latency clause, "
        "measured end-to-end rather than tick-modeled)",
        f"- **{d['max_sustained_streams']} streams sustained** (drift "
        "criterion: emission lag not growing)",
        "",
        "| n | keep up | word p50 | word p95 | sched tick p50 |",
        "|---|---|---|---|---|",
    ]
    for r in d["runs"]:
        s = r["scheduler"]
        lines.append(
            f"| {r['n_sessions']} | {r['keep_up']} | "
            f"{r['word_emission_p50_ms']:.0f} ms | "
            f"{r['word_emission_p95_ms']:.0f} ms | {s['tick_ms_p50']:.0f} ms |"
        )
    lines += [
        "",
        "The gap to the tick model is attributed, not guessed, by the "
        "committed counters in the artifact (`anchor_reasons`, "
        "`tick_phases`, lanes-per-call): the random-weight streams' "
        "pathological text dynamics (hallucination rewind-guard resets, "
        "commit bursts) force re-anchors and full-width refresh programs "
        "that trained-weight speech does not (docs/perf/README.md, "
        '"End-to-end serving vs the tick model").',
    ]
    return lines


def main() -> None:
    if len(sys.argv) > 1:
        src = Path(sys.argv[1])
    else:
        caps = sorted(
            Path("docs/perf").glob("capacity_r*.json"),
            key=lambda p: p.stat().st_mtime,
        )
        if not caps:
            raise SystemExit("no docs/perf/capacity_r*.json artifact found")
        src = caps[-1]  # newest sweep is the committed truth
    art = json.loads(src.read_text())
    out = Path("docs/perf/CAPACITY.md")
    out.write_text(render(art, src.name) + "\n".join(e2e_section()) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
