"""Every config knob must be wired to some behavior.

Round-2 verdict: ``qwen3_audio_backend`` was found dead once (commit
5724750) and several reference knobs silently warn-and-dropped — so this
test pins the whole surface: every ``WLKConfig`` field is referenced
somewhere in the package outside ``config.py``, and every reference-name
alias maps to a real field (reference config surface:
/root/reference/whisperlivekit/config.py).
"""

import dataclasses
import re
from pathlib import Path

from whisperlivekit_tpu.config import WLKConfig, _REFERENCE_ALIASES

PKG = Path(__file__).resolve().parent.parent / "whisperlivekit_tpu"

# Fields consumed outside the package source proper; each needs a reason.
EXEMPT = {
    "host": "server bind address — consumed by uvicorn in cli.py serve",
    "port": "server bind address — consumed by uvicorn in cli.py serve",
    "trim_sentence_buffer": "normalized into buffer_trimming in __post_init__",
}


def _package_source_without_config() -> str:
    chunks = []
    for p in sorted(PKG.rglob("*.py")):
        if p.name == "config.py":
            continue
        chunks.append(p.read_text())
    return "\n".join(chunks)


def test_every_config_field_is_reachable():
    src = _package_source_without_config()
    dead = []
    for f in dataclasses.fields(WLKConfig):
        if f.name in EXEMPT:
            continue
        # reachable = attribute access (config.<name>) or string key
        # (getattr / dict lookup / CLI dest) anywhere in the package
        pat = re.compile(
            r"\.%s\b|[\"']%s[\"']" % (re.escape(f.name), re.escape(f.name))
        )
        if not pat.search(src):
            dead.append(f.name)
    assert not dead, f"config fields with no consumer in the package: {dead}"


def test_every_alias_targets_a_real_field():
    names = {f.name for f in dataclasses.fields(WLKConfig)}
    # a "no_<field>" target routes through from_kwargs' negation pass
    names |= {f"no_{n}" for n in names}
    bad = {ref: tgt for ref, tgt in _REFERENCE_ALIASES.items() if tgt not in names}
    assert not bad, f"aliases pointing at nonexistent fields: {bad}"


def test_alias_migration_applies():
    cfg = WLKConfig.from_kwargs(qwen3_streaming_chunk_sec=3.0,
                                qwen3_streaming_prompt_context_words=5)
    assert cfg.qwen3_chunk_sec == 3.0
    assert cfg.qwen3_prompt_context_words == 5
