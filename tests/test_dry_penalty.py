"""DRY repetition penalty: vectorized in-graph implementation vs plain python.

The python oracle mirrors the reference algorithm
(reference align_att_base.py:492-537) exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlivekit_tpu.streaming.alignatt import dry_penalty

EOT = 50257


def oracle_penalties(seq):
    """reference _apply_dry_penalty's penalty dict for one sequence."""
    if len(seq) < 5:
        return {}
    last = seq[-1]
    if last >= EOT:
        return {}
    penalties = {}
    for i in range(len(seq) - 2, -1, -1):
        if seq[i] != last:
            continue
        next_tok = seq[i + 1]
        if next_tok >= EOT:
            continue
        length = 1
        while length < 50:
            j, k = i - length, len(seq) - 1 - length
            if j < 0 or k <= i:
                break
            if seq[j] != seq[k] or seq[j] >= EOT:
                break
            length += 1
        if next_tok not in penalties or length > penalties[next_tok]:
            penalties[next_tok] = length
    return {t: l for t, l in penalties.items() if l >= 2}


def apply_oracle(logits, seq):
    out = logits.copy()
    for tok, length in oracle_penalties(seq).items():
        out[tok] -= 1.0 * 2.0 ** (length - 2)
    return out


def run_case(seq, L=64, V=51865):
    buf = np.full(L, EOT, np.int32)
    buf[: len(seq)] = seq
    logits = np.zeros((1, V), np.float32)
    out = np.asarray(
        dry_penalty(jnp.asarray(logits), jnp.asarray(buf[None]), jnp.asarray([len(seq)]), EOT)
    )[0]
    ref = apply_oracle(np.zeros(V, np.float32), list(seq))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    return out


def test_no_repetition_no_penalty():
    out = run_case([10, 20, 30, 40, 50, 60])
    assert np.all(out == 0)


def test_simple_repetition_penalized():
    # "a b c a b c a b" — next after suffix ...a b would be c
    seq = [10, 20, 30, 10, 20, 30, 10, 20]
    out = run_case(seq)
    assert out[30] < 0  # c penalized


def test_long_run_heavier_penalty():
    seq = [7, 7, 7, 7, 7, 7, 7]
    out = run_case(seq)
    ref = apply_oracle(np.zeros(51865, np.float32), seq)
    assert out[7] == ref[7] < -1


def test_short_sequence_untouched():
    out = run_case([1, 2, 3, 4])
    assert np.all(out == 0)


def test_random_fuzz_vs_oracle():
    rng = np.random.default_rng(0)
    for _ in range(10):
        n = int(rng.integers(5, 40))
        seq = rng.integers(5, 12, n).tolist()  # small alphabet => repetitions
        run_case(seq)
