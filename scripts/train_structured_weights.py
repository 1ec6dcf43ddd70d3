"""Train structured (non-random) Whisper weights on a synthetic aligned task.

Why this exists: the round-3 inc-vs-exact A/B (docs/perf/ab_inc_exact_r3.json)
measured 12.4% committed-token agreement at large-v3 — under RANDOM weights.
Random weights are the worst case for the incremental tail-encode: attention
is diffuse over the whole window, so tail-local attention against cached
anchor-time frames diverges maximally. The hypothesis separating
"random-weight chaos" from "the inc mode drops words" is attention SHARPNESS —
and sharpness is trainable without egress. This script builds it:

- a deterministic synthetic "language": a ~24-word vocabulary where each word
  is a distinct formant-synthesized syllable (word identity is carried by an
  (F1, F2) spectral pair, exactly how vowels carry identity in real speech);
- 30 s training windows containing 6-20 word events at random positions with
  silence gaps, labelled with the true token sequence in Whisper's serving
  prompt format (sot_sequence_including_notimestamps ... eot) — matching what
  `AlignAttSession.initial_tokens` feeds at inference
  (streaming/alignatt.py:2398);
- teacher-forced CE training via `whisperlivekit_tpu.parallel.train`
  (the sharded train step the driver's `dryrun_multichip` exercises; here on
  a 1-device mesh — this is that module's product consumer);
- an eval pass reporting greedy word-token accuracy AND cross-attention
  sharpness (mean max-probability of the alignment-head rows), the quantity
  the A/B's divergence depends on.

The checkpoint (npz, flat /-joined keys + dims name) is consumed by
scripts/ab_inc_exact.py --weights and scripts/bench_e2e_serving.py --weights,
with the paired event-stream audio generator below (events_audio) so the
model runs in-distribution.

Reference anchor: the reference adjudicates streaming-vs-batch divergence
with real-weight WER (reference tests/test_pipeline.py:120-139); this is the
zero-egress stand-in that makes attention sharp enough for the comparison to
transfer.

Usage (TPU host; base trains in ~3 min):
    python scripts/train_structured_weights.py --model base --steps 400 \
        --out /root/.cache/wlk-tpu/structured_base.npz
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SR = 16000
WIN_S = 30.0

# Candidate words; filtered at runtime to those that encode to ONE BPE token
# with a leading space (so committed-token streams compare word-for-word).
WORD_POOL = [
    "the", "and", "one", "two", "red", "blue", "green", "stone", "river",
    "light", "dark", "wind", "fire", "water", "earth", "moon", "sun",
    "bird", "tree", "road", "house", "door", "hand", "eye", "night", "day",
    "gold", "iron", "north", "south", "east", "west",
]


def word_vocab(tok, n_max: int = 24):
    """(words, token_ids) for pool words that are single tokens with ' '."""
    words, ids = [], []
    for w in WORD_POOL:
        enc = tok.encode(" " + w)
        if len(enc) == 1:
            words.append(w)
            ids.append(enc[0])
        if len(words) >= n_max:
            break
    return words, ids


# ---------------------------------------------------------------------------
# Syllable synthesis: each word is a fixed (F1, F2, pitch) triple on a grid.
# Analytic functions of absolute time so streamed chunks stitch continuously
# (same contract as bench_e2e_serving.speech_like).
# ---------------------------------------------------------------------------

def _word_formants(widx: int, n_words: int):
    g1 = widx % 5
    g2 = widx // 5
    F1 = 300.0 + 120.0 * g1          # 300..780 Hz
    F2 = 1000.0 + 350.0 * g2         # 1000..2400+ Hz
    pitch = 95.0 + 8.0 * (widx % 3)
    return F1, F2, pitch


def syllable(widx: int, n: int, t_abs: np.ndarray, n_words: int) -> np.ndarray:
    """Render one word's syllable over absolute-time samples ``t_abs``."""
    from scipy import signal

    F1, F2, pitch = _word_formants(widx, n_words)
    src = signal.sawtooth(2 * np.pi * pitch * t_abs, width=0.9)
    y = src
    for F, bw in ((F1, 90.0), (F2, 120.0), (2800.0, 200.0)):
        r = np.exp(-np.pi * bw / SR)
        th = 2 * np.pi * F / SR
        y = signal.lfilter([1 - r], [1, -2 * r * np.cos(th), r * r], y)
    # raised-cosine onset/offset envelope over the event duration
    u = np.linspace(0, 1, n)
    env = np.sin(np.pi * np.clip(u, 0, 1)) ** 0.5
    return (y * env * 40.0).astype(np.float32)


EVENT_S = 0.55          # syllable duration
CADENCE_S = 1.0         # fixed word cadence


def schedule(seed: int, horizon_s: float, n_words: int, start_s: float = 0.25):
    """Deterministic event schedule [(t_start, word_idx), ...] up to horizon.

    Cadence is FIXED (one word per second at a constant offset): output
    position k then corresponds to a fixed audio region, so from-scratch
    training discovers the audio->token mapping quickly — with jittered
    gaps the 74M model sat at the word-marginal loss (~2.85 = 32/36·ln 24)
    for 1000+ steps because monotonic-alignment discovery dominates the
    optimization. Identifying WHICH word fills each slot still requires
    reading the right 0.55 s audio segment through cross-attention, which
    is the sharp-locality property the inc-vs-exact adjudication needs."""
    rng = np.random.default_rng(seed)
    out, t = [], start_s
    while t + EVENT_S < horizon_s:
        out.append((t, int(rng.integers(0, n_words))))
        t += CADENCE_S
    return out

def render_events(events, seconds: float, t0: float, n_words: int) -> np.ndarray:
    """Render the audio of ``events`` over [t0, t0+seconds) absolute time."""
    n = int(SR * seconds)
    out = 0.004 * np.random.default_rng(
        (int(round(t0 * SR)), 777)).standard_normal(n).astype(np.float32)
    for (ts, widx) in events:
        te = ts + EVENT_S
        if te <= t0 or ts >= t0 + seconds:
            continue
        ne = int(EVENT_S * SR)
        t_evt = ts + np.arange(ne) / SR      # absolute time over the event
        wav = syllable(widx, ne, t_evt, n_words)
        lo = int(round((ts - t0) * SR))
        src_lo = max(0, -lo)
        dst_lo = max(0, lo)
        dst_hi = min(n, lo + ne)
        if dst_hi > dst_lo:
            out[dst_lo:dst_hi] += wav[src_lo : src_lo + (dst_hi - dst_lo)]
    return out


def events_audio(seconds: float, seed: int, t0: float, n_words: int = 24,
                 horizon_s: float = 1e4) -> np.ndarray:
    """Streaming chunk API used by the A/B harnesses (chunks stitch)."""
    return render_events(
        schedule(seed, horizon_s, n_words), seconds, t0, n_words
    )


def events_words(seed: int, t_lo: float, t_hi: float, words,
                 horizon_s: float = 1e4):
    """Ground-truth words fully inside [t_lo, t_hi) (for WER-style checks)."""
    return [
        words[w] for (ts, w) in schedule(seed, horizon_s, len(words))
        if ts >= t_lo and ts + EVENT_S <= t_hi
    ]


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

_MEL_JIT = {}


def _mel_batch(audio: np.ndarray, n_mels: int) -> np.ndarray:
    """One jitted batched log-mel call: eager per-op jnp on axon pays a
    ~40 ms tunnel round-trip PER OP, which made per-example mel the
    dataset-generation bottleneck."""
    import jax

    from whisperlivekit_tpu.audio.mel import log_mel_spectrogram

    key = (audio.shape, n_mels)
    if key not in _MEL_JIT:
        _MEL_JIT[key] = jax.jit(
            lambda a: log_mel_spectrogram(a, n_mels=n_mels))
    return np.asarray(_MEL_JIT[key](audio), np.float32)


def make_batch(tok, word_ids, n_words, seeds, tok_len: int, n_mels: int):
    """(mel [B, n_mels, 3000] f32, tokens [B, tok_len] int32 with -1 pad)."""
    prompt = list(tok.sot_sequence_including_notimestamps)
    audio, toks = [], []
    for s in seeds:
        ev = schedule(int(s), WIN_S - 1.0, n_words)
        audio.append(render_events(ev, WIN_S, 0.0, n_words))
        seq = prompt + [word_ids[w] for (_, w) in ev] + [tok.eot]
        seq = seq[:tok_len] + [-1] * max(0, tok_len - len(seq))
        toks.append(seq)
    return _mel_batch(np.stack(audio), n_mels), np.asarray(toks, np.int32)


def build_dataset(tok, word_ids, n_words, n_batches: int, batch: int,
                  tok_len: int, n_mels: int, model: str) -> tuple:
    """Pregenerate (and disk-cache) the training set: the scipy formant
    synthesis costs ~0.5 s/example on host, which starved the TPU at
    ~4.3 s/step when generated per step — pregenerating returns the step
    time to device speed and reusing examples across epochs is fine (the
    task is deliberately low-entropy)."""
    cache = Path(f"/root/.cache/wlk-tpu/structured_ds_v2_{model}_"
                 f"{n_batches}x{batch}_{n_words}w_{tok_len}t.npz")
    if cache.exists():
        z = np.load(cache)
        return z["mel"].astype(np.float32), z["tokens"]
    mels = np.zeros((n_batches, batch, n_mels, 3000), np.float16)
    toks = np.zeros((n_batches, batch, tok_len), np.int32)
    t0 = time.time()
    for i in range(n_batches):
        seeds = 10_000 + np.arange(batch) + batch * i
        m, t = make_batch(tok, word_ids, n_words, seeds, tok_len, n_mels)
        mels[i], toks[i] = m.astype(np.float16), t
        if i % 16 == 0:
            print(f"[data] batch {i}/{n_batches} ({time.time()-t0:.0f}s)",
                  flush=True)
    cache.parent.mkdir(parents=True, exist_ok=True)
    np.savez(cache, mel=mels, tokens=toks)
    print(f"[data] cached {cache}", flush=True)
    return mels.astype(np.float32), toks


def save_params(params, dims_name: str, path: Path) -> None:
    import jax

    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        flat[key] = np.asarray(leaf)
    np.savez(path, __dims__=dims_name, **flat)


def load_params(path: str):
    """Rebuild the params pytree (bf16) from an npz written by save_params."""
    import jax.numpy as jnp
    import ml_dtypes

    z = np.load(path)
    dims_name = str(z["__dims__"])
    tree: dict = {}
    for key in z.files:
        if key == "__dims__":
            continue
        node = tree
        parts = key.split("/")
        a = z[key]
        if a.dtype.kind == "V" and a.dtype.itemsize == 2:
            # np.savez round-trips bf16 as a raw 2-byte void dtype (numpy
            # has no native bfloat16); reinterpret via ml_dtypes
            a = a.view(ml_dtypes.bfloat16)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(a, jnp.bfloat16)
    return tree, dims_name


def greedy_eval(params, dims, tok, word_ids, n_words, seeds, tok_len):
    """Teacher-free greedy decode accuracy + alignment-head sharpness."""
    import jax
    import jax.numpy as jnp

    from whisperlivekit_tpu.models.whisper import model as wm
    from whisperlivekit_tpu.models.whisper.dims import default_alignment_heads
    mel, tokens = make_batch(tok, word_ids, n_words, seeds, tok_len, dims.n_mels)
    B = mel.shape[0]
    enc = wm.encode_jit(params, jnp.asarray(mel), dims)
    xkv = wm.cross_kv_jit(params, enc, dims)
    cache = wm.init_cache(dims, B, dtype=enc.dtype, width=tok_len + 8)
    prompt = jnp.asarray(
        [list(tok.sot_sequence_including_notimestamps)] * B, jnp.int32)
    logits, _, cache = wm.decode_jit(
        params, prompt, jnp.zeros((B,), jnp.int32), xkv, cache, dims)
    pos = jnp.full((B,), prompt.shape[1], jnp.int32)
    cur = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    outs = [cur]
    # sharpness over the upper-half-layer fallback head set — the trained
    # checkpoint is served with this set (published tables index heads of
    # the OpenAI checkpoints, meaningless for fresh weights)
    align = wm.AlignSpec.from_pairs(default_alignment_heads(dims))
    sharp = []
    for _ in range(tok_len - prompt.shape[1]):
        logits, aprob, cache = wm.decode_jit(
            params, cur[:, None], pos, xkv, cache, dims, align)
        if aprob is not None:
            sharp.append(float(jnp.mean(jnp.max(aprob, axis=-1))))
        cur = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        outs.append(cur)
        pos = pos + 1
    hyp = np.stack([np.asarray(o) for o in outs], 1)  # [B, S]
    n_ok = n_tot = 0
    P = prompt.shape[1]
    for b in range(B):
        ref = [t for t in tokens[b][P:] if t >= 0]
        h = []
        for t in hyp[b]:
            h.append(int(t))
            if t == tok.eot:
                break
        n_tot += len(ref)
        n_ok += sum(1 for x, y in zip(h, ref) if x == y)
    return (n_ok / max(n_tot, 1),
            float(np.mean(sharp)) if sharp else None)


def align_scaffold(params, dims, prompt_len: int):
    """Alignment-scaffolded init: from-scratch encoder-decoder ASR spends
    thousands of steps DISCOVERING monotonic alignment before any word
    becomes learnable (measured: base and tiny both sat at the word-marginal
    loss for 1000+ steps on this task). Scaffold it instead:

    - decoder pos_emb row p := the ENCODER's sinusoid row at the audio frame
      of the word that position p reads (fixed cadence makes that a pure
      function of p);
    - tie each cross-attention's q/k projections at init: for W ~ N(0, 1/d),
      W W^T ≈ I, so score(s,t) ≈ pos_s · enc_t — and enc_t retains its
      additive sinusoid through the residual stream — i.e. cross-attention
      STARTS pointed at the right frames and training merely sharpens it.

    This manufactures exactly the experimental variable the adjudication
    needs (sharp, local, correct attention); everything else trains
    normally."""
    from whisperlivekit_tpu.models.whisper.model import sinusoids

    d = dims.n_text_state
    pe = np.asarray(sinusoids(dims.n_audio_ctx, d), np.float32)
    pos = np.zeros((dims.n_text_ctx, d), np.float32)
    for p in range(dims.n_text_ctx):
        # row p holds input token w_j for j = p - prompt_len; the AlignAtt
        # gate reads THAT row's attention as "where is w_j's audio", so the
        # scaffold (like the supervision in align_windows) points it at
        # word j's own frames, not the next word's
        j = p - prompt_len
        fr = int((0.25 + j * CADENCE_S + EVENT_S / 2) * 50)
        if j >= 0 and fr < dims.n_audio_ctx:
            pos[p] = pe[fr]
    import jax.numpy as jnp

    params["decoder"]["pos_emb"] = jnp.asarray(pos, params["decoder"]["pos_emb"].dtype)
    blocks = params["decoder"]["blocks"]
    # jnp.copy: q.w and k.w must be DISTINCT buffers — the train step donates
    # the params pytree, and donating one buffer twice is an InvalidArgument
    blocks["cross"]["q"]["w"] = jnp.copy(blocks["cross"]["k"]["w"])
    # Tie the ENCODER self-attention q/k too: scores ≈ h·hᵀ at init, and h
    # carries its additive positional sinusoid, so encoder attention starts
    # self-peaked (local). Encoder locality is the property the incremental
    # tail-encode's accuracy depends on — the scaffold starts it local and
    # the task (word identity is local) keeps it there.
    eb = params["encoder"]["blocks"]
    eb["attn"]["q"]["w"] = jnp.copy(eb["attn"]["k"]["w"])
    return params


def align_windows(prompt_len: int, tok_len: int, n_events: int):
    """Per-input-row supervision windows (lo, hi) [S] int32, -1 = none.

    Input row s holds token ``inputs[s]``; for s = prompt_len + j that is
    word j, whose query row the AlignAtt gate reads — supervise it to the
    frames of word j's audio event (fixed cadence: t = 0.25 + j)."""
    S = tok_len - 1
    lo = np.full((S,), -1, np.int32)
    hi = np.full((S,), -1, np.int32)
    for j in range(n_events):
        s = prompt_len + j
        if s >= S:
            break
        lo[s] = int((0.25 + j * CADENCE_S) * 50)
        hi[s] = min(int((0.25 + j * CADENCE_S + EVENT_S) * 50) + 1, 1500)
    return lo, hi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="base")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dataset-batches", type=int, default=64,
                    help="pregenerated batches cycled across epochs")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--tok-len", type=int, default=48)
    ap.add_argument("--n-words", type=int, default=24)
    ap.add_argument("--no-scaffold", action="store_true",
                    help="disable the alignment-scaffolded init")
    ap.add_argument("--align-weight", type=float, default=1.0,
                    help="weight of the attention-supervision loss on the "
                    "serving gate's head set (0 disables)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--out-native", default=None,
                    help="also write a native orbax checkpoint dir "
                    "(loadable via --model-path)")
    ap.add_argument("--report", default=None, help="write a JSON training report")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from whisperlivekit_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()
    from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
    from whisperlivekit_tpu.models.whisper.tokenizer import get_tokenizer
    from whisperlivekit_tpu.parallel import train as T

    dims = MODEL_DIMS[args.model]
    tok = get_tokenizer(not args.model.endswith(".en"), language="en",
                        task="transcribe")
    words, word_ids = word_vocab(tok, args.n_words)
    n_words = len(words)
    print(f"[train] {args.model}: {n_words}-word vocab: {words}", flush=True)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    import optax

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(200, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.05,
    )
    tx = T.make_optimizer(sched)
    state = T.init_train_state(dims, mesh, tx, dtype=jnp.float32)
    if not args.no_scaffold:
        prompt_len = len(tok.sot_sequence_including_notimestamps)
        state = state._replace(
            params=align_scaffold(state.params, dims, prompt_len))

    mels, tokens_all = build_dataset(
        tok, word_ids, n_words, args.dataset_batches, args.batch,
        args.tok_len, dims.n_mels, args.model)

    if args.align_weight > 0:
        # supervise the exact head set the serving gate reads for fresh
        # checkpoints (upper-half layers, all heads)
        from whisperlivekit_tpu.models.whisper import model as wm
        from whisperlivekit_tpu.models.whisper.dims import (
            default_alignment_heads,
        )

        align = wm.AlignSpec.from_pairs(default_alignment_heads(dims))
        n_events = len(schedule(0, WIN_S - 1.0, n_words))
        lo, hi = align_windows(
            len(tok.sot_sequence_including_notimestamps), args.tok_len,
            n_events)
        lo_j, hi_j = jnp.asarray(lo), jnp.asarray(hi)
        aw = float(args.align_weight)
        step_fn = jax.jit(
            lambda st, mel, tokens: T.train_step(
                st, mel, tokens, dims, tx, align, lo_j, hi_j, aw),
            donate_argnums=(0,),
        )
    else:
        step_fn = jax.jit(
            lambda st, mel, tokens: T.train_step(st, mel, tokens, dims, tx),
            donate_argnums=(0,),
        )
    t0 = time.time()
    losses = []
    for i in range(args.steps):
        j = i % args.dataset_batches
        state, loss = step_fn(
            state, jnp.asarray(mels[j]), jnp.asarray(tokens_all[j]))
        losses.append(float(loss))
        if i % 50 == 0 or i == args.steps - 1:
            print(f"[train] step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # eval on held-out seeds
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        state.params)
    acc, sharp = greedy_eval(
        params_bf16, dims, tok, word_ids, n_words,
        seeds=90_000 + np.arange(8), tok_len=args.tok_len)
    print(f"[train] greedy token accuracy (held-out): {acc:.3f}  "
          f"align sharpness: {sharp}", flush=True)

    out = args.out or f"/root/.cache/wlk-tpu/structured_{args.model}.npz"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    save_params(params_bf16, args.model, Path(out))
    print(f"[train] saved {out}", flush=True)
    if args.out_native:
        # native orbax checkpoint: loadable through the PRODUCT surface
        # (`wlk serve --model-path <dir>` / TestHarness model_dir), so the
        # e2e quality harness runs structured weights end-to-end
        from whisperlivekit_tpu.models.whisper.load import save_native

        save_native(params_bf16, dims, args.out_native)
        print(f"[train] saved native checkpoint {args.out_native}", flush=True)
    if args.report:
        Path(args.report).write_text(json.dumps({
            "model": args.model, "steps": args.steps, "batch": args.batch,
            "lr": args.lr, "n_words": n_words,
            "loss_first": losses[0], "loss_last": losses[-1],
            "loss_p10_last": float(np.mean(losses[-10:])),
            "greedy_token_accuracy": round(acc, 4),
            "align_sharpness_mean_maxp": sharp,
            "wall_s": round(time.time() - t0, 1),
            "out": out,
        }, indent=2) + "\n")


if __name__ == "__main__":
    main()
