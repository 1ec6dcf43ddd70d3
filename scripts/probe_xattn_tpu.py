"""Isolate the cross-attention read path of the large-v3 decode step.

The decode while_loop measures ~16-24 ms/step at B=16 against a ~5-8 ms
bandwidth floor (docs/perf/README.md "remaining wall"). Per-step traffic is
dominated by the cross-KV stream: 32 layers x [B,1500,H,Dh] x2. Hypotheses:

  H1. the f8->bf16 `astype` inside the scan materializes a full bf16 copy
      per layer (write + re-read by the dot) -> 2.5x the f8 traffic;
  H2. [.., H=20, Dh=64] minor dims force (8,128) tile padding 64->128 and
      strided per-head reads -> up to 2x read amplification;
  H3. the einsum "bshd,bthd->bhst" with S=1 needs an operand transpose XLA
      cannot hoist out of the decode loop.

Variants timed (8-vs-2 step differencing, scalar readback sync):
  A  bf16 xkv, layout [L,B,T,H,Dh]      (default layout)
  B  f8 xkv + per-layer cast            (xkv_f8=True)
  C  bf16 xkv, layout [L,B,H,T,Dh]      (head-major, contiguous [T,Dh])
  H  bf16 xkv, layout [L,B,H,Dh,T]      (transposed, T on lanes — shipped
                                         as xkv_transposed; _attend_t)

Measured v5e (B=16, large-v3): A 15.0 / B 11.9 / C 11.6 / H 6.0 ms/step
(f8 floor 2.4, bf16 floor 4.9). Also measured and DROPPED: two Pallas
kernel generations — per-(lane,head) grid (36 ms: grid/DMA-issue overhead),
per-lane grid with paired-V MXU matmuls (12 ms: small-matmul issue latency
— 10k matvecs/step is inherently latency-bound on the MXU); and f8
in-kernel dequant (v5e has no native fp8 — VPU-emulated converts cost ~3x
the DMA they save). The XLA transposed-einsum path H wins; flat [T, H*Dh]
layouts D/E measured 30/27 ms (strided per-head column reads) in an
earlier revision.

Each variant runs ONLY the cross-attention block per layer (q proj, attend,
o proj) in a 32-layer scan inside an n-step fori loop - the self-attention /
MLP / logits parts are identical across variants and excluded to sharpen the
signal. Writes /tmp/probe_xattn.json.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS

NAME = "large-v3"
B = 16
T = 1500
RESULTS = {}


def timeit(fn, *a, iters=3):
    s = fn(*a)
    float(np.asarray(s))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*a)
        float(np.asarray(s))
    return (time.perf_counter() - t0) / iters


def main():
    dims = MODEL_DIMS[NAME]
    L, H, Dh, D = dims.n_text_layer, dims.n_text_head, dims.head_dim, dims.n_text_state
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    blocks = params["decoder"]["blocks"]
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((B, T, D))).astype(jnp.bfloat16)

    def build_xkv(blocks, enc, layout, dtype):
        def per_layer(_, bp):
            k = wm._split_heads(wm.dense(enc, bp["cross"]["k"]), H)  # [B,T,H,Dh]
            v = wm._split_heads(wm.dense(enc, bp["cross"]["v"]), H)
            if layout == "bhtd":
                k = k.transpose(0, 2, 1, 3)
                v = v.transpose(0, 2, 1, 3)
            elif layout == "bhdt_einsum":
                k = k.transpose(0, 2, 3, 1)   # [B,H,Dh,T]
                v = v.transpose(0, 2, 3, 1)
            elif layout == "btf":
                k = k.reshape(B, T, H * Dh)
                v = v.reshape(B, T, H * Dh)
            return None, (k.astype(dtype), v.astype(dtype))

        _, (ks, vs) = jax.lax.scan(per_layer, None, blocks)
        return ks, vs

    x0_np = rng.standard_normal((B, 1, D))

    def xattn_steps(blocks, xk_all, xv_all, x0, layout, n):
        """n sequential steps; each scans 32 layers of cross-attn only."""

        def step(i, acc_x):
            acc, x = acc_x

            def layer(carry, inp):
                x = carry
                bp, xk, xv = inp
                h = wm.layer_norm(x, bp["cross_ln"])
                q = wm._split_heads(wm.dense(h, bp["cross"]["q"]), H)  # [B,1,H,Dh]
                if layout == "bthd":
                    xk = xk.astype(x.dtype)
                    xv = xv.astype(x.dtype)
                    sc = jnp.einsum("bshd,bthd->bhst", q, xk,
                                    preferred_element_type=jnp.float32) * (Dh ** -0.5)
                    p = jax.nn.softmax(sc, axis=-1)
                    at = jnp.einsum("bhst,bthd->bshd", p.astype(xv.dtype), xv,
                                    preferred_element_type=jnp.float32).astype(x.dtype)
                elif layout == "bhdt_einsum":
                    xk = xk.astype(x.dtype)
                    xv = xv.astype(x.dtype)
                    sc = jnp.einsum("bshd,bhdt->bhst", q, xk,
                                    preferred_element_type=jnp.float32) * (Dh ** -0.5)
                    p = jax.nn.softmax(sc, axis=-1)
                    at = jnp.einsum("bhst,bhdt->bshd", p.astype(xv.dtype), xv,
                                    preferred_element_type=jnp.float32).astype(x.dtype)
                elif layout == "bhtd":
                    xk = xk.astype(x.dtype)
                    xv = xv.astype(x.dtype)
                    sc = jnp.einsum("bshd,bhtd->bhst", q, xk,
                                    preferred_element_type=jnp.float32) * (Dh ** -0.5)
                    p = jax.nn.softmax(sc, axis=-1)
                    at = jnp.einsum("bhst,bhtd->bshd", p.astype(xv.dtype), xv,
                                    preferred_element_type=jnp.float32).astype(x.dtype)
                else:  # btf
                    xk = xk.astype(x.dtype).reshape(B, T, H, Dh)
                    xv = xv.astype(x.dtype).reshape(B, T, H, Dh)
                    sc = jnp.einsum("bshd,bthd->bhst", q, xk,
                                    preferred_element_type=jnp.float32) * (Dh ** -0.5)
                    p = jax.nn.softmax(sc, axis=-1)
                    at = jnp.einsum("bhst,bthd->bshd", p.astype(xv.dtype), xv,
                                    preferred_element_type=jnp.float32).astype(x.dtype)
                x = x + wm.dense(wm._merge_heads(at), bp["cross"]["o"])
                return x, None

            x, _ = jax.lax.scan(layer, x, (blocks, xk_all, xv_all))
            return acc + x.astype(jnp.float32).sum(), x

        acc, _ = jax.lax.fori_loop(0, n, step, (jnp.float32(0.0), x0))
        return acc

    variants = [
        ("A_bf16_bthd", "bthd", jnp.bfloat16),
        ("B_f8_bthd", "bthd", jnp.float8_e4m3fn),
        ("C_bf16_bhtd", "bhtd", jnp.bfloat16),
        ("H_bf16_bhdt_einsum", "bhdt_einsum", jnp.bfloat16),
    ]

    for name, layout, dtype in variants:
        try:
            build = jax.jit(partial(build_xkv, layout=layout, dtype=dtype))
            xk, xv = build(blocks, enc)
            xk.block_until_ready()
            run = jax.jit(partial(xattn_steps, layout=layout), static_argnames=("n",))
            x0 = jnp.asarray(x0_np).astype(jnp.bfloat16)
            t2 = timeit(lambda: run(blocks, xk, xv, x0, n=2))
            t8 = timeit(lambda: run(blocks, xk, xv, x0, n=8))
            per = (t8 - t2) / 6
            RESULTS[name] = {"t2_ms": round(t2 * 1e3, 1), "t8_ms": round(t8 * 1e3, 1),
                             "per_step_ms": round(per * 1e3, 2)}
            print(f"{name}: per-step={per*1e3:.2f} ms  (t2={t2*1e3:.1f} t8={t8*1e3:.1f})",
                  file=sys.stderr, flush=True)
            del xk, xv
        except Exception as e:  # noqa: BLE001 - probe must report, not die
            RESULTS[name] = {"error": str(e)[:200]}
            print(f"{name}: FAILED {e}", file=sys.stderr, flush=True)
        with open("/tmp/probe_xattn.json", "w") as f:
            json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
