"""Scan-unroll sweep for the large-v3 inc tick (weight-streaming overlap)."""
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
import bench as bx
from whisperlivekit_tpu.models.whisper import model as wm
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.streaming import alignatt as A

B, TAIL = 16, 256
RESULTS = {}

def run(label):
    dims = MODEL_DIMS["large-v3"]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    sup = bx._suppress(dims); al, ah = bx._align(dims, "large-v3")
    statics = bx._statics(dims, xkv_f8=True)
    audio_pool = jnp.asarray(rng.integers(-3000, 3000, (B, 16000*30)).astype(np.int16))
    core = bx._core_args(dims, B, rng, sup, al, ah)
    lanes = jnp.arange(B, dtype=jnp.int32)
    state = {"p": jnp.zeros((B+1, dims.n_audio_ctx, dims.n_audio_state), jnp.bfloat16)}
    def tick():
        out = A.alignatt_tick_inc(params, audio_pool, state["p"], lanes, lanes+1,
            jnp.full((B,), 1500-TAIL, jnp.int32), jnp.full((B,), 1500, jnp.int32),
            jnp.full((B,), 1500-82, jnp.int32), *core, **statics, tail_frames=TAIL)
        state["p"] = out[-1]
        return out
    t = bx.time_call(tick)
    RESULTS[label] = round(t*1e3, 1)
    print(f"{label}: {t*1e3:.1f} ms", file=sys.stderr, flush=True)
    with open("/tmp/unroll.json", "w") as f: json.dump(RESULTS, f)
    A.alignatt_tick_inc.clear_cache()

run("baseline_u1")
wm.DECODER_SCAN_UNROLL = 2
run("dec_u2")
wm.DECODER_SCAN_UNROLL = 4
run("dec_u4")
wm.ENCODER_SCAN_UNROLL = 2
run("dec_u4_enc_u2")
print(json.dumps(RESULTS))
