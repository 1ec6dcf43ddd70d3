"""Tensor-parallel inference on the virtual 8-device CPU mesh.

Shards the whisper params Megatron-style over ('data','model') and checks
encode/decode outputs match the unsharded single-device results — the TP
serving path for models larger than one chip's HBM.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisperlivekit_tpu.models.whisper import model as M
from whisperlivekit_tpu.models.whisper.dims import ModelDimensions
from whisperlivekit_tpu.parallel.mesh import make_mesh, shard_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=64, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=512, n_text_ctx=32, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = M.init_params(dims, jax.random.PRNGKey(0))
    mesh = make_mesh(8)  # ('data', 'model')
    return dims, params, mesh


def test_mesh_shape(setup):
    _, _, mesh = setup
    assert set(mesh.axis_names) == {"data", "model"}
    assert mesh.devices.size == 8


def test_tp_encode_matches_single_device(setup):
    dims, params, mesh = setup
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 128)).astype(np.float32))

    ref = np.asarray(M.encode(params, mel, dims))

    sharded = shard_params(params, mesh)
    mel_sh = jax.device_put(mel, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, m: M.encode(p, m, dims))(sharded, mel_sh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_tp_decode_matches_single_device(setup):
    dims, params, mesh = setup
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 80, 128)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 512, (2, 5)).astype(np.int32))

    enc = M.encode(params, mel, dims)
    xkv = M.cross_kv(params, enc, dims)
    cache = M.init_cache(dims, 2)
    ref, _, _ = M.decode(params, tokens, jnp.zeros((2,), jnp.int32), xkv, cache, dims)
    ref = np.asarray(ref)

    sharded = shard_params(params, mesh)
    data = NamedSharding(mesh, P("data"))

    def run(p, m, t):
        e = M.encode(p, m, dims)
        x = M.cross_kv(p, e, dims)
        c = M.init_cache(dims, 2)
        lg, _, _ = M.decode(p, t, jnp.zeros((2,), jnp.int32), x, c, dims)
        return lg

    out = jax.jit(run)(sharded, jax.device_put(mel, data), jax.device_put(tokens, data))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_param_shard_layout(setup):
    """Column/row-parallel placement: q/fc1 shard the output dim, o/fc2 the
    input dim, layernorms replicate."""
    dims, params, mesh = setup
    sharded = shard_params(params, mesh)
    blk = sharded["decoder"]["blocks"]
    model_size = mesh.shape["model"]

    def shards_of(x):
        return {tuple(s.index) for s in x.addressable_shards}

    assert len(shards_of(blk["attn"]["q"]["w"])) == model_size
    assert len(shards_of(blk["mlp"]["fc2"]["w"])) == model_size
    assert len(shards_of(blk["attn_ln"]["scale"])) == 1  # replicated
