"""Device mesh + parameter sharding rules.

The serving path is embarrassingly parallel across sessions (DP = shard
sessions over chips); TP shards the transformer weights over the 'model'
axis when one model exceeds a chip's HBM (large-v3 bf16 + KV pools). The
reference has no analog (single-GPU per process, vLLM TP pass-through only,
reference config.py:106) — collectives here ride ICI via pjit/NamedSharding,
no explicit comm code.

TP layout for the stacked-layer pytree (models/whisper/model.py):
column-parallel q/k/v/fc1 (output feature dim on 'model'), row-parallel
o/fc2 (input feature dim on 'model') — the Megatron layout; XLA inserts one
all-reduce per block.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, shape: Optional[Tuple[int, int]] = None
) -> Mesh:
    """Mesh with ('data', 'model') axes over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if shape is None:
        model = 1
        for cand in (8, 4, 2):
            if n % cand == 0 and cand <= n:
                model = cand
                break
        shape = (n // model, model)
    devs = np.asarray(devices[:n]).reshape(shape)
    return Mesh(devs, axis_names=("data", "model"))


def spec_for_path(path: str) -> P:
    """TP PartitionSpec for one parameter, keyed by its pytree path.

    Weight matrices are [L, in, out] (stacked layers); biases [L, out].
    """
    parts = path.split("/")
    leaf = parts[-1]
    proj = parts[-2] if len(parts) >= 2 else ""

    if proj in ("q", "k", "v", "fc1"):  # column parallel: shard output dim
        if leaf == "w":
            return P(None, None, "model")
        return P(None, "model")  # bias
    if proj in ("o", "fc2"):  # row parallel: shard input dim
        if leaf == "w":
            return P(None, "model", None)
        return P(None)
    # layernorms, convs, embeddings: replicated
    return P()


def _path_str(key_path) -> str:
    out = []
    for k in key_path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return "/".join(out)


def param_specs(params) -> dict:
    """PartitionSpec pytree matching ``params``' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: spec_for_path(_path_str(kp)), params
    )


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per the TP rules."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, x: jax.device_put(
            x, NamedSharding(mesh, spec_for_path(_path_str(kp)))
        ),
        params,
    )


def batch_spec() -> P:
    return P("data")
