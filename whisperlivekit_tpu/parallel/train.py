"""Sharded fine-tuning step (DP x TP over a jax.sharding.Mesh).

Net-new vs the reference (inference-only server): a teacher-forced
cross-entropy training step over the same stacked-layer Whisper pytree, for
LoRA-free full fine-tuning and for validating the multi-chip sharding path
(the driver's ``dryrun_multichip``). PP/EP are intentionally absent: Whisper
fits TP x DP at every released size (SURVEY.md §2.10); SP is unnecessary at
1500-frame encoder contexts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.whisper import model as wm
from ..models.whisper.dims import ModelDimensions
from .mesh import param_specs, shard_params


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.adamw(lr, weight_decay=weight_decay)


def loss_fn(params, mel, tokens, dims: ModelDimensions, align=None,
            align_lo=None, align_hi=None, align_weight: float = 1.0):
    """Teacher-forced next-token cross-entropy over the decoder.

    Optional alignment supervision (``align``: an ``AlignSpec`` of the heads
    the serving gate reads, plus per-row frame windows ``align_lo``/
    ``align_hi`` [S] int32, -1 = unsupervised): adds
    ``-log(attention mass inside the true word's frames)`` averaged over the
    registered heads. The AlignAtt gate's whole contract is that those heads
    attend the frames of the token being decoded; when the true alignment is
    known (synthetic aligned data, forced alignment), supervising it directly
    is the standard attention-guided-training recipe and converges orders of
    magnitude faster than waiting for monotonic alignment to emerge."""
    # flash=False: the Pallas flash-encoder kernel has no VJP; the XLA
    # attention path is differentiable (and uses online-softmax chunking
    # when the materialized scores would not fit).
    enc = wm.encode(params, mel, dims, flash=False)
    xkv = wm.cross_kv(params, enc, dims)
    B = tokens.shape[0]
    cache = wm.init_cache(dims, B, dtype=params["decoder"]["tok_emb"].dtype)
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    logits, aprob, _ = wm.decode(
        params, inputs, jnp.zeros((B,), jnp.int32), xkv, cache, dims,
        align=align,
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets >= 0).astype(jnp.float32)
    ce = (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    if align is None:
        return ce
    if align_lo is None or align_hi is None:
        raise ValueError(
            "align supervision requires align_lo/align_hi frame windows "
            "([S] int32, shared across the batch — every row must carry the "
            "same alignment schedule, as the synthetic aligned data does; "
            "per-row alignments need a [B,S] extension)"
        )
    # aprob [K,B,S,T]: probability mass inside the supervised window
    T_enc = aprob.shape[-1]
    t_idx = jnp.arange(T_enc, dtype=jnp.int32)[None, :]
    win = ((t_idx >= align_lo[:, None]) & (t_idx < align_hi[:, None]))
    win = win.astype(jnp.float32)[None, None, :, :]      # [1,1,S,T]
    mass = (aprob * win).sum(-1)                         # [K,B,S]
    sup = (align_lo >= 0).astype(jnp.float32)[None, None, :]
    a_nll = -jnp.log(jnp.clip(mass, 1e-6, 1.0))
    a_loss = (a_nll * sup).sum() / jnp.maximum(
        sup.sum() * aprob.shape[0] * aprob.shape[1], 1.0)
    return ce + align_weight * a_loss


def train_step(state: TrainState, mel, tokens, dims: ModelDimensions, tx,
               align=None, align_lo=None, align_hi=None,
               align_weight: float = 1.0) -> tuple:
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, mel, tokens, dims, align, align_lo, align_hi,
        align_weight)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def make_sharded_train_step(mesh: Mesh, dims: ModelDimensions, tx):
    """jit the train step with DP batch + TP param shardings over the mesh."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def specs_of(params):
        return jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            param_specs(params),
            is_leaf=lambda x: isinstance(x, P),
        )

    def step(state, mel, tokens):
        return train_step(state, mel, tokens, dims, tx)

    def compile_for(state):
        pspec = specs_of(state.params)
        ospec = jax.tree.map(
            lambda x: repl if jnp.ndim(x) == 0 else None, state.opt_state
        )
        # let XLA propagate opt-state shardings from params
        state_spec = TrainState(params=pspec, opt_state=None, step=repl)
        return jax.jit(
            step,
            in_shardings=(None, data, data),
            donate_argnums=(0,),
        )

    return compile_for


def init_train_state(dims: ModelDimensions, mesh: Mesh, tx, key=None, dtype=jnp.float32) -> TrainState:
    key = key if key is not None else jax.random.PRNGKey(0)
    params = wm.init_params(dims, key, dtype=dtype)
    params = shard_params(params, mesh)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))
