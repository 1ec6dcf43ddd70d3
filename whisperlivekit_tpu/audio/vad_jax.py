"""Silero VAD v6 ported to JAX — batched voice-activity detection.

Weight-exact port of the Silero .jit graph (architecture recovered from the
TorchScript code; weights converted from the jit state_dict):

    [context(64) | frame(512)] → reflect-pad(64) → STFT-conv (258×256, hop
    128) → magnitude[129, 4] → conv(129→128, k3) ReLU → conv(128→64, k3, s2)
    → conv(64→64, k3, s2) → conv(64→128, k3) → LSTMCell(128) →
    conv1x1(128→1) → sigmoid → mean

One jitted step scores B sessions' frames at once — the batched-VAD upgrade
over the reference's per-session ONNX sessions (reference
silero_vad_iterator.py:27-125). State (h, c, context) is an explicit pytree.

On the tunneled single-chip dev platform, per-32 ms dispatch overhead makes
the host torch.jit path the better default for few sessions; this module is
the scheduler-scale path and the parity-tested conversion.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .vad import find_silero_jit

FRAME = 512
CONTEXT = 64


class VADState(NamedTuple):
    h: jnp.ndarray        # [B, 128]
    c: jnp.ndarray        # [B, 128]
    context: jnp.ndarray  # [B, 64]


def init_state(batch: int) -> VADState:
    return VADState(
        h=jnp.zeros((batch, 128), jnp.float32),
        c=jnp.zeros((batch, 128), jnp.float32),
        context=jnp.zeros((batch, CONTEXT), jnp.float32),
    )


def load_params(model_path: Optional[str] = None) -> Dict:
    """Convert the Silero .jit 16 kHz tower to a JAX pytree."""
    import torch

    path = find_silero_jit(model_path)
    if path is None:
        raise FileNotFoundError("silero_vad.jit not found")
    sd = torch.jit.load(str(path), map_location="cpu").state_dict()

    def np_(k):
        return sd[k].float().numpy()

    return {
        "stft_basis": jnp.asarray(np_("_model.stft.forward_basis_buffer")),  # [258,1,256]
        "enc": [
            {
                "w": jnp.asarray(np_(f"_model.encoder.{i}.reparam_conv.weight")),
                "b": jnp.asarray(np_(f"_model.encoder.{i}.reparam_conv.bias")),
            }
            for i in range(4)
        ],
        "lstm": {
            "w_ih": jnp.asarray(np_("_model.decoder.rnn.weight_ih")),  # [512,128]
            "w_hh": jnp.asarray(np_("_model.decoder.rnn.weight_hh")),
            "b_ih": jnp.asarray(np_("_model.decoder.rnn.bias_ih")),
            "b_hh": jnp.asarray(np_("_model.decoder.rnn.bias_hh")),
        },
        "head": {
            "w": jnp.asarray(np_("_model.decoder.decoder.2.weight")),  # [1,128,1]
            "b": jnp.asarray(np_("_model.decoder.decoder.2.bias")),
        },
    }


def _conv1d(x, w, b, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((padding, padding),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + b[None, :, None]


@jax.jit
def vad_step(params: Dict, state: VADState, frames: jnp.ndarray) -> Tuple[jnp.ndarray, VADState]:
    """frames [B, 512] float32 → (probs [B], new state)."""
    x = jnp.concatenate([state.context, frames], axis=1)  # [B, 576]
    x = jnp.pad(x, ((0, 0), (0, CONTEXT)), mode="reflect")  # [B, 640]

    spect = jax.lax.conv_general_dilated(
        x[:, None, :], params["stft_basis"], window_strides=(128,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, 258, 4]
    real, imag = spect[:, :129], spect[:, 129:]
    mag = jnp.sqrt(real * real + imag * imag)

    h = jax.nn.relu(_conv1d(mag, params["enc"][0]["w"], params["enc"][0]["b"]))
    h = jax.nn.relu(_conv1d(h, params["enc"][1]["w"], params["enc"][1]["b"], stride=2))
    h = jax.nn.relu(_conv1d(h, params["enc"][2]["w"], params["enc"][2]["b"], stride=2))
    h = jax.nn.relu(_conv1d(h, params["enc"][3]["w"], params["enc"][3]["b"]))  # [B,128,1]

    xt = h[:, :, 0]  # [B, 128]
    lstm = params["lstm"]
    gates = xt @ lstm["w_ih"].T + lstm["b_ih"] + state.h @ lstm["w_hh"].T + lstm["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=1)
    c = jax.nn.sigmoid(f) * state.c + jax.nn.sigmoid(i) * jnp.tanh(g)
    hh = jax.nn.sigmoid(o) * jnp.tanh(c)

    head = params["head"]
    # head = dropout(inference no-op) → ReLU → conv1x1 → sigmoid
    logit = jax.nn.relu(hh) @ head["w"][0, :, 0] + head["b"][0]
    prob = jax.nn.sigmoid(logit)  # [B]

    return prob, VADState(h=hh, c=c, context=frames[:, -CONTEXT:])


class SileroJAXVAD:
    """Frame-model wrapper compatible with audio.vad.VADIterator."""

    def __init__(self, model_path: Optional[str] = None, params: Optional[Dict] = None):
        self.params = params if params is not None else load_params(model_path)
        self.reset_states()

    def reset_states(self) -> None:
        self.state = init_state(1)

    def new_session(self) -> "SileroJAXVAD":
        return SileroJAXVAD(params=self.params)

    def __call__(self, frame: np.ndarray, sr: int = 16000) -> float:
        prob, self.state = vad_step(
            self.params, self.state, jnp.asarray(frame, jnp.float32)[None]
        )
        return float(prob[0])


class BatchedSileroVAD:
    """Scheduler-scale VAD: one device step scores all sessions' 32 ms ticks."""

    def __init__(self, batch: int, model_path: Optional[str] = None):
        self.params = load_params(model_path)
        self.batch = batch
        self.state = init_state(batch)

    def step(self, frames: np.ndarray) -> np.ndarray:
        """frames [B, 512] → probs [B]."""
        probs, self.state = vad_step(self.params, self.state, jnp.asarray(frames, jnp.float32))
        return np.asarray(probs)

    def reset_lane(self, lane: int) -> None:
        self.state = VADState(
            h=self.state.h.at[lane].set(0.0),
            c=self.state.c.at[lane].set(0.0),
            context=self.state.context.at[lane].set(0.0),
        )
