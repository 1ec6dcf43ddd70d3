"""Median filter over the trailing axis (cross-attention smoothing).

Used by both the AlignAtt emission gate and offline word timing (reference
whisper/timing.py:19-54 implements this with a CUDA Triton kernel +
unfold-sort fallback). On TPU the sort-of-shifted-windows formulation fuses
into the attention post-processing under XLA; a Pallas kernel is unnecessary
for width-7 filters (VPU-bound, bandwidth-trivial).
"""

from __future__ import annotations

import jax.numpy as jnp


def median_filter(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Median filter along axis -1 with reflect padding, matching the
    reference's torch implementation semantics (whisper/timing.py:19-46)."""
    if width <= 1:
        return x
    assert width % 2 == 1, "width must be odd"
    if x.shape[-1] <= width // 2:
        return x
    pad = width // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = jnp.stack([xp[..., i : i + x.shape[-1]] for i in range(width)], axis=-1)
    return jnp.sort(windows, axis=-1)[..., width // 2]
