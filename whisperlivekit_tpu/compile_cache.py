"""Persistent XLA compilation cache for the serving programs.

The streaming tick family compiles one program per (batch width, prefix
bucket, encode mode) shape; on the axon-tunneled TPU each compile costs
30-90 s. The reference pays its warmup once per process (reference
warmup.py:51-61 — a single forward); here a server restart, a CLI run and
every benchmark invocation would each re-pay the full program set. JAX's
persistent compilation cache serializes compiled executables to disk keyed
by (HLO, flags, platform), so every process after the first loads the tick
programs in ~50 ms instead of a minute (measured on v5e via the axon
tunnel: 0.48 s cold / 0.048 s cross-process warm for a toy program; full
large-v3 tick programs are minutes cold).

Opt-out with WLK_XLA_CACHE=0; relocate with WLK_XLA_CACHE_DIR.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_enabled_path: Optional[str] = None


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Idempotently point JAX at a persistent on-disk compile cache.

    Returns the cache directory, or None when disabled/unavailable. Safe to
    call before or after the first device use (JAX reads the config at each
    compile)."""
    global _enabled_path
    if os.environ.get("WLK_XLA_CACHE", "1").lower() in ("0", "false", "off"):
        return None
    if _enabled_path is not None:
        return _enabled_path
    path = (
        path
        or os.environ.get("WLK_XLA_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "whisperlivekit_tpu", "xla"
        )
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # the tick programs are the point; skip tiny host utilities
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - config name drift across jax
        logger.warning("compile cache unavailable: %s", e)
        return None
    _enabled_path = path
    return path
