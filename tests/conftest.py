"""Test environment: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; sharding tests validate the
multi-chip path on virtual CPU devices instead (same XLA partitioner).
Must set flags before jax initializes, hence the env mutation at import.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon PJRT plugin (sitecustomize) registers the TPU backend regardless
# of JAX_PLATFORMS; force the CPU client explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# Public data assets of the reference checkout (tokenizer BPE ranks, mel
# filter npz) used only for parity tests; tests that need them skip when the
# directory is absent.
REFERENCE_DIR = Path(os.environ.get("WLK_REFERENCE_DIR", "/root/reference"))


def reference_asset(relpath: str):
    p = REFERENCE_DIR / relpath
    return p if p.exists() else None
