"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os
import sys

# force CPU: the ambient environment pins JAX_PLATFORMS to the TPU plugin,
# but tests need the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# pytest plugins import jax BEFORE this conftest runs, and jax snapshots
# JAX_PLATFORMS at import time — override through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
