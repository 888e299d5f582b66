"""Test harness setup: force the JAX CPU backend with 8 virtual devices
(for sharding tests) and enable float64 for validation-grade numerics.

Production runs target TPU in f32; the validation suite runs f64 on CPU,
mirroring the reference's CPU/double test configuration
(tests/test_torchmd.py:375-376).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax

# The environment may pre-import jax with a TPU plugin; override explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
SYSTEMS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "systems")
REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return os.path.isdir(os.path.join(REFERENCE_PATH, "torchmd"))


@pytest.fixture(scope="session")
def refmod():
    """Import the upstream TorchMD package (oracle for parity tests)."""
    if not reference_available():
        pytest.skip("reference implementation or torch not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch

    # The reference assembles parameter tensors at torch's default dtype
    # (float32) before upcasting; run it natively in f64 so the oracle is
    # exact and parity tolerances can be tight.
    torch.set_default_dtype(torch.float64)
    import torchmd.forces as rforces
    import torchmd.parameters as rparameters
    import torchmd.integrator as rintegrator

    return {
        "forces": rforces,
        "parameters": rparameters,
        "integrator": rintegrator,
    }
