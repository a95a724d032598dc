"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # hard override: the axon TPU plugin sets this
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# parity tests need fp32 matmuls, not the TPU-default bf16-ish path
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

# the axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon already in the env, so override via config too
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
EXAMPLE01 = REFERENCE / "examples" / "01test_MLP3_compare_multithread_cuda_decode_phn"


@pytest.fixture(scope="session")
def example01():
    if not EXAMPLE01.exists():
        pytest.skip("reference example 01 not available")
    return EXAMPLE01
