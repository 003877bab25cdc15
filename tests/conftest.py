"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64 support.

Must set flags before jax initializes a backend, hence the env mutation at
import time.  Multi-chip sharding tests use the 8 virtual CPU devices.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU for tests even when the session environment selects a TPU
# platform (the env var JAX_PLATFORMS is overridden by the platform plugin,
# so use the config API); benchmarks use the real chip, tests use the
# virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

RF00167 = os.path.join(REF, "examples", "MSA_RF00167.fa")
RF00167_REF = os.path.join(REF, "examples", "ref_RF00167.fa")
PF02826 = os.path.join(REF, "tests", "tests_input", "PF02826.faa")
PF02826_REF = os.path.join(REF, "tests", "tests_input", "ref_seq_PF02826.faa")
RF00059 = os.path.join(
    REF, "tests", "tests_input", "MSA_RF00059_trimmed_gap_treshold_50.fa"
)
RF00059_REF = os.path.join(REF, "tests", "tests_input", "ref_seq_RF00059.faa")


@pytest.fixture(scope="session")
def rf00167_path():
    return RF00167


@pytest.fixture(scope="session")
def pf02826_path():
    return PF02826


@pytest.fixture(scope="session")
def rf00059_path():
    return RF00059
