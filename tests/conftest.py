"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(`shard_map` over a Mesh) is exercised without TPU hardware, per the
SURVEY.md §4 test plan. Set LZMA_RS_TPU_TEST_TPU=1 to run on real devices.
"""

import os
import sys

if not os.environ.get("LZMA_RS_TPU_TEST_TPU"):
    # Note: this environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) via a
    # site hook, so we must force the platform through jax.config, not env.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REF_FILES = os.path.join("/root/reference", "tests", "files")


@pytest.fixture(scope="session")
def ref_files():
    return REF_FILES


def read_ref(name: str) -> bytes:
    with open(os.path.join(REF_FILES, name), "rb") as f:
        return f.read()
