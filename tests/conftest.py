import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4 test-strategy note).
#
# The container's sitecustomize imports jax at interpreter startup (axon TPU
# plugin), so setting env vars here is too late for jax's import-time reads —
# but backends initialise lazily, so jax.config.update still takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def cfg():
    from asf_tpu.config import get_cfg

    return get_cfg()
