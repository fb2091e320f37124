"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

This is the TPU-world answer to "test multi-chip without a cluster"
(SURVEY.md §4): XLA fakes 8 host devices, shard_map code paths run for real.
Must run before jax is imported anywhere.
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# tunnel, which is wrong (and slow) for unit tests. Set TPUAMG_TEST_TPU=1 to
# run the suite against the real chip instead.
if not os.environ.get("TPUAMG_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
