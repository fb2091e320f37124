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

import resource  # noqa: E402

# the default 8 MB stack soft-limit segfaults LLVM's recursive passes on
# the big unrolled multilevel programs (libgcc unwind SIGSEGV / "LLVM
# compilation error: Cannot allocate memory"); raise toward the hard cap
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = _hard if _hard != resource.RLIM_INFINITY else 1 << 30
if _soft != resource.RLIM_INFINITY and _soft < _want:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
    except (ValueError, OSError):
        pass

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the suite compiles ~100 multilevel
# programs; one process accumulates enough LLVM state to segfault near
# the end (see CLAUDE.md hazards).  With the cache, reruns skip compiles
# entirely; scripts/run_tests.sh batches files into fresh interpreters.
import tpuamg  # noqa: E402

tpuamg.enable_compilation_cache()
