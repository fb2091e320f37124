"""tpuamg: TPU-native metric-AMG sparse solver framework.

Rebuilds the capabilities of anabudisa/metric-amg-examples (FEniCS +
HAZmath + cbc.block) as an idiomatic JAX/XLA/Pallas stack; see SURVEY.md
for the structural map and README.md for the component overview.
"""
import os


def enable_compilation_cache(path=None):
    """Persistent XLA compilation cache: the jitted PCG+cycle programs are
    large (unrolled multilevel traces); caching makes repeated driver/bench
    runs start in seconds instead of minutes."""
    import jax
    path = path or os.environ.get("TPUAMG_CACHE_DIR",
                                  os.path.expanduser("~/.cache/tpuamg-xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
