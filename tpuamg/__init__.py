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


class profile_trace:
    """Device-trace context: `with tpuamg.profile_trace("/tmp/tr"): ...`
    writes a TensorBoard-compatible jax.profiler trace (per-kernel device
    timelines) — the TPU-native equivalent of the reference's wall-clock
    timers and HAZmath print_level breakdowns (SURVEY.md §5.1).  NOTE on
    the remote ("axon") runtime wall-clock timings are only trustworthy
    when bracketed by value fetches (docs/PERF_NOTES.md)."""

    def __init__(self, logdir):
        self.logdir = str(logdir)

    def __enter__(self):
        import jax
        os.makedirs(self.logdir, exist_ok=True)
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax
        jax.profiler.stop_trace()
        return False
