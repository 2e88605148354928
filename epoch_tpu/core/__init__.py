import os

# EPOCH is a double-precision code; enable x64 unless explicitly disabled
# (set EPOCH_TPU_X64=0 for single-precision-only TPU perf runs).
if os.environ.get("EPOCH_TPU_X64", "1") != "0":
    import jax
    jax.config.update("jax_enable_x64", True)

# persistent compilation cache: push/deposit kernels are expensive to build
import jax as _jax  # noqa: E402
_cache_dir = os.environ.get("EPOCH_TPU_CACHE",
                            os.path.expanduser("~/.cache/epoch_tpu_xla"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from .sim import Simulation, build_config, build_state  # noqa: E402

__all__ = ["Simulation", "build_config", "build_state"]
