import os

# CPU with 8 virtual devices for sharding tests; double precision everywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the runner auto-decomposes every run over the visible devices; keep the
# general suite single-program (the dedicated mesh tests opt back in)
os.environ.setdefault("EPOCH_TPU_MESH", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# persistent compilation cache: the 3D QED step graphs take minutes to
# compile on XLA:CPU — cache them across runs (and xdist workers)
_cache = os.path.join(os.path.expanduser("~"), ".cache",
                      "jax_epoch_tests")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

jax.config.update("jax_enable_x64", True)
try:
    # force CPU even if another plugin initialised first
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REFERENCE = "/root/reference"


def reference_deck(rel):
    return os.path.join(REFERENCE, rel)
