import os
import sys

# Run tests on a virtual multi-device CPU mesh; real TPU runs use bench.py.
# Hard override: the ambient environment may preset JAX_PLATFORMS to a TPU
# tunnel, which would silently run unit tests remotely in bf16 matmul
# precision (wrong numerics for fp32 assertions) and at tunnel latency.
os.environ["JAX_PLATFORMS"] = "cpu"

# pytest plugins (jaxtyping) import jax before this conftest runs, so the env
# var above may be read too late — update the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))

# persistent XLA compilation cache: the model jit (~10 s on CPU) compiles once
# per (shape, spec) ever, not once per pytest process
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
