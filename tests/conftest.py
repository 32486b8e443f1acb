"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding tests
exercise real multi-chip layouts without TPU hardware.

The image's axon sitecustomize preimports JAX and eagerly initializes the
TPU-tunnel backend at interpreter startup, so env vars alone are too late:
clear the initialized backends and re-init on CPU with 8 virtual devices.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
try:
    _xb._clear_backends()
except Exception:  # pragma: no cover - defensive; proceed with whatever backend exists
    pass

# Persistent compilation cache: DP-kernel bucket shapes compile once across runs.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_pav_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

assert jax.devices()[0].platform == 'cpu', 'tests must run on the CPU backend'
