"""Runtime/backend helpers."""

import os


def enable_compile_cache(cache_dir=None):
    """Enable JAX's persistent compilation cache: kernel shape buckets compile
    once per machine, not once per process."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        'PAV_TPU_COMPILE_CACHE', '/tmp/jax_cache_pav_tpu')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:
        pass
