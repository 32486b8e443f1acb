"""Runtime/backend helpers."""

import os

import numpy as np


def retain_heap(warm_bytes=0):
    """Keep freed large allocations in the process heap instead of returning
    them to the OS (glibc mallopt), optionally pre-faulting warm_bytes once.

    On hosts with lazily-restored / ballooned VM memory, first-touch page
    faults can run orders of magnitude below DRAM speed; retaining and
    re-using faulted pages keeps steady-state allocation at memory speed.
    No-op (returns False) on non-glibc platforms.
    """
    import ctypes
    try:
        libc = ctypes.CDLL('libc.so.6', use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD, M_MMAP_MAX = -1, -3, -4
        ok = (libc.mallopt(M_MMAP_THRESHOLD, 2**31 - 1)
              and libc.mallopt(M_MMAP_MAX, 0)
              and libc.mallopt(M_TRIM_THRESHOLD, 2**31 - 1))
    except Exception:
        return False
    if ok and warm_bytes > 0:
        buf = np.empty(int(warm_bytes), dtype=np.uint8)
        buf.fill(1)
        del buf
    return bool(ok)


def enable_compile_cache(cache_dir=None):
    """Enable JAX's persistent compilation cache: kernel shape buckets compile
    once per machine, not once per process."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        'PAV_TPU_COMPILE_CACHE', '/tmp/jax_cache_pav_tpu')
    try:
        # Key the cache by backend so CPU/TPU executables never cross-load.
        cache_dir = f'{cache_dir}_{jax.default_backend()}'
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:
        pass


def prime_kernels(sizes=('small', 'medium'), kde_grids=(1 << 14, 1 << 16, 1 << 17)):
    """Pre-compile the engine's canonical kernel shapes so data-dependent work
    never stalls on a compile (compiles are expensive on tunneled backends)."""
    from .ops import affine_dp, kde

    dp = affine_dp.BandedAligner()
    rng = np.random.default_rng(0)

    classes = [(64, 17, 2048), (64, 33, 2048), (64, 65, 2048), (64, 65, 128),
               (256, 257, 32)]
    if 'large' in sizes:
        classes.append((1024, 257, 8))
    for size_b, width_b, batch in classes:
        q = rng.integers(0, 4, size_b // 2).astype(np.uint8)
        r = q.copy()
        dp.align_batch_async([(q, r)], width=width_b, pad_to=size_b,
                             pad_batch=batch)()

    # KDE shapes: common grid sizes x a spread of kernel widths.
    for n in kde_grids:
        state = np.zeros(n, dtype=np.int8)
        state[: n // 3] = 0
        state[n // 3: 2 * n // 3] = 2
        state[2 * n // 3:] = 1
        for sigma_scale in (0.02, 0.08):
            sigmas = np.full(3, max(2.0, sigma_scale * n))
            kde.smoothed_states(state, sigmas)
