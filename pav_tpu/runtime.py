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


# The aligner's hot DP launches ((m_pad, n_pad), width, batch): rows and
# columns pad independently (large inter-anchor segments are nearly pure
# indels), and batch quantizes pow4 capped at the shape's fixed chunk size.
# This is the observed working set of human-like genome runs; unlisted
# combinations still compile on demand (persistent cache makes each a
# once-per-machine cost).
_DP_LAUNCHES = [
    ((16, 16), 17, 512), ((16, 16), 17, 4096),
    ((16, 32), 33, 512), ((16, 32), 33, 2048),
    ((32, 16), 17, 512), ((32, 16), 17, 2048),
    ((16, 64), 65, 32), ((16, 64), 65, 512),
    ((64, 16), 17, 32), ((64, 16), 17, 128),
    ((16, 128), 129, 8), ((16, 128), 129, 32),
    ((128, 16), 17, 8), ((128, 16), 17, 128),
    ((16, 256), 257, 32), ((256, 16), 17, 32),
    ((32, 32), 33, 8), ((32, 64), 65, 8),
    ((64, 32), 33, 8), ((64, 64), 33, 8), ((64, 64), 65, 8),
]

_DP_LAUNCHES_LARGE = [
    ((16, 512), 513, 32), ((16, 512), 513, 128),
    ((512, 16), 17, 32), ((512, 16), 17, 512),
    ((16, 1024), 1025, 128), ((16, 1024), 1025, 512),
    ((1024, 16), 17, 32), ((1024, 16), 17, 128), ((1024, 16), 17, 512),
    ((16, 2048), 2049, 32), ((16, 2048), 2049, 128), ((16, 2048), 2049, 512),
    ((2048, 16), 17, 32), ((2048, 16), 17, 128), ((2048, 16), 17, 512),
    ((32, 2048), 2049, 8),
]


def prime_kernels(sizes=('small', 'medium', 'large'),
                  kde_grids=(1 << 14, 1 << 16, 1 << 17)):
    """Pre-compile the engine's canonical kernel shapes so data-dependent work
    never stalls on a compile (compiles are expensive on tunneled backends,
    and one cold genome run touches ~30 DP programs)."""
    from .ops import affine_dp, kde

    dp = affine_dp.BandedAligner()
    rng = np.random.default_rng(0)

    launches = list(_DP_LAUNCHES)
    if 'large' in sizes:
        launches += _DP_LAUNCHES_LARGE
    handles = []
    for (m_b, n_b), width_b, batch in launches:
        q = rng.integers(0, 4, max(m_b // 2, 1)).astype(np.uint8)
        r = rng.integers(0, 4, max(n_b // 2, 1)).astype(np.uint8)
        handles.append(dp.align_batch_async(
            [(q, r)], width=width_b, pad_to=(m_b, n_b), pad_batch=batch))
    for h in handles:
        h()

    # KDE shapes: common grid sizes x a spread of kernel widths.
    for n in kde_grids:
        state = np.zeros(n, dtype=np.int8)
        state[: n // 3] = 0
        state[n // 3: 2 * n // 3] = 2
        state[2 * n // 3:] = 1
        for sigma_scale in (0.02, 0.08):
            sigmas = np.full(3, max(2.0, sigma_scale * n))
            kde.smoothed_states(state, sigmas)
