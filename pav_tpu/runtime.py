"""Runtime/backend helpers."""

import os
import threading

import numpy as np

# Exactly one blocking device->host read at a time on accelerator backends:
# concurrent blocking reads from multiple host threads are a stall trigger on
# tunneled transports (observed: minutes-long recv hangs mid-run). Transfers
# still overlap — callers queue copy_to_host_async before blocking — the lock
# only serializes the final waits.
TRANSFER_LOCK = threading.Lock()


def fetch(arr):
    """np.asarray(device_array) with the accelerator transfer lock held."""
    import jax

    if jax.default_backend() == 'cpu':
        return np.asarray(arr)
    with TRANSFER_LOCK:
        return np.asarray(arr)


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


# The aligner's hot DP shape classes ((m_pad, n_pad), width): rows and
# columns pad independently (large inter-anchor segments are nearly pure
# indels). Each class runs at ONE fixed batch size (core._shape_batch), so
# each entry below is exactly one compiled program. This is the observed
# working set of human-like genome runs; unlisted combinations still compile
# on demand (persistent cache makes each a once-per-machine cost).
_DP_SHAPES = [
    # Exactly the width classes reachable from the bucketing rules in
    # core._run_segments for each (m_pad, n_pad) class (width is driven by
    # |m-n|, whose range the class constrains).
    ((16, 16), 17), ((16, 32), 33), ((32, 16), 17), ((32, 32), 33),
    ((16, 64), 65), ((64, 16), 17), ((32, 64), 33), ((32, 64), 65),
    ((64, 32), 33), ((64, 64), 33), ((64, 64), 65),
    ((16, 128), 129), ((128, 16), 17), ((32, 128), 129), ((128, 32), 33),
    ((64, 128), 33), ((64, 128), 65), ((64, 128), 129),
    ((128, 64), 33), ((128, 64), 65),
    ((128, 128), 33), ((128, 128), 65), ((128, 128), 129),
    ((16, 256), 257), ((256, 16), 17), ((32, 256), 257), ((256, 32), 33),
    ((64, 256), 257), ((256, 64), 65),
    ((128, 256), 129), ((128, 256), 257), ((256, 128), 65), ((256, 128), 129),
    ((256, 256), 129), ((256, 256), 257),
]

_DP_SHAPES_LARGE = [
    ((16, 512), 513), ((512, 16), 17),
    ((16, 1024), 1025), ((1024, 16), 17),
    ((16, 2048), 2049), ((2048, 16), 17),
    ((32, 512), 513), ((512, 32), 33),
    ((32, 1024), 1025), ((1024, 32), 33),
    ((32, 2048), 2049), ((2048, 32), 33),
    ((64, 512), 513), ((512, 64), 65),
    ((128, 512), 513), ((512, 128), 129),
    ((256, 512), 257), ((256, 512), 513), ((512, 256), 257),
    ((512, 512), 257), ((512, 512), 513),
]


def prime_kernels(sizes=('small', 'medium', 'large'),
                  kde_grids=(1 << 14, 1 << 16, 1 << 17)):
    """Pre-compile the engine's canonical kernel shapes so data-dependent work
    never stalls on a compile (compiles are expensive on tunneled backends,
    and one cold genome run touches ~30 DP programs)."""
    from .align.aligner.core import _shape_batch
    from .ops import affine_dp, kde

    dp = affine_dp.BandedAligner()
    rng = np.random.default_rng(0)

    launches = list(_DP_SHAPES)
    if 'large' in sizes:
        launches += _DP_SHAPES_LARGE
    handles = []
    for (m_b, n_b), width_b in launches:
        q = rng.integers(0, 4, max(m_b // 2, 1)).astype(np.uint8)
        r = rng.integers(0, 4, max(n_b // 2, 1)).astype(np.uint8)
        handles.append(dp.align_batch_async(
            [(q, r)], width=width_b, pad_to=(m_b, n_b),
            pad_batch=_shape_batch(m_b, width_b)))
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
