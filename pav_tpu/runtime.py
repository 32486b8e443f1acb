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

# Heartbeat of completed device->host reads. Tunneled transports can wedge
# indefinitely on a single read (observed: calibration succeeds, then the
# next process's first read never returns); watchdogs poll last_progress()
# to detect a wedged link and restart with a fresh client connection.
# _PROGRESS['fetch_t0'] is the start time of the blocking read currently in
# flight (None when no reader is blocked): a wedge can ONLY manifest as a
# blocked read, so watchdogs must ignore long no-transfer stretches of pure
# host work (chromosome-scale planning runs minutes without touching the
# device — observed false-positive re-exec loops at 500 Mbp).
_PROGRESS = {'t': None, 'fetch_t0': None}


def mark_progress():
    import time
    _PROGRESS['t'] = time.time()


def last_progress():
    import time
    if _PROGRESS['t'] is None:
        _PROGRESS['t'] = time.time()
    return _PROGRESS['t']


def fetch_blocked_since():
    """Start time of the currently-blocked device->host read, or None."""
    return _PROGRESS['fetch_t0']


def fetch(arr):
    """np.asarray(device_array) with the accelerator transfer lock held."""
    import time

    import jax

    if jax.default_backend() == 'cpu':
        out = np.asarray(arr)
        mark_progress()
        return out
    with TRANSFER_LOCK:
        _PROGRESS['fetch_t0'] = time.time()
        try:
            out = np.asarray(arr)
        finally:
            _PROGRESS['fetch_t0'] = None
    mark_progress()
    return out


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
        M_ARENA_MAX = -8
        ok = (libc.mallopt(M_MMAP_THRESHOLD, 2**31 - 1)
              and libc.mallopt(M_MMAP_MAX, 0)
              and libc.mallopt(M_TRIM_THRESHOLD, 2**31 - 1))
        # One malloc arena for ALL threads: per-thread arenas defeat page
        # retention — every worker pool faults a fresh heap segment instead
        # of reusing the warmed pages (measured 10x slowdown of concurrent
        # native planning on lazily-restored VM memory).
        libc.mallopt(M_ARENA_MAX, 1)
    except Exception:
        return False
    if ok and warm_bytes > 0:
        # Fault pages from several threads: the host's page-supply path is
        # ~9 MB/s single-threaded but scales ~2.5x with parallel faulting.
        # Chunked with progress heartbeats: a multi-GB prefault runs many
        # minutes on a cold VM, and wedge watchdogs must not mistake it for
        # a hung process.
        import threading
        buf = np.empty(int(warm_bytes), dtype=np.uint8)
        n_th = 8
        step = (len(buf) + n_th - 1) // n_th
        chunk = 256 << 20

        def touch(lo):
            for c0 in range(lo, lo + step, chunk):
                buf[c0:min(c0 + chunk, lo + step):4096] = 1
                mark_progress()

        threads = [threading.Thread(target=touch, args=(i * step,))
                   for i in range(n_th)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
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

# Accelerator backends bucket on the coarse ladder instead
# (core._accel_bucket): ~one order of magnitude fewer compiled programs,
# each compile being seconds-to-minutes on a tunneled remote-compile
# backend. Ordered most-common-first so partial priming covers the bulk.
# m <= n always: core transposes segments so rows = the shorter side (scan
# depth) and I/D swap back on the host. Everything <= 2048 columns runs
# full-width through the gather-free kernel; only large classes past the
# full-width cell cap stay banded. The pow2 ladder (core._ACCEL_LADDER, r4)
# makes the full enumeration below reachable; ordered smallest-area-first so
# partial priming covers the classes that carry ~99.7% of bench segments
# (min-side <= 16).
_ACCEL_SMALL = (16, 32, 64, 128, 256, 512, 1024, 2048)
_DP_SHAPES_ACCEL = sorted(
    [((m_b, n_b), n_b + 1)
     for m_b in _ACCEL_SMALL for n_b in _ACCEL_SMALL if n_b >= m_b],
    key=lambda s: s[0][0] * s[0][1])
_DP_SHAPES_ACCEL += [((m_b, 8192), 8193) for m_b in (16, 32, 64, 128, 256, 512)]
_DP_SHAPES_ACCEL += [
    # Banded classes (past the full-width cell cap): the pallas wavefront
    # kernel (ops/pallas_dp.pallas_align_wave).
    ((1024, 8192), 2048),
    ((2048, 8192), 2048),
    ((8192, 8192), 512),       # balanced mid-size, diagonal-hugging band
    ((8192, 8192), 2048),      # end extensions (compiles at width 2049)
]


def prime_kernels(sizes=('small', 'medium', 'large'),
                  kde_grids=(1 << 15, 1 << 16, 1 << 17, 1 << 18,
                             1 << 19, 1 << 20, 1 << 21),
                  shape_range=None):
    """Pre-compile the engine's canonical kernel shapes so data-dependent work
    never stalls on a compile (compiles are expensive on tunneled backends,
    and one cold genome run touches ~30 DP programs).

    :param shape_range: optional (lo, hi) slice of the DP shape list — used by
        prime_kernels_isolated to prime chunks in separate processes.
    """
    from .align.aligner.core import _shape_batch
    from .ops import affine_dp, kde

    import jax
    dp = affine_dp.BandedAligner()
    rng = np.random.default_rng(0)
    accel = jax.default_backend() != 'cpu'

    if accel:
        # Accelerators bucket on the coarse ladder (core._accel_bucket) and
        # launch through the device-resident gather path.
        import jax.numpy as jnp
        from .align.aligner.core import _RESIDENT_MIN
        launches = list(_DP_SHAPES_ACCEL)
        resident = jnp.full(_RESIDENT_MIN, 4, dtype=jnp.int8)
    else:
        launches = list(_DP_SHAPES)
        if 'large' in sizes:
            launches += _DP_SHAPES_LARGE
    if shape_range is not None:
        launches = launches[shape_range[0]:shape_range[1]]
    import sys
    import time
    verbose = os.environ.get('PAV_TPU_PRIME_VERBOSE') == '1'

    def prime_one(launch):
        (m_b, n_b), width_b = launch
        t0 = time.time()
        if accel:
            items = [(0, max(m_b // 2, 1), 0, 64, max(n_b // 2, 1), 0)]
            # Each shape runs at three batch sizes: the cap and the pow4-down
            # quantized variants part-full classes launch (core.batch_pad).
            cap = _shape_batch(m_b, width_b, n_b)
            # Batch quantization is pow2-down (core.batch_pad); prime the cap
            # and two common part-full variants. Unprimed fills compile once
            # inline and persist in the cache.
            for b_pad in sorted({cap, max(cap // 2, 8), max(cap // 8, 8)}):
                dp.align_batch_refs_async(
                    items, width=width_b, pad_to=(m_b, n_b),
                    pad_batch=b_pad, resident=resident)()
        else:
            q = rng.integers(0, 4, max(m_b // 2, 1)).astype(np.uint8)
            r = rng.integers(0, 4, max(n_b // 2, 1)).astype(np.uint8)
            dp.align_batch_async(
                [(q, r)], width=width_b, pad_to=(m_b, n_b),
                pad_batch=_shape_batch(m_b, width_b))()
        if verbose:
            sys.stderr.write(f'[prime] dp ({m_b},{n_b})w{width_b} '
                             f'{time.time() - t0:.1f}s\n')
            sys.stderr.flush()

    if accel and len(launches) > 1:
        # Remote-compile backends overlap concurrent compiles server-side
        # (~3x observed for XLA programs); threads block in backend_compile
        # with the GIL released. Mosaic (pallas) compiles, however, 500 the
        # tunnel's compile helper when other compiles are in flight — the
        # same shapes compile fine alone — so pallas-eligible launches prime
        # SERIALLY first, then the rest fan out over the pool. Priming is
        # time-budgeted (PAV_TPU_PRIME_BUDGET_S): the shape list is ordered
        # most-common-first, cached shapes load in milliseconds, and anything
        # unprimed compiles once inline — a cold cache costs the budget, not
        # the full enumeration.
        deadline = time.time() + float(
            os.environ.get('PAV_TPU_PRIME_BUDGET_S', 420))
        from concurrent.futures import ThreadPoolExecutor

        from .align.aligner.core import _shape_batch as _sb
        from .ops import pallas_dp as _pd

        def pallas_eligible(launch):
            (m_b, n_b), width_b = launch
            if width_b < n_b + 1:
                # Banded: the pallas wavefront kernel (Mosaic compile).
                from .ops.affine_dp import _next_pow2, _wave_width
                w_eff = min(_next_pow2(width_b) + 1, n_b + 1)
                cap = _sb(m_b, w_eff, n_b)
                return any(_pd.wave_feasible_block(
                               b, m_b + n_b, _wave_width(w_eff))
                           for b in {cap, max(cap // 2, 8), max(cap // 8, 8)})
            cap = _sb(m_b, width_b)
            return any(_pd.feasible_block(b, m_b, width_b)
                       for b in {cap, max(cap // 2, 8), max(cap // 8, 8)})

        serial = [l for l in launches if pallas_eligible(l)]
        pooled = [l for l in launches if not pallas_eligible(l)]
        for launch in serial:
            if time.time() < deadline:
                prime_one(launch)

        def prime_budgeted(launch):
            if time.time() < deadline:
                prime_one(launch)

        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(prime_budgeted, pooled))
    else:
        handles = []
        for (m_b, n_b), width_b in launches:
            q = rng.integers(0, 4, max(m_b // 2, 1)).astype(np.uint8)
            r = rng.integers(0, 4, max(n_b // 2, 1)).astype(np.uint8)
            handles.append(dp.align_batch_async(
                [(q, r)], width=width_b, pad_to=(m_b, n_b),
                pad_batch=_shape_batch(m_b, width_b)))
        for h in handles:
            h()

    # KDE shapes: the device program is keyed by the pow2 grid length alone
    # (kernels are built on device from the sigmas), so one call per grid
    # size covers every bandwidth. Grids at/below the host-FFT threshold
    # never reach the device and need no priming.
    for n in kde_grids:
        if n <= kde._HOST_FFT_MAX:
            continue
        state = np.zeros(n, dtype=np.int8)
        state[: n // 3] = 0
        state[n // 3: 2 * n // 3] = 2
        state[2 * n // 3:] = 1
        t0 = time.time()
        sigmas = np.full(3, max(2.0, 0.02 * n))
        kde.smoothed_states(state, sigmas)
        if verbose:
            sys.stderr.write(f'[prime] kde n={n} '
                             f'{time.time() - t0:.1f}s\n')
            sys.stderr.flush()


def _cache_dir_entries():
    """Entry count of this backend's persistent compile cache dir (0 when
    missing). Some PJRT plugins (the tunneled axon backend among them) do not
    support executable serialization: jax silently skips the persistent cache
    and every process pays full compile cost."""
    import glob

    base = os.environ.get('PAV_TPU_COMPILE_CACHE', '/tmp/jax_cache_pav_tpu')
    # Any non-cpu backend dir counts (the caller runs env-only, pre-init).
    return sum(len(os.listdir(d)) for d in glob.glob(f'{base}_*')
               if not d.endswith('_cpu') and os.path.isdir(d))


def prime_kernels_isolated(chunk=6, timeout_s=420, verbose=False):
    """Compile-prime the DP shape classes in child processes, a chunk at a
    time, with a hard timeout per chunk.

    On tunneled accelerator backends a server-side compile can stall
    indefinitely (observed: >12 min wedged on one shape). Because the
    persistent compilation cache survives process death, priming in
    disposable children turns "stall forever" into "kill, retry, move on":
    every shape that ever compiles is cached for the main process, and a
    shape that repeatedly wedges is skipped instead of hanging the engine.

    When the backend does not support the persistent cache at all (the cache
    dir stays empty after a successful child), children are wasted work —
    bail out immediately and let the caller prime in-process instead.

    Returns (n_ok, n_failed_chunks); n_ok == 0 means "prime in-process".
    """
    import subprocess
    import sys as _sys

    # Only accelerator envs reach this path; they bucket on the coarse ladder.
    n_shapes = len(_DP_SHAPES_ACCEL)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def prime_range(lo, hi, tmo):
        code = (f'import sys; sys.path.insert(0, {root!r}); '
                'from pav_tpu.runtime import enable_compile_cache, prime_kernels; '
                'enable_compile_cache(); '
                f'prime_kernels(shape_range=({lo}, {hi}), kde_grids=())')
        try:
            subprocess.run([_sys.executable, '-c', code], timeout=tmo,
                           check=True, capture_output=not verbose)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if verbose:
                _sys.stderr.write(f'[prime] range {lo}:{hi} failed/timed out\n')
            return False

    n_ok = 0
    n_fail = 0
    for lo in range(0, n_shapes, chunk):
        hi = min(lo + chunk, n_shapes)
        if prime_range(lo, hi, timeout_s):
            n_ok += hi - lo
        else:
            # Chunk wedged: retry shape-by-shape so one bad program cannot
            # shadow its neighbors (all successes persist in the cache).
            for i in range(lo, hi):
                if prime_range(i, i + 1, timeout_s // 2):
                    n_ok += 1
                else:
                    n_fail += 1
        if n_ok and _cache_dir_entries() == 0:
            # Children compiled but nothing persisted: the backend does not
            # serialize executables. Isolated priming cannot help — stop.
            if verbose:
                _sys.stderr.write('[prime] persistent cache ineffective for '
                                  'this backend; priming in-process instead\n')
            return 0, n_fail
    # KDE shapes prime quickly; run them in one child as well.
    code = (f'import sys; sys.path.insert(0, {root!r}); '
            'from pav_tpu.runtime import enable_compile_cache, prime_kernels; '
            'enable_compile_cache(); '
            'prime_kernels(shape_range=(0, 0), kde_grids=(1 << 15, 1 << 16, '
            '1 << 17, 1 << 18, 1 << 19, 1 << 20, 1 << 21))')
    try:
        subprocess.run([_sys.executable, '-c', code], timeout=timeout_s,
                       check=True, capture_output=not verbose)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        n_fail += 1
    return n_ok, n_fail
