"""Gaussian KDE over integer positions as FFT convolution (device kernel).

The reference evaluates scipy gaussian_kde per k-mer state over a
multiprocessing pool with sampled evaluation + interpolation
(pavlib/density.py:136-323). Because evaluation points are exactly the integer
grid 0..n-1 and the data points are a subset of that grid, the scaled KDE
  count_s * KDE_s(x) = sum_i N(x; p_i, sigma_s^2)
is exactly the linear convolution of the state's indicator histogram with a
Gaussian kernel — computed here for every position at once with real FFTs.
O(n log n), batched over states and regions, XLA-compiled (TPU FFT units);
no sampling or interpolation error.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TRUNC_SIGMAS = 8.0  # kernel support half-width in sigmas


def _next_pow2(x):
    n = 1
    while n < x:
        n <<= 1
    return n


@functools.partial(jax.jit, static_argnames=('fft_len',))
def _conv_batch(hist, kernels, fft_len):
    """hist: [B, n] float32, kernels: [B, kw] float32 (kw odd, centered).
    Returns linear convolution same-size as hist: [B, n]."""
    kw = kernels.shape[1]
    half = kw // 2
    H = jnp.fft.rfft(hist, n=fft_len, axis=1)
    K = jnp.fft.rfft(kernels, n=fft_len, axis=1)
    full = jnp.fft.irfft(H * K, n=fft_len, axis=1)
    return full[:, half:half + hist.shape[1]]


@functools.partial(jax.jit, static_argnames=('fft_len', 'n_states'))
def _density_state_kernel(state_mer, kernels, fft_len, n_states):
    """state_mer: int8 [n_pad] (values 0..n_states-1, or -1 padding);
    kernels: [n_states, kw]. Histogram, convolution, spike clamp, and argmax all
    run on device; returns (state int8 [n_pad], dens f32 [n_states, n_pad]).
    Callers transfer only the state vector on the scan path."""
    hist = jnp.stack([
        (state_mer == s).astype(jnp.float32) for s in range(n_states)
    ])
    dens = _conv_batch(hist, kernels, fft_len)
    dens = jnp.where(dens > 1.0, 1.0 / jnp.maximum(dens, 1e-30), dens)
    state = jnp.argmax(dens, axis=0).astype(jnp.int8)
    return state, dens


def _build_kernels(state_mer, sigmas, n_states):
    max_sigma = float(np.max(sigmas)) if len(sigmas) else 0.0
    half = int(np.ceil(_TRUNC_SIGMAS * max(max_sigma, 1.0)))
    kw = 2 * (_next_pow2(half) if half > 1 else 1) + 1
    half = kw // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    kernels = np.zeros((n_states, kw), dtype=np.float32)
    for s in range(n_states):
        sg = sigmas[s]
        if sg > 0 and np.any(state_mer == s):
            kernels[s] = (np.exp(-0.5 * (x / sg) ** 2)
                          / (sg * np.sqrt(2 * np.pi))).astype(np.float32)
    return kernels, kw


def smoothed_states(state_mer, sigmas, n_states=3, with_density=False):
    """Density-smoothed state per grid position (device round trip is int8 in,
    int8 out on the scan path; densities transferred only when requested).

    :param state_mer: int array [n] of state labels in [0, n_states).
    :param sigmas: per-state Gaussian sigma.

    :return: (state int8 [n], dens float32 [n_states, n] or None).
    """
    state_mer = np.asarray(state_mer, dtype=np.int8)
    n = len(state_mer)
    n_pad = _next_pow2(max(n, 16))
    padded = np.full(n_pad, -1, dtype=np.int8)
    padded[:n] = state_mer

    kernels, kw = _build_kernels(state_mer, np.asarray(sigmas, dtype=np.float64),
                                 n_states)
    fft_len = _next_pow2(n_pad + kw)
    state, dens = _density_state_kernel(
        jnp.asarray(padded), jnp.asarray(kernels), fft_len, n_states)
    from ..runtime import fetch
    state_np = fetch(state)[:n]
    if with_density:
        return state_np, fetch(dens)[:, :n]
    return state_np, None


def gaussian_density_states(state_mer, sigmas, n_states=3):
    """Per-state scaled KDE at every grid position (spike clamp NOT applied;
    exact scipy-parity values). float32 array [n_states, n]."""
    state_mer = np.asarray(state_mer)
    n = len(state_mer)
    n_pad = _next_pow2(max(n, 16))
    hist = np.zeros((n_states, n_pad), dtype=np.float32)
    for s in range(n_states):
        hist[s, np.nonzero(state_mer == s)[0]] = 1.0

    kernels, kw = _build_kernels(state_mer, np.asarray(sigmas, dtype=np.float64),
                                 n_states)
    fft_len = _next_pow2(n_pad + kw)
    out = _conv_batch(jnp.asarray(hist), jnp.asarray(kernels), fft_len)
    from ..runtime import fetch
    return fetch(out)[:, :n]


def scott_sigmas(state_mer, bw_factor, n_states=3):
    """Per-state sigma replicating scipy.stats.gaussian_kde with a scalar
    bw_method: sigma_s = bw_factor * std(points_s, ddof=1)."""
    state_mer = np.asarray(state_mer)
    sigmas = np.zeros(n_states, dtype=np.float64)
    for s in range(n_states):
        pts = np.nonzero(state_mer == s)[0]
        if len(pts) > 1:
            sigmas[s] = bw_factor * np.std(pts, ddof=1)
        elif len(pts) == 1:
            # scipy would fail on singular covariance; a point mass with tiny
            # sigma keeps the state representable (low-count states are removed
            # upstream with min_state_count anyway).
            sigmas[s] = bw_factor
    return sigmas
