"""FIR frequency-response evaluation (first-party `freqz`).

The reference's band-filter normalization is *defined in terms of* an 8000-pt
`scipy.signal.freqz` evaluation (`/root/reference/filter_methods.py:63-74`)
and the response plots use the same grid (`/root/reference/plot_filter.py:49`).
To keep the −90 dB contract we evaluate on exactly scipy's grid:

    w = linspace(0, fs/2, worN, endpoint=False)
    H[k] = Σ_n h[n] · exp(−j·2π·(w[k]/fs)·n)

computed — as scipy's fast path does — via a zero-padded real FFT of length
``2·worN``, which is bit-for-bit the same evaluation points.

Both a numpy (float64 design path) and a jax (on-device) implementation are
provided; the design path uses numpy.
"""
from __future__ import annotations

import numpy as np

__all__ = ["freqz", "freqz_jax"]


def freqz(h: np.ndarray, worN: int = 8000, fs: float = 2 * np.pi):
    """Frequency response of an FIR filter on scipy's half-spectrum grid.

    Returns ``(w, H)`` with `w` in the same units as `fs` (Hz when `fs` is a
    samplerate), matching ``scipy.signal.freqz(h, worN=worN, fs=fs)``.
    """
    h = np.asarray(h, dtype=np.float64)
    if h.ndim != 1:
        raise ValueError("freqz expects a 1-D coefficient vector")
    worN = int(worN)
    if worN < 1:
        raise ValueError("worN must be >= 1")
    n_fft = 2 * worN
    if len(h) <= n_fft:
        # scipy's FFT fast path: rfft of length 2*worN, keep the first worN
        # bins => response at w = linspace(0, pi, worN, endpoint=False).
        H = np.fft.rfft(h, n=n_fft)[:worN]
    else:
        # Filter longer than the grid: direct evaluation.
        w = np.linspace(0, np.pi, worN, endpoint=False)
        n = np.arange(len(h))
        H = np.exp(-1j * np.outer(w, n)) @ h
    w = np.linspace(0, fs / 2, worN, endpoint=False)
    return w, H


def freqz_jax(h, worN: int = 8000, fs: float = 2 * np.pi):
    """JAX version of :func:`freqz` (float32 on device; jit/vmap friendly).

    Matches the numpy path on both branches: the rfft fast path for
    ``len(h) <= 2·worN`` and direct evaluation for longer filters (the rfft
    of a too-long `h` would alias taps past ``2·worN`` back onto the grid).
    """
    import jax.numpy as jnp

    h = jnp.asarray(h)
    worN = int(worN)
    n_fft = 2 * worN
    if h.shape[-1] <= n_fft:
        H = jnp.fft.rfft(h, n=n_fft)[..., :worN]
    else:
        wn = jnp.linspace(0.0, jnp.pi, worN, endpoint=False)
        n = jnp.arange(h.shape[-1])
        E = jnp.exp(-1j * wn[:, None] * n[None, :])
        H = jnp.einsum("wn,...n->...w", E, h.astype(E.dtype))
    w = jnp.linspace(0.0, fs / 2, worN, endpoint=False)
    return w, H
