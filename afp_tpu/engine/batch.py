"""Per-stream parameter banks (SURVEY.md §7 step 5).

The reference runs one stream with one parameter set.  The TPU engine's
scaling axis is thousands of concurrent streams — and each can carry its OWN
EQ gain vector (and, via gain-weighted band combination, its own effective
kernel): `combined_response` is a ``[B, n_bands] × [n_bands, F]`` contraction
followed by a broadcast multiply, so per-stream banks cost one small matmul
and zero recompilation.

Supported on both conv strategies: the FFT path contracts gains into a
[B, F] response (one small matmul); the td_mxu path evaluates every band's
convolution in one wide MXU dot and mixes per stream in-kernel
(``fir_td_mxu_per_stream`` — costs n_bands× the shared dot, so FFT is the
better per-stream strategy at large band counts).  Per-stream *tap-level*
kernels (different numtaps per stream) are intentionally out of scope: that
is a shape change, which the static-shape contract forbids mid-stream.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .pipeline import DeviceParams, Pipeline

__all__ = ["with_per_stream_gains", "broadcast_gains"]


def broadcast_gains(gains, batch: int, n_bands: int) -> jnp.ndarray:
    """Normalize a gain spec to [batch, n_bands]: accepts [n_bands] (shared),
    [batch, n_bands] (per-stream), or a scalar."""
    g = jnp.asarray(np.asarray(gains, dtype=np.float32))
    if g.ndim == 0:
        g = jnp.full((batch, n_bands), g)
    elif g.ndim == 1:
        if g.shape[0] != n_bands:
            raise ValueError(f"expected {n_bands} gains, got {g.shape[0]}")
        g = jnp.broadcast_to(g[None, :], (batch, n_bands))
    elif g.ndim == 2:
        if g.shape != (batch, n_bands):
            raise ValueError(f"expected gains [{batch}, {n_bands}], got {g.shape}")
    else:
        raise ValueError("gains must be scalar, [n_bands], or [batch, n_bands]")
    return g


def with_per_stream_gains(pipe: Pipeline, params: DeviceParams,
                          gains) -> DeviceParams:
    """Return params with a per-stream gain matrix [batch, n_bands].

    ``combined_response`` then yields a [batch, F] response — each stream is
    filtered by its own EQ curve in the same fused FFT pass.
    """
    n_bands = params.H_bands.shape[0]
    g = broadcast_gains(gains, pipe.batch, n_bands)
    return params._replace(eq_gains=g)
