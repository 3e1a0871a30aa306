"""Time-domain FIR convolution on the MXU (Pallas kernel).

The FFT overlap-save path costs O(log F) per sample on the VPU/FFT units; for
short-to-medium kernels a direct time-domain convolution mapped onto the MXU
systolic array wins: express the convolution as a banded-Toeplitz matmul

    y[b, t·128 + j] = Σ_k h[k] · x_ext[b, t·128 + j − k + (N−1)]
                    = (X_window[b, :] @ T_h)[j]

with ``T_h[i, j] = h[N−1 + j − i]`` a [N−1+128, 128] band matrix built ONCE on
the host, resident in VMEM, and one ``jnp.dot`` per (batch-tile, time-tile).
fp32 with fp32 accumulation (keeps the −90 dB contract; bf16 would not).

Used by the engine as an alternative execution strategy for the fused
single-rate cascade (`conv_strategy='td_mxu'`); numerically equivalent to the
FFT path (equivalence-tested in tests/test_pallas.py, via interpret mode on
CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["band_matrix", "fir_td_mxu", "fir_conv_xla"]

import os as _os

#: output-tile width (columns of the band matrix); 128 = one MXU lane tile,
#: wider tiles mean fewer, larger dots per kernel invocation
LANE = int(_os.environ.get("AFP_TD_TILE", "128"))

#: HIGHEST = 6-pass fp32-equivalent (Mosaic supports only DEFAULT/HIGHEST;
#: DEFAULT rounds inputs to bf16 and fails the −90 dB contract)
_PRECISION = getattr(__import__("jax").lax.Precision,
                     _os.environ.get("AFP_TD_PRECISION", "HIGHEST"))


def band_matrix(h: np.ndarray, tile: int = LANE) -> np.ndarray:
    """Banded-Toeplitz operator [N−1+tile, tile] for convolution by `h`.

    T_h[i, j] = h[N−1 + j − i] (zero outside the band), so that for a window
    w = x_ext[s : s + N−1+tile] (oldest sample first),
    ``w @ T_h = (h ⊛ x)[s+N−1 : s+N−1+tile]`` (causal/valid outputs).
    """
    h = np.asarray(h, dtype=np.float32)
    N = len(h)
    rows = N - 1 + tile
    T = np.zeros((rows, tile), dtype=np.float32)
    i = np.arange(rows)[:, None]
    j = np.arange(tile)[None, :]
    k = N - 1 + j - i
    mask = (k >= 0) & (k < N)
    T[mask] = h[k[mask]]
    return T


def _fir_kernel(x_ref, band_ref, o_ref, *, n_taps: int, t_tiles: int):
    """One batch-tile: x_ref [BT, T + N − 1] → o_ref [BT, T].

    precision=HIGHEST is load-bearing: the MXU's default f32 path rounds
    inputs to bf16 (measured −50 dB vs oracle); the multi-pass mode restores
    fp32-equivalent accuracy for the −90 dB contract.
    """
    for t in range(t_tiles):
        w = x_ref[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        o_ref[:, t * LANE : (t + 1) * LANE] = jnp.dot(
            w, band_ref[:, :],
            preferred_element_type=jnp.float32,
            precision=_PRECISION,
        )


def _pick_b_tile(B: int, text: int, T: int) -> int:
    """Batch tile choice.

    Empirical VMEM rule on v5e: a [256, text]+[256, T] tile pair
    (~17 MB double-buffered) compiles for grids ≤16 programs but trips the
    16 MB scoped-vmem limit at larger grids (Mosaic adds pipeline buffering).
    Use 256 rows up to grid 16, then halve until the footprint fits
    ~12 MB double-buffered.
    """
    for b_tile in (256, 128, 64, 32, 16, 8):
        if B % b_tile:
            continue
        grid = B // b_tile
        foot = 2 * b_tile * (text + T) * 4
        if b_tile == 256 and grid <= 16:
            return b_tile
        if foot <= 12 * 2**20:
            return b_tile
    return min(B, 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fir_td_call(x_ext: jnp.ndarray, band: jnp.ndarray, interpret: bool = False):
    B, text = x_ext.shape
    n_taps = band.shape[0] - LANE + 1
    T = text - (n_taps - 1)
    t_tiles = T // LANE
    b_tile = _pick_b_tile(B, text, T)
    kernel = functools.partial(_fir_kernel, n_taps=n_taps, t_tiles=t_tiles)
    return pl.pallas_call(
        kernel,
        grid=(B // b_tile,),
        in_specs=[
            pl.BlockSpec((b_tile, text), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band.shape[0], LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.float32),
        interpret=interpret,
    )(x_ext, band)


def fir_td_mxu(x_ext: jnp.ndarray, band: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """Causal/valid FIR conv of [B, T+N−1] against the band matrix → [B, T].

    `T` must be a multiple of 128 and `B` a multiple of the batch tile
    (≤256); the engine's static shapes guarantee both.  `interpret=True` runs
    the Pallas interpreter (CPU tests).
    """
    x_ext = jnp.asarray(x_ext, dtype=jnp.float32)
    band = jnp.asarray(band, dtype=jnp.float32)
    B, text = x_ext.shape
    n_taps = band.shape[0] - LANE + 1
    T = text - (n_taps - 1)
    if T % LANE:
        raise ValueError(f"output length {T} must be a multiple of {LANE}")
    if B % _pick_b_tile(B, text, T):
        raise ValueError(f"batch {B} must be divisible by the batch tile")
    return _fir_td_call(x_ext, band, interpret=interpret)


def fir_conv_xla(x_ext: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """XLA-native valid conv baseline ([B, T+N−1] ⊛ h[N] → [B, T]) via
    `conv_general_dilated` — XLA lowers plain 1-D convs to the MXU itself;
    used to cross-check the hand-written kernel's performance."""
    x_ext = jnp.asarray(x_ext, dtype=jnp.float32)
    h = jnp.asarray(h, dtype=jnp.float32)
    B, text = x_ext.shape
    N = h.shape[-1]
    out = jax.lax.conv_general_dilated(
        x_ext[:, None, :],
        h[::-1][None, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out[:, 0, :]
