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

__all__ = ["band_matrix", "wide_band_matrix", "fir_td_mxu",
           "fir_td_mxu_pair", "fir_td_mxu_per_stream", "fir_conv_xla",
           "fir_td_mxu_ring", "fir_td_mxu_ring_f32", "fir_td_mxu_ring_mega",
           "fir_td_mxu_ring_mega_f32", "fir_td_mxu_ring_pcm16",
           "fir_td_mxu_ring_mega_pcm16", "fir_td_mxu_pair_to_ring", "fir_td_mxu_banked", "band_stack",
           "split_bf16", "merge_bf16", "PCM16_SCALE", "quantize_pcm16",
           "PRECISION_MODE"]

import os as _os

#: output-tile width (columns of the band matrix); 128 = one MXU lane tile,
#: wider tiles mean fewer, larger dots per kernel invocation
LANE = int(_os.environ.get("AFP_TD_TILE", "128"))

#: Precision mode for the MXU dot:
#:   'HIGHEST' — XLA's 6-pass fp32-equivalent (Mosaic supports only
#:               DEFAULT/HIGHEST; DEFAULT rounds inputs to bf16 and fails
#:               the −90 dB contract at −50 dB),
#:   'B3'      — first-party 3-pass bf16×3 split: x = x_hi + x_lo and
#:               h = h_hi + h_lo in bf16, y ≈ x_hi·h_hi + x_hi·h_lo +
#:               x_lo·h_hi (the h_lo·x_lo term is ~2⁻¹⁸ relative — below
#:               the −90 dB bar), each pass a native-speed bf16 MXU matmul
#:               with fp32 accumulation ⇒ ~2× the 6-pass throughput.
#:               This is the Precision.HIGH algorithm Mosaic doesn't expose,
#:               implemented manually.
PRECISION_MODE = _os.environ.get("AFP_TD_PRECISION", "B3").upper()
# every bf16-split mode (B3/B3F/B3C) uses explicit bf16 operands, so the
# jax-level dot precision only matters for the HIGHEST path
_PRECISION = getattr(__import__("jax").lax.Precision,
                     "HIGHEST" if PRECISION_MODE.startswith("B3")
                     else PRECISION_MODE)


def merge_bf16(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`split_bf16` to combined-bf16 precision: the f32
    reconstruction ``hi + lo`` (each term widened to f32 BEFORE the add —
    a bf16 add would silently lose the lo half's contribution)."""
    return hi.astype(jnp.float32) + lo.astype(jnp.float32)


def split_bf16(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact hi/lo bf16 split of an f32 array: hi = v with the low 16
    mantissa bits masked off (exactly representable in bf16), lo = v − hi.

    Deliberately NOT ``v.astype(bf16)``: inside jit, XLA's excess-precision
    pass folds the ``f32→bf16→f32`` convert pair to identity, which silently
    zeroes the lo part and collapses bf16×3 to single-pass bf16 (measured
    −51 dB on hardware, round-2 probe).  The bitmask formulation has no
    convert pair to fold.
    """
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    # round-to-nearest-even in integer space (what bf16 conversion does),
    # then mask — one extra bit of lo headroom vs plain truncation
    u = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    hi32 = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi32.astype(jnp.bfloat16), (v - hi32).astype(jnp.bfloat16)



def _sem(interpret: bool, *axes: str) -> dict:
    """Mosaic ``dimension_semantics`` for a kernel's grid axes — batch-tile
    axes are 'parallel' (tiles touch disjoint rows and carry no cross-tile
    state), serving-step axes are 'arbitrary' (the VMEM tail carry is
    sequential per tile).  Measured +2.3% on the f32 serving megakernel at
    the headline shape (tools/mfu_sweep.py, v5e).  Interpret mode takes no
    compiler params."""
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        dimension_semantics=axes)}


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


def _tile_noise(shape, lsb: float, tpdf: bool):
    """Shared noise math — single source of truth in dither_pl.tile_noise."""
    from .dither_pl import tile_noise

    return tile_noise(shape, lsb, tpdf)


def _finish_tile(y, seed_ref, lsb, tpdf, out_clip, out_dtype=None):
    """Shared output-stage epilogue: optional output clip (the reference's
    ±0.99 clamp, `stream_process_AGC.py:180`) THEN optional requantization
    dither — the pipeline's stage order (clip, then dither).

    With an int16 `out_dtype` (``emit='pcm16'`` — the dither's actual
    target format: the reference dithers precisely so the sound card's
    16-bit requantization decorrelates, `stream_process.py:83-90`) the
    dithered value quantizes on the way to the store:
    ``int16(clip(round(y·32768), ±full_scale))`` (round half-to-even, the
    IEEE default) — the output HBM bytes and device→host drain HALVE."""
    if out_clip is not None:
        y = jnp.clip(y, -out_clip, out_clip)
    if seed_ref is not None:
        y = y + _tile_noise(y.shape, lsb, tpdf)
    if out_dtype is not None and jnp.dtype(out_dtype) == jnp.dtype(jnp.int16):
        y = jnp.clip(jnp.round(y * 32768.0), -32768.0, 32767.0
                     ).astype(jnp.int16)
    return y


def _fir_kernel(x_ref, band_ref, o_ref, *, n_taps: int, t_tiles: int,
                seed_ref=None, lsb: float = 0.0, tpdf: bool = True,
                out_clip=None):
    """One batch-tile: x_ref [BT, T + N − 1] → o_ref [BT, T].

    precision=HIGHEST is load-bearing: the MXU's default f32 path rounds
    inputs to bf16 (measured −50 dB vs oracle); the multi-pass mode restores
    fp32-equivalent accuracy for the −90 dB contract.  With `seed_ref` /
    `out_clip`, requantization dither and the output clamp fuse into the
    output store (saves full output read+write round-trips vs standalone
    passes).
    """
    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    for t in range(t_tiles):
        w = x_ref[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        y = jnp.dot(
            w, band_ref[:, :],
            preferred_element_type=jnp.float32,
            precision=_PRECISION,
        )
        o_ref[:, t * LANE : (t + 1) * LANE] = _finish_tile(
            y, seed_ref, lsb, tpdf, out_clip, out_dtype=o_ref.dtype)


def _fir_kernel_b3(xhi_ref, xlo_ref, bhi_ref, blo_ref, o_ref, *, n_taps: int,
                   t_tiles: int, seed_ref=None, lsb: float = 0.0,
                   tpdf: bool = True, out_clip=None):
    """bf16×3 batch-tile kernel: three native bf16 MXU passes accumulate in
    fp32.  Both operand hi/lo splits happen OUTSIDE the kernel (the two bf16
    input blocks together cost exactly the bytes of one f32 block, keeping
    the VMEM/double-buffering footprint identical to the HIGHEST path).
    Optional fused output clip + dither as in :func:`_fir_kernel`."""
    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    for t in range(t_tiles):
        w_hi = xhi_ref[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        w_lo = xlo_ref[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        y = (
            jnp.dot(w_hi, bhi_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, blo_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, bhi_ref[:, :], preferred_element_type=jnp.float32)
        )
        o_ref[:, t * LANE : (t + 1) * LANE] = _finish_tile(
            y, seed_ref, lsb, tpdf, out_clip, out_dtype=o_ref.dtype)


def _split_bf16_in_kernel(v):
    """The integer-RN bf16 split, Mosaic-side (see :func:`split_bf16` for why
    astype round-trips cannot be trusted)."""
    u = pltpu.bitcast(v, jnp.uint32)
    u = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    hi32 = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi32.astype(jnp.bfloat16), (v - hi32).astype(jnp.bfloat16)


#: int16 PCM full-scale convention: sample n → n / 32768 (−32768 → −1.0),
#: matching `utils.wavio.read_wav` and the sounddevice int16 mapping.  A
#: power-of-two scale, so the conversion is EXACT in f32.
PCM16_SCALE = 1.0 / 32768.0


def quantize_pcm16(y: jnp.ndarray) -> jnp.ndarray:
    """f32 → int16 PCM with the framework's single quantizer semantics:
    ``int16(clip(round(y·32768), −32768, 32767))``, round half-to-even
    (the IEEE default — same op the fused kernel epilogue runs, so XLA
    fallback paths and the in-kernel ``emit_i16`` store are bit-identical
    given the same dithered f32 input).  The inverse is ``n / 32768``
    (:data:`PCM16_SCALE`), matching the ingest convention."""
    return jnp.clip(jnp.round(y * 32768.0), -32768.0, 32767.0
                    ).astype(jnp.int16)


def _load_f32(v):
    """Read an input ref's value as f32.  int16 PCM refs convert on the
    VPU with the ±1.0 full-scale convention (``n · 2⁻¹⁵`` — bit-exact).

    For 16-bit-integer-valued data the bf16 hi/lo split that follows is
    itself EXACT: the rounded hi half captures the top ≤ 8 significant
    bits and the residual is an integer multiple of the sample ulp with
    ≤ 8 significant bits left, so ``hi + lo == x`` bitwise — the pcm16
    ring path therefore adds ZERO split error on the x operand (unlike
    f32 ingest, whose sub-lo residual is dropped at ~2⁻¹⁶ relative)."""
    if v.dtype == jnp.int16:
        return v.astype(jnp.float32) * PCM16_SCALE
    return v


def _fir_kernel_b3f(x_ref, bhi_ref, blo_ref, o_ref, *, n_taps: int,
                    t_tiles: int, seed_ref=None, lsb: float = 0.0,
                    tpdf: bool = True, out_clip=None):
    """B3 with the input hi/lo split INSIDE the kernel: the x block arrives
    as one f32 buffer and splits once in VMEM — removes the two materialized
    bf16 copies of the extended signal from HBM (−128 MB of traffic per
    headline block) at the cost of ~4.5 MB of in-kernel temporaries (the
    batch tile is capped at 128 rows to fit)."""
    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    x_hi, x_lo = _split_bf16_in_kernel(x_ref[:, :])
    for t in range(t_tiles):
        w_hi = x_hi[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        w_lo = x_lo[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        y = (
            jnp.dot(w_hi, bhi_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, blo_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, bhi_ref[:, :], preferred_element_type=jnp.float32)
        )
        o_ref[:, t * LANE : (t + 1) * LANE] = _finish_tile(
            y, seed_ref, lsb, tpdf, out_clip, out_dtype=o_ref.dtype)


def _fir_kernel_b3t(xhi_ref, xlo_ref, thi_ref, tlo_ref, bhi_ref, blo_ref,
                    o_ref, *, k_pad: int, t_tiles: int, seed_ref=None,
                    lsb: float = 0.0, tpdf: bool = True, out_clip=None,
                    thi_o=None, tlo_o=None):
    """Pair-input B3 kernel: the extended signal arrives as FOUR refs — the
    current block's bf16 hi/lo pair plus the carried overlap tail's pair —
    so the conv stage needs NO input staging pass at all when the upstream
    producer (the fused AGC apply kernel, `agc_scan.py` ``emit_split``)
    already stores the pair: no XLA concat materialization, no standalone
    hi/lo split round trip.

    The tail is padded to ``k_pad`` (a LANE multiple; the padded band's top
    rows are zero, so the extra leading history is numerically inert) —
    every window slice is then lane-ALIGNED, and only the first
    ``k_pad/LANE`` tiles stitch their window from two aligned pieces.  (A
    first version concatenated the full extended rows in VMEM; the bulk
    copy ate the staging savings — measured flat at the C8 point.)"""
    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    for t in range(t_tiles):
        off = t * LANE
        if off < k_pad:  # window straddles the tail/block boundary
            w_hi = jnp.concatenate(
                [thi_ref[:, off:], xhi_ref[:, : off + LANE]], axis=-1)
            w_lo = jnp.concatenate(
                [tlo_ref[:, off:], xlo_ref[:, : off + LANE]], axis=-1)
        else:
            s = off - k_pad
            w_hi = xhi_ref[:, s : s + k_pad + LANE]
            w_lo = xlo_ref[:, s : s + k_pad + LANE]
        y = (
            jnp.dot(w_hi, bhi_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, blo_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, bhi_ref[:, :], preferred_element_type=jnp.float32)
        )
        o_ref[:, t * LANE : (t + 1) * LANE] = _finish_tile(
            y, seed_ref, lsb, tpdf, out_clip, out_dtype=o_ref.dtype)
    if thi_o is not None:
        # emit the NEXT step's overlap tail — the last k_pad samples of the
        # extended signal concat(tail, x) — straight from VMEM, so the
        # serving loop needs no separate tail-slice HBM round trip
        T = t_tiles * LANE
        if k_pad <= T:
            thi_o[:, :] = xhi_ref[:, T - k_pad :]
            tlo_o[:, :] = xlo_ref[:, T - k_pad :]
        else:
            thi_o[:, :] = jnp.concatenate(
                [thi_ref[:, T:], xhi_ref[:, :]], axis=-1)
            tlo_o[:, :] = jnp.concatenate(
                [tlo_ref[:, T:], xlo_ref[:, :]], axis=-1)


#: time-chunk width of the pair-chunk layout (must be a LANE multiple and
#: ≥ n_taps−1 so every window fits in two consecutive chunks)
T_CHUNK = 512


def _fir_kernel_b3c(xa_ref, xb_ref, bhi_ref, blo_ref, o_ref, *, n_taps: int,
                    seed_ref=None, lsb: float = 0.0, tpdf: bool = True,
                    out_clip=None):
    """Pair-chunk B3 kernel: the grid walks (batch-tile × time-chunk) and
    each program reads TWO consecutive [bt, T_CHUNK] chunks of the f32
    extended signal — Mosaic pipelines the small fetches, the window
    stitches across the pair, and the hi/lo split happens on the narrow
    concat in VMEM.  Versus the full-text layout this removes the
    materialized bf16 signal copies AND the VMEM pressure that forced
    batch-tile caps (blocks are ~0.5 MB instead of ~4.5 MB)."""
    if seed_ref is not None:
        pltpu.prng_seed(
            seed_ref[0, 0]
            + pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        )
    x = jnp.concatenate([xa_ref[:, :], xb_ref[:, :]], axis=-1)
    x_hi, x_lo = _split_bf16_in_kernel(x[:, : T_CHUNK + n_taps - 1])
    for t in range(T_CHUNK // LANE):
        w_hi = x_hi[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        w_lo = x_lo[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        y = (
            jnp.dot(w_hi, bhi_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, blo_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, bhi_ref[:, :], preferred_element_type=jnp.float32)
        )
        o_ref[:, t * LANE : (t + 1) * LANE] = _finish_tile(
            y, seed_ref, lsb, tpdf, out_clip, out_dtype=o_ref.dtype)


def _pick_b_tile(B: int, text: int, T: int, cap: int = 256) -> int:
    """Batch tile choice.

    Empirical VMEM rule on v5e: a [256, text]+[256, T] tile pair
    (~17 MB double-buffered) compiles for grids ≤16 programs but trips the
    16 MB scoped-vmem limit at larger grids (Mosaic adds pipeline buffering).
    Use 256 rows up to grid 16, then halve until the footprint fits
    ~12 MB double-buffered.  `cap` lowers the ceiling for kernels with
    in-kernel temporaries (the B3F split).
    """
    for b_tile in (256, 128, 64, 32, 16, 8):
        if b_tile > cap or B % b_tile:
            continue
        grid = B // b_tile
        foot = 2 * b_tile * (text + T) * 4
        if b_tile == 256 and grid <= 16:
            return b_tile
        if foot <= 12 * 2**20:
            return b_tile
    return min(B, 8)


@functools.partial(jax.jit, static_argnames=(
    "interpret", "precision", "dither_bits", "dither_tpdf", "out_clip",
    "emit_i16"))
def _fir_td_call(x_ext: jnp.ndarray, band: jnp.ndarray, interpret: bool = False,
                 precision: str = PRECISION_MODE, seed=None,
                 dither_bits: int | None = None, dither_tpdf: bool = True,
                 out_clip: float | None = None, emit_i16: bool = False):
    B, text = x_ext.shape
    n_taps = band.shape[0] - LANE + 1
    T = text - (n_taps - 1)
    t_tiles = T // LANE
    b_tile = _pick_b_tile(B, text, T, cap=128 if precision == "B3F" else 256)
    grid = (B // b_tile,)
    x_spec = pl.BlockSpec((b_tile, text), lambda i: (i, 0), memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((band.shape[0], LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b_tile, T), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(
        (B, T), jnp.int16 if emit_i16 else jnp.float32)
    seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    dkw = {"out_clip": out_clip}
    if dither_bits is not None:
        dkw.update(lsb=2.0 ** (1 - dither_bits), tpdf=dither_tpdf)
    if precision == "B3C":
        # pair-chunk layout: usable when windows span ≤ 2 chunks, the output
        # tiles evenly, and the batch supports 256-row tiles
        bt = 256 if B % 256 == 0 else (B if B <= 8 else None)
        if (n_taps - 1 <= T_CHUNK and T % T_CHUNK == 0 and bt is not None):
            n_in_chunks = -(-text // T_CHUNK) + 1  # +1: j+1 fetch at the edge
            x_pad = jnp.pad(
                x_ext, ((0, 0), (0, n_in_chunks * T_CHUNK - text)))
            b_hi, b_lo = split_bf16(band)
            kernel = functools.partial(_fir_kernel_b3c, n_taps=n_taps, **dkw)
            grid2 = (B // bt, T // T_CHUNK)
            xa_spec = pl.BlockSpec((bt, T_CHUNK), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)
            xb_spec = pl.BlockSpec((bt, T_CHUNK), lambda i, j: (i, j + 1),
                                   memory_space=pltpu.VMEM)
            band2 = pl.BlockSpec((band.shape[0], LANE), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM)
            out2 = pl.BlockSpec((bt, T_CHUNK), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
            seed2 = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                 memory_space=pltpu.SMEM)
            if dither_bits is not None:
                kern = lambda s, a, b, c, d, o: kernel(a, b, c, d, o, seed_ref=s)
                return pl.pallas_call(
                    kern, grid=grid2,
                    in_specs=[seed2, xa_spec, xb_spec, band2, band2],
                    out_specs=out2, out_shape=out_shape, interpret=interpret,
                )(seed, x_pad, x_pad, b_hi, b_lo)
            return pl.pallas_call(
                kernel, grid=grid2,
                in_specs=[xa_spec, xb_spec, band2, band2],
                out_specs=out2, out_shape=out_shape, interpret=interpret,
            )(x_pad, x_pad, b_hi, b_lo)
        precision = "B3"  # constraints unmet: fall through to the full layout
    if precision == "B3F":
        b_hi, b_lo = split_bf16(band)
        kernel = functools.partial(_fir_kernel_b3f, n_taps=n_taps,
                                   t_tiles=t_tiles, **dkw)
        if dither_bits is not None:
            kern = lambda s, a, c, d, o: kernel(a, c, d, o, seed_ref=s)
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[seed_spec, x_spec, band_spec, band_spec],
                out_specs=out_spec, out_shape=out_shape, interpret=interpret,
                **_sem(interpret, "parallel"),
            )(seed, x_ext, b_hi, b_lo)
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[x_spec, band_spec, band_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
            **_sem(interpret, "parallel"),
        )(x_ext, b_hi, b_lo)
    if precision == "B3":
        x_hi, x_lo = split_bf16(x_ext)
        b_hi, b_lo = split_bf16(band)
        kernel = functools.partial(_fir_kernel_b3, n_taps=n_taps,
                                   t_tiles=t_tiles, **dkw)
        if dither_bits is not None:
            kern = lambda s, a, b, c, d, o: kernel(a, b, c, d, o, seed_ref=s)
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[seed_spec, x_spec, x_spec, band_spec, band_spec],
                out_specs=out_spec, out_shape=out_shape, interpret=interpret,
                **_sem(interpret, "parallel"),
            )(seed, x_hi, x_lo, b_hi, b_lo)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[x_spec, x_spec, band_spec, band_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
            **_sem(interpret, "parallel"),
        )(x_hi, x_lo, b_hi, b_lo)
    kernel = functools.partial(_fir_kernel, n_taps=n_taps, t_tiles=t_tiles,
                               **dkw)
    if dither_bits is not None:
        kern = lambda s, a, b, o: kernel(a, b, o, seed_ref=s)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[seed_spec, x_spec, band_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
            **_sem(interpret, "parallel"),
        )(seed, x_ext, band)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, band_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        **_sem(interpret, "parallel"),
    )(x_ext, band)


def band_stack(kernels: np.ndarray, tile: int = LANE) -> np.ndarray:
    """Stack of band matrices for D same-length kernels: [D, N] →
    [D, N−1+tile, tile] — the operand bank of the BANKED (per-stream
    filter) kernels, where a scalar-prefetched per-tile assignment selects
    which design's band each batch tile multiplies (SURVEY §7.5 "each
    stream can have its own kernel", on the td_mxu strategy).  Cold path
    (numpy, float64-designed taps in, f32 out)."""
    kernels = np.asarray(kernels, dtype=np.float32)
    return np.stack([band_matrix(k, tile) for k in kernels])


@functools.partial(jax.jit, static_argnames=(
    "interpret", "dither_bits", "dither_tpdf", "out_clip", "emit_i16",
    "bt"))
def _fir_td_banked_call(assign_t, x_ext, bands, interpret: bool = False,
                        seed=None, dither_bits: int | None = None,
                        dither_tpdf: bool = True,
                        out_clip: float | None = None,
                        emit_i16: bool = False, bt: int | None = None):
    """Staged banked conv: like :func:`_fir_td_call`'s B3 branch, but the
    band operand is a [D, rows, LANE] STACK and each batch-tile program's
    BlockSpec index_map picks its design via the scalar-prefetched
    per-tile assignment — per-stream filters at the SHARED-kernel dot
    cost (the selection is pure addressing; zero extra FLOPs)."""
    B, text = x_ext.shape
    D, rows, _ = bands.shape
    n_taps = rows - LANE + 1
    T = text - (n_taps - 1)
    t_tiles = T // LANE
    b_tile = bt or _pick_b_tile(B, text, T)
    grid = (B // b_tile,)
    x_hi, x_lo = split_bf16(x_ext)
    b_hi, b_lo = split_bf16(bands)
    x_spec = pl.BlockSpec((b_tile, text), lambda i, a: (i, 0),
                          memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((None, rows, LANE), lambda i, a: (a[i], 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b_tile, T), lambda i, a: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(
        (B, T), jnp.int16 if emit_i16 else jnp.float32)
    seed_spec = pl.BlockSpec((1, 1), lambda i, a: (0, 0),
                             memory_space=pltpu.SMEM)
    dkw = {"out_clip": out_clip}
    if dither_bits is not None:
        dkw.update(lsb=2.0 ** (1 - dither_bits), tpdf=dither_tpdf)
    kernel = functools.partial(_fir_kernel_b3, n_taps=n_taps,
                               t_tiles=t_tiles, **dkw)
    if dither_bits is not None:
        kern = lambda a_ref, s, xh, xl, bh, bl, o: kernel(
            xh, xl, bh, bl, o, seed_ref=s)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[seed_spec, x_spec, x_spec, band_spec, band_spec],
            out_specs=out_spec)
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret, **_sem(interpret, "parallel"),
        )(assign_t, seed, x_hi, x_lo, b_hi, b_lo)
    kern = lambda a_ref, xh, xl, bh, bl, o: kernel(xh, xl, bh, bl, o)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[x_spec, x_spec, band_spec, band_spec],
        out_specs=out_spec)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        **_sem(interpret, "parallel"),
    )(assign_t, x_hi, x_lo, b_hi, b_lo)


def fir_td_mxu_banked(x_ext: jnp.ndarray, bands: jnp.ndarray, assign,
                      interpret: bool = False, dither_seed=None,
                      dither_bits: int | None = None,
                      dither_tpdf: bool = True,
                      out_clip: float | None = None,
                      emit_i16: bool = False,
                      bt: int | None = None) -> jnp.ndarray:
    """Per-stream-filter FIR conv on the MXU: stream `b` is convolved with
    design ``assign[b]`` of the [D, N−1+LANE, LANE] band stack
    (:func:`band_stack`), at the SHARED-kernel cost — the design index
    rides a scalar-prefetch BlockSpec, so selection is addressing, not
    compute.  B3 precision (three bf16 passes, fp32 accumulation), with
    the optional fused clip/dither/int16-emit epilogue of
    :func:`fir_td_mxu`.

    `assign`: [B] int32 design per stream, CONSTANT within each batch
    tile (the engine validates at build time — group identical designs in
    tile-sized row blocks); the kernel consumes the per-tile stride.
    """
    x_ext = jnp.asarray(x_ext, dtype=jnp.float32)
    bands = jnp.asarray(bands, dtype=jnp.float32)
    B, text = x_ext.shape
    n_taps = bands.shape[1] - LANE + 1
    T = text - (n_taps - 1)
    if T % LANE:
        raise ValueError(f"output length {T} must be a multiple of {LANE}")
    pick = _pick_b_tile(B, text, T)
    if bt is None:
        bt = pick
    elif bt > pick or B % bt or bt not in (256, 128, 64, 32, 16, 8, B):
        raise ValueError(
            f"bt={bt} must be a ladder tile ≤ the picked {pick} dividing "
            f"batch {B} (smaller tiles trade pipelining for finer "
            "per-stream design granularity)")
    if B % bt:
        raise ValueError(f"batch {B} must be divisible by the batch tile")
    assign_t = jnp.asarray(assign, dtype=jnp.int32).reshape(-1)[::bt]
    return _fir_td_banked_call(assign_t, x_ext, bands, interpret=interpret,
                               seed=dither_seed, dither_bits=dither_bits,
                               dither_tpdf=dither_tpdf, out_clip=out_clip,
                               emit_i16=emit_i16, bt=bt)


def _pick_b_tile_banded(B: int, bytes_per_row: int) -> int:
    """Shared batch-tile ladder for the banded-Toeplitz pair/f32-ring
    kernels: ONE candidate ladder, ONE VMEM cap, ONE tiny-batch fallback.

    The dithered f32-ring ↔ staged-pair bit-equality certified on
    hardware (tools/hw_check.py) requires both input forms to pick the
    same batch tile whenever their VMEM footprints allow — the fused
    dither PRNG seeds per batch-tile program, so a tile mismatch remaps
    noise to different rows.  Keeping the ladder/cap/fallback in one
    place makes that agreement structural; the forms differ only in
    `bytes_per_row` (the f32 kernel's in-kernel split temporaries cost
    extra VMEM, so it may step DOWN the shared ladder earlier — never
    off-ladder).  tests/test_pallas.py pins the invariant at the
    certified shapes."""
    for b_tile in (256, 128, 64, 32, 16, 8):
        if B % b_tile:
            continue
        if b_tile * bytes_per_row <= 12 * 2**20:
            return b_tile
    if B <= 8:  # tiny batches run as a single B-row tile
        return B
    raise ValueError(
        f"batch {B} is not divisible by any supported batch tile "
        "(must be ≤ 8 or a multiple of 8)")


def _pick_b_tile_b3t(B: int, k_pad: int, T: int) -> int:
    """Batch tile for the pair-input kernel: double-buffered in pair
    (T·4 B/row across the two bf16 halves) + tail pair + out, no bulk
    scratch (windows slice the refs in place)."""
    return _pick_b_tile_banded(B, 2 * T * 4 + 2 * k_pad * 4 + 2 * T * 4)


@functools.partial(jax.jit, static_argnames=(
    "interpret", "dither_bits", "dither_tpdf", "out_clip", "emit_tail",
    "emit_i16"))
def _fir_td_pair_call(x_hi, x_lo, tail_hi, tail_lo, band,
                      interpret: bool = False, seed=None,
                      dither_bits: int | None = None, dither_tpdf: bool = True,
                      out_clip: float | None = None,
                      emit_tail: bool = False, emit_i16: bool = False):
    B, T = x_hi.shape
    k_pad = tail_hi.shape[1]  # LANE multiple ≥ n_taps − 1
    n_taps = band.shape[0] - LANE + 1
    assert k_pad % LANE == 0 and k_pad >= n_taps - 1, (k_pad, n_taps)
    # zero top rows align the padded-tail geometry (numerically inert:
    # the extra leading history multiplies zeros)
    band_p = jnp.pad(band, ((k_pad - (n_taps - 1), 0), (0, 0)))
    t_tiles = T // LANE
    b_hi, b_lo = split_bf16(band_p)
    bt = _pick_b_tile_b3t(B, k_pad, T)
    grid = (B // bt,)
    x_spec = pl.BlockSpec((bt, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((bt, k_pad), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((band_p.shape[0], LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = pl.BlockSpec((bt, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(
        (B, T), jnp.int16 if emit_i16 else jnp.float32)
    if emit_tail:
        tail_out = pl.BlockSpec((bt, k_pad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_specs = [out_specs, tail_out, tail_out]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16),
                     jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16)]
    seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    dkw = {"out_clip": out_clip}
    if dither_bits is not None:
        dkw.update(lsb=2.0 ** (1 - dither_bits), tpdf=dither_tpdf)
    kernel = functools.partial(_fir_kernel_b3t, k_pad=k_pad,
                               t_tiles=t_tiles, **dkw)
    if dither_bits is not None:
        if emit_tail:
            kern = lambda s, a, b, c, d, e, f, o, th, tl: kernel(
                a, b, c, d, e, f, o, seed_ref=s, thi_o=th, tlo_o=tl)
        else:
            kern = lambda s, a, b, c, d, e, f, o: kernel(
                a, b, c, d, e, f, o, seed_ref=s)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[seed_spec, x_spec, x_spec, t_spec, t_spec,
                      band_spec, band_spec],
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
            **_sem(interpret, "parallel"),
        )(seed, x_hi, x_lo, tail_hi, tail_lo, b_hi, b_lo)
    if emit_tail:
        kern = lambda a, b, c, d, e, f, o, th, tl: kernel(
            a, b, c, d, e, f, o, thi_o=th, tlo_o=tl)
    else:
        kern = kernel
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[x_spec, x_spec, t_spec, t_spec, band_spec, band_spec],
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
        **_sem(interpret, "parallel"),
    )(x_hi, x_lo, tail_hi, tail_lo, b_hi, b_lo)


def fir_td_mxu_pair(x_hi: jnp.ndarray, x_lo: jnp.ndarray,
                    tail_hi: jnp.ndarray, tail_lo: jnp.ndarray,
                    band: jnp.ndarray, interpret: bool = False,
                    dither_seed=None, dither_bits: int | None = None,
                    dither_tpdf: bool = True,
                    out_clip: float | None = None,
                    emit_tail: bool = False, emit_i16: bool = False):
    """Causal/valid FIR conv consuming the bf16 hi/lo PAIR of the block and
    of the carried overlap tail → [B, T] f32 (or int16 PCM with
    ``emit_i16`` — dither+quantize fused into the store, `_finish_tile`).

    Numerically ≡ ``fir_td_mxu(concat([tail, x]), band, precision='B3')``
    when the pairs are :func:`split_bf16` of the f32 inputs (the kernel
    stitches lane-aligned window slices and runs the same three bf16 MXU
    passes).  Producers that already hold the block in VMEM (the fused AGC
    apply kernel) can emit the pair directly, eliminating the conv input
    staging round trip — see `docs/BENCHMARKS.md`.

    The tail pair provides ≥ N−1 trailing samples of history.  Its width is
    padded up to a LANE multiple (extra LEADING samples — any content — are
    numerically inert against the padded band's zero rows); a width of
    exactly N−1 is accepted and zero-padded here for one-shot use.

    With ``emit_tail=True`` returns ``(y, next_tail_hi, next_tail_lo)`` —
    the [B, k_pad] bf16 overlap pair for the next block, emitted by the
    kernel from its VMEM-resident inputs (no separate slice pass).
    """
    assert x_hi.dtype == jnp.bfloat16 and tail_hi.dtype == jnp.bfloat16
    band = jnp.asarray(band, dtype=jnp.float32)
    if x_hi.shape[-1] % LANE:
        raise ValueError(
            f"T={x_hi.shape[-1]} must be a multiple of {LANE}")
    k = band.shape[0] - LANE  # n_taps − 1
    k_pad = -(-max(k, 1) // LANE) * LANE
    if tail_hi.shape[1] != k_pad:
        pad = k_pad - tail_hi.shape[1]
        assert pad > 0, (tail_hi.shape, k_pad)
        tail_hi = jnp.pad(tail_hi, ((0, 0), (pad, 0)))
        tail_lo = jnp.pad(tail_lo, ((0, 0), (pad, 0)))
    return _fir_td_pair_call(x_hi, x_lo, tail_hi, tail_lo, band,
                             interpret=interpret, seed=dither_seed,
                             dither_bits=dither_bits, dither_tpdf=dither_tpdf,
                             out_clip=out_clip, emit_tail=emit_tail,
                             emit_i16=emit_i16)


@functools.partial(jax.jit, static_argnames=(
    "interpret", "dither_bits", "dither_tpdf", "out_clip", "emit_tail"))
def _fir_td_pair_to_ring_call(idx, x_hi, x_lo, tail_hi, tail_lo, band,
                              out_ring, interpret: bool = False, seed=None,
                              dither_bits: int | None = None,
                              dither_tpdf: bool = True,
                              out_clip: float | None = None,
                              emit_tail: bool = False):
    """Pair-input conv writing slot `idx` of the DONATED [S, B, T] output
    ring in place (scalar-prefetch out BlockSpec + input_output_aliases) —
    the f32-chain analog of :func:`_fir_td_ring_call`, for producers like
    the fused AGC apply kernel whose pair output is a plain array but whose
    consumer is a serving ring."""
    B, T = x_hi.shape
    k_pad = tail_hi.shape[1]
    n_taps = band.shape[0] - LANE + 1
    assert k_pad % LANE == 0 and k_pad >= n_taps - 1, (k_pad, n_taps)
    band_p = jnp.pad(band, ((k_pad - (n_taps - 1), 0), (0, 0)))
    t_tiles = T // LANE
    b_hi, b_lo = split_bf16(band_p)
    bt = _pick_b_tile_b3t(B, k_pad, T)
    grid = (B // bt,)
    S = out_ring.shape[0]
    x_spec = pl.BlockSpec((bt, T), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((bt, k_pad), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((band_p.shape[0], LANE), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 1), lambda i, s: (0, 0),
                             memory_space=pltpu.SMEM)
    ring_io_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_specs = pl.BlockSpec((None, bt, T), lambda i, s: (s[0], i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((S, B, T), out_ring.dtype)
    if emit_tail:
        tail_out = pl.BlockSpec((bt, k_pad), lambda i, s: (i, 0),
                                memory_space=pltpu.VMEM)
        out_specs = [out_specs, tail_out, tail_out]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16),
                     jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16)]
    dkw = {"out_clip": out_clip}
    if dither_bits is not None:
        dkw.update(lsb=2.0 ** (1 - dither_bits), tpdf=dither_tpdf)
    kernel = functools.partial(_fir_kernel_b3t, k_pad=k_pad,
                               t_tiles=t_tiles, **dkw)
    if dither_bits is not None:
        if emit_tail:
            kern = lambda sidx, s, a, b, c, d, e, f, rio, o, th, tl: kernel(
                a, b, c, d, e, f, o, seed_ref=s, thi_o=th, tlo_o=tl)
        else:
            kern = lambda sidx, s, a, b, c, d, e, f, rio, o: kernel(
                a, b, c, d, e, f, o, seed_ref=s)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[seed_spec, x_spec, x_spec, t_spec, t_spec,
                      band_spec, band_spec, ring_io_spec],
            out_specs=out_specs)
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            input_output_aliases={8: 0}, interpret=interpret,
            **_sem(interpret, "parallel"),
        )(idx, seed, x_hi, x_lo, tail_hi, tail_lo, b_hi, b_lo, out_ring)
    if emit_tail:
        kern = lambda sidx, a, b, c, d, e, f, rio, o, th, tl: kernel(
            a, b, c, d, e, f, o, thi_o=th, tlo_o=tl)
    else:
        kern = lambda sidx, a, b, c, d, e, f, rio, o: kernel(
            a, b, c, d, e, f, o)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[x_spec, x_spec, t_spec, t_spec,
                  band_spec, band_spec, ring_io_spec],
        out_specs=out_specs)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={7: 0}, interpret=interpret,
        **_sem(interpret, "parallel"),
    )(idx, x_hi, x_lo, tail_hi, tail_lo, b_hi, b_lo, out_ring)


def fir_td_mxu_pair_to_ring(x_hi: jnp.ndarray, x_lo: jnp.ndarray,
                            tail_hi: jnp.ndarray, tail_lo: jnp.ndarray,
                            band: jnp.ndarray, idx,
                            out_ring: jnp.ndarray,
                            interpret: bool = False,
                            dither_seed=None, dither_bits: int | None = None,
                            dither_tpdf: bool = True,
                            out_clip: float | None = None,
                            emit_tail: bool = False):
    """:func:`fir_td_mxu_pair` writing its result into slot `idx` of the
    DONATED [S, B, T] f32 `out_ring` in place (all other slots preserved,
    no staging `dynamic_update_slice`).  Numerics identical to
    :func:`fir_td_mxu_pair` on the same inputs (same kernel body).

    With ``emit_tail=True`` returns ``(out_ring, next_tail_hi,
    next_tail_lo)`` — the [B, k_pad] bf16 overlap pair for the NEXT block
    (the last ``k_pad`` samples of ``concat(tail, x)``), written from VMEM
    by the kernel itself so the serving loop carries the tail without a
    separate slice pass over the block."""
    assert x_hi.dtype == jnp.bfloat16 and tail_hi.dtype == jnp.bfloat16
    band = jnp.asarray(band, dtype=jnp.float32)
    if x_hi.shape[-1] % LANE:
        raise ValueError(f"T={x_hi.shape[-1]} must be a multiple of {LANE}")
    k = band.shape[0] - LANE
    k_pad = -(-max(k, 1) // LANE) * LANE
    if tail_hi.shape[1] != k_pad:
        pad = k_pad - tail_hi.shape[1]
        assert pad > 0, (tail_hi.shape, k_pad)
        tail_hi = jnp.pad(tail_hi, ((0, 0), (pad, 0)))
        tail_lo = jnp.pad(tail_lo, ((0, 0), (pad, 0)))
    idx = jnp.asarray(idx, dtype=jnp.int32).reshape(1)
    return _fir_td_pair_to_ring_call(
        idx, x_hi, x_lo, tail_hi, tail_lo, band, out_ring,
        interpret=interpret, seed=dither_seed, dither_bits=dither_bits,
        dither_tpdf=dither_tpdf, out_clip=out_clip, emit_tail=emit_tail)


@functools.partial(jax.jit, static_argnames=(
    "interpret", "dither_bits", "dither_tpdf", "out_clip", "emit_tail"))
def _fir_td_ring_call(idx, ring_hi, ring_lo, tail_hi, tail_lo, band, out_ring,
                      interpret: bool = False, seed=None,
                      dither_bits: int | None = None, dither_tpdf: bool = True,
                      out_clip: float | None = None, emit_tail: bool = False):
    S, B, T = ring_hi.shape
    k_pad = tail_hi.shape[1]
    n_taps = band.shape[0] - LANE + 1
    assert k_pad % LANE == 0 and k_pad >= n_taps - 1, (k_pad, n_taps)
    band_p = jnp.pad(band, ((k_pad - (n_taps - 1), 0), (0, 0)))
    t_tiles = T // LANE
    b_hi, b_lo = split_bf16(band_p)
    bt = _pick_b_tile_b3t(B, k_pad, T)
    grid = (B // bt,)
    # scalar-prefetch index_maps: grid index first, then the prefetched
    # block-index ref — (None, bt, T) blocks squeeze the slot axis, so the
    # kernel body is EXACTLY _fir_kernel_b3t (same refs, same shapes)
    ring_spec = pl.BlockSpec((None, bt, T), lambda i, s: (s[0], i, 0),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((bt, k_pad), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((band_p.shape[0], LANE), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 1), lambda i, s: (0, 0),
                             memory_space=pltpu.SMEM)
    # the aliased output ring rides through untouched (ANY = no VMEM
    # round trip for the blocks this step does not write)
    ring_io_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_specs = pl.BlockSpec((None, bt, T), lambda i, s: (s[0], i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((S, B, T), out_ring.dtype)
    if emit_tail:
        # second/third outputs: the next step's overlap tail pair, copied
        # out of the VMEM-resident block instead of a separate HBM slice
        tail_out = pl.BlockSpec((bt, k_pad), lambda i, s: (i, 0),
                                memory_space=pltpu.VMEM)
        out_specs = [out_specs, tail_out, tail_out]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16),
                     jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16)]
    dkw = {"out_clip": out_clip}
    if dither_bits is not None:
        dkw.update(lsb=2.0 ** (1 - dither_bits), tpdf=dither_tpdf)
    kernel = functools.partial(_fir_kernel_b3t, k_pad=k_pad,
                               t_tiles=t_tiles, **dkw)
    if dither_bits is not None:
        if emit_tail:
            kern = lambda sidx, s, a, b, c, d, e, f, rio, o, th, tl: kernel(
                a, b, c, d, e, f, o, seed_ref=s, thi_o=th, tlo_o=tl)
        else:
            kern = lambda sidx, s, a, b, c, d, e, f, rio, o: kernel(
                a, b, c, d, e, f, o, seed_ref=s)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[seed_spec, ring_spec, ring_spec, t_spec, t_spec,
                      band_spec, band_spec, ring_io_spec],
            out_specs=out_specs)
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            input_output_aliases={8: 0}, interpret=interpret,
            **_sem(interpret, "parallel"),
        )(idx, seed, ring_hi, ring_lo, tail_hi, tail_lo, b_hi, b_lo, out_ring)
    if emit_tail:
        kern = lambda sidx, a, b, c, d, e, f, rio, o, th, tl: kernel(
            a, b, c, d, e, f, o, thi_o=th, tlo_o=tl)
    else:
        kern = lambda sidx, a, b, c, d, e, f, rio, o: kernel(
            a, b, c, d, e, f, o)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[ring_spec, ring_spec, t_spec, t_spec,
                  band_spec, band_spec, ring_io_spec],
        out_specs=out_specs)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={7: 0}, interpret=interpret,
        **_sem(interpret, "parallel"),
    )(idx, ring_hi, ring_lo, tail_hi, tail_lo, b_hi, b_lo, out_ring)


def fir_td_mxu_ring(ring_hi: jnp.ndarray, ring_lo: jnp.ndarray, idx,
                    tail_hi: jnp.ndarray, tail_lo: jnp.ndarray,
                    band: jnp.ndarray, out_ring: jnp.ndarray,
                    interpret: bool = False,
                    dither_seed=None, dither_bits: int | None = None,
                    dither_tpdf: bool = True,
                    out_clip: float | None = None,
                    emit_tail: bool = False):
    """Zero-copy serving-ring FIR step: convolve block `idx` of an
    HBM-resident input ring straight into slot `idx` of the output ring.

    The sustained serving loop used to pay two HBM→HBM copies per step
    around the conv kernel: a `dynamic_slice` staging the current block out
    of the input ring (the kernel can only read whole operands) and a
    `dynamic_update_slice` staging its result into the output ring —
    ~270 MB/step of pure copy traffic at the headline shape, ≈40% of the
    measured marginal (`docs/BENCHMARKS.md` roofline).  This variant
    removes both: the block index rides as a scalar-prefetch argument
    (`pltpu.PrefetchScalarGridSpec`), the input BlockSpec's index_map
    selects the ring slot directly (HBM→VMEM streaming, no staging copy),
    and the output ring is donated via `input_output_aliases` with the
    out BlockSpec writing the same slot in place.

    `ring_hi`/`ring_lo`: [S, B, T] bf16 pair (block-major serving ring);
    `idx`: int32 [1] — which slot to process; `tail_hi`/`tail_lo`: the
    carried overlap pair, exactly as :func:`fir_td_mxu_pair`;
    `out_ring`: [S, B, T] f32, DONATED — returns the updated ring (slot
    `idx` replaced, all other slots preserved).  Numerics are identical to
    :func:`fir_td_mxu_pair` on the sliced block (same kernel body).

    With ``emit_tail=True`` returns ``(out_ring, next_tail_hi,
    next_tail_lo)`` — the overlap pair for the next step, emitted from the
    VMEM-resident block so the serving loop's tail carry costs no separate
    `dynamic_slice` over the HBM ring (see :func:`fir_td_mxu_pair_to_ring`).
    """
    assert ring_hi.dtype == jnp.bfloat16 and tail_hi.dtype == jnp.bfloat16
    band = jnp.asarray(band, dtype=jnp.float32)
    if ring_hi.shape[-1] % LANE:
        raise ValueError(f"T={ring_hi.shape[-1]} must be a multiple of {LANE}")
    k = band.shape[0] - LANE  # n_taps − 1
    k_pad = -(-max(k, 1) // LANE) * LANE
    if tail_hi.shape[1] != k_pad:
        pad = k_pad - tail_hi.shape[1]
        assert pad > 0, (tail_hi.shape, k_pad)
        tail_hi = jnp.pad(tail_hi, ((0, 0), (pad, 0)))
        tail_lo = jnp.pad(tail_lo, ((0, 0), (pad, 0)))
    idx = jnp.asarray(idx, dtype=jnp.int32).reshape(1)
    return _fir_td_ring_call(idx, ring_hi, ring_lo, tail_hi, tail_lo, band,
                             out_ring, interpret=interpret, seed=dither_seed,
                             dither_bits=dither_bits, dither_tpdf=dither_tpdf,
                             out_clip=out_clip, emit_tail=emit_tail)


def _fir_kernel_b3t_f32(x_ref, t_ref, bhi_ref, blo_ref, o_ref, *, k_pad: int,
                        t_tiles: int, seed_ref=None, lsb: float = 0.0,
                        tpdf: bool = True, out_clip=None, t_o=None,
                        bank_assign_ref=None):
    """f32-input variant of :func:`_fir_kernel_b3t`: the block and carried
    overlap tail arrive as RAW f32 refs and the bf16 hi/lo split happens
    once in VMEM (`_split_bf16_in_kernel` — measured bit-identical to the
    XLA-side :func:`split_bf16` on hardware, and elementwise, so it
    commutes with the concat/window slicing).  Numerics class: identical
    to the PAIR kernels (same k_pad-padded band, same window geometry) —
    asserted bit-exact against staged `fir_td_mxu_pair` steps on hardware
    (tools/hw_check.py); vs the UNPADDED staged f32 `fir_td_mxu` B3 path
    the k_pad band pad changes the dot's K extent and the MXU regroups
    the fp32 accumulation, a measured ≤ −110 dB ulp-scale bound (the
    same effect documented for the conv-pair path; interpret mode is
    bit-exact either way).

    This is what makes a zero-copy serving ring possible under the
    reference's f32 input contract: the HBM ring holds plain f32 blocks
    (no ingest-side split), and since a bf16 pair costs exactly the bytes
    of one f32 array, the HBM traffic equals the pair-ring's.  With
    ``t_o`` the kernel also emits the next step's f32 tail (last k_pad
    samples of concat(tail, x)) from VMEM."""
    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    if bank_assign_ref is not None:
        # RESIDENT design bank (banked per-step ring): the refs hold the
        # whole [D, rows, LANE] hi/lo stacks, fetched ONCE per launch
        # (constant-index block — the same revisit hoist the shared band
        # enjoys); each tile selects its design by a dynamic leading-axis
        # VMEM read.  The per-tile BlockSpec selection re-DMAs the band
        # from HBM for every batch tile (B/bt fetches per step — the
        # measured per-step banked ring gap, BENCHMARKS.md r5).
        a_i = bank_assign_ref[pl.program_id(0)]
        b_hi = bhi_ref[pl.ds(a_i, 1)].reshape(bhi_ref.shape[1:])
        b_lo = blo_ref[pl.ds(a_i, 1)].reshape(blo_ref.shape[1:])
    else:
        b_hi = bhi_ref[:, :]
        b_lo = blo_ref[:, :]
    x_hi, x_lo = _split_bf16_in_kernel(_load_f32(x_ref[:, :]))
    t_hi, t_lo = _split_bf16_in_kernel(_load_f32(t_ref[:, :]))
    for t in range(t_tiles):
        off = t * LANE
        if off < k_pad:  # window straddles the tail/block boundary
            w_hi = jnp.concatenate(
                [t_hi[:, off:], x_hi[:, : off + LANE]], axis=-1)
            w_lo = jnp.concatenate(
                [t_lo[:, off:], x_lo[:, : off + LANE]], axis=-1)
        else:
            s = off - k_pad
            w_hi = x_hi[:, s : s + k_pad + LANE]
            w_lo = x_lo[:, s : s + k_pad + LANE]
        y = (
            jnp.dot(w_hi, b_hi, preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, b_lo, preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, b_hi, preferred_element_type=jnp.float32)
        )
        o_ref[:, t * LANE : (t + 1) * LANE] = _finish_tile(
            y, seed_ref, lsb, tpdf, out_clip, out_dtype=o_ref.dtype)
    if t_o is not None:
        T = t_tiles * LANE
        if k_pad <= T:
            t_o[:, :] = x_ref[:, T - k_pad :]
        else:
            t_o[:, :] = jnp.concatenate([t_ref[:, T:], x_ref[:, :]], axis=-1)


def _pick_b_tile_b3t_f32(B: int, k_pad: int, T: int) -> int:
    """Batch tile for the f32-ring kernel: f32 block (T·4 B/row,
    double-buffered) + its in-kernel bf16 pair temporaries (T·4 B/row,
    single copy) + f32 tail in/out and pair temporaries (k_pad·16 B/row)
    + f32 out (T·8 B/row double-buffered).  Shares the candidate ladder
    with :func:`_pick_b_tile_b3t` via :func:`_pick_b_tile_banded` — when
    the shape lets both pick the same tile, the fused-dither noise↔row
    mapping matches the pair kernels' and the dithered f32 ring is
    bit-identical to the staged pair path."""
    return _pick_b_tile_banded(
        B, 2 * T * 4 + 2 * T * 2 + 4 * k_pad * 4 + 2 * T * 4)


@functools.partial(jax.jit, static_argnames=(
    "interpret", "dither_bits", "dither_tpdf", "out_clip", "bt_override",
    "resident"))
def _fir_td_ring_f32_call(idx, ring, tail, band, out_ring,
                          interpret: bool = False, seed=None,
                          dither_bits: int | None = None,
                          dither_tpdf: bool = True,
                          out_clip: float | None = None,
                          assign_t=None, bt_override: int | None = None,
                          resident: bool = False):
    S, B, T = ring.shape
    banked = band.ndim == 3  # [D, rows, LANE] per-design stack + assign_t
    k_pad = tail.shape[1]
    n_taps = band.shape[-2] - LANE + 1
    assert k_pad % LANE == 0 and k_pad >= n_taps - 1, (k_pad, n_taps)
    pad_rows = ((k_pad - (n_taps - 1), 0), (0, 0))
    band_p = jnp.pad(band, ((0, 0),) + pad_rows if banked else pad_rows)
    t_tiles = T // LANE
    b_hi, b_lo = split_bf16(band_p)
    bt = bt_override or _pick_b_tile_b3t_f32(B, k_pad, T)
    grid = (B // bt,)
    # prefetch layout: pref[0] = slot idx always; banked adds the per-tile
    # design assignment as pref[1] (dither seeds stay a plain SMEM operand)
    ring_spec = pl.BlockSpec((None, bt, T),
                             lambda i, *pref: (pref[0][0], i, 0),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((bt, k_pad), lambda i, *pref: (i, 0),
                          memory_space=pltpu.VMEM)
    if banked and resident:
        # whole-bank VMEM residency: constant-index [D, rows, LANE] block →
        # fetched once per launch (revisit hoist), per-tile design selected
        # in-kernel from the prefetched assignment — closes the per-tile
        # band re-DMA gap of the per-step banked ring (BENCHMARKS.md r5)
        band_spec = pl.BlockSpec(
            (band_p.shape[0], band_p.shape[-2], LANE),
            lambda i, *pref: (0, 0, 0), memory_space=pltpu.VMEM)
    elif banked:
        band_spec = pl.BlockSpec((None, band_p.shape[-2], LANE),
                                 lambda i, *pref: (pref[1][i], 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        band_spec = pl.BlockSpec((band_p.shape[-2], LANE),
                                 lambda i, *pref: (0, 0),
                                 memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 1), lambda i, *pref: (0, 0),
                             memory_space=pltpu.SMEM)
    ring_io_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_specs = [
        pl.BlockSpec((None, bt, T), lambda i, *pref: (pref[0][0], i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, k_pad), lambda i, *pref: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    # tail rides the ingest dtype: f32 contract → f32, pcm16 → raw int16
    # history (exact, and half the tail bytes)
    out_shape = [jax.ShapeDtypeStruct((S, B, T), out_ring.dtype),
                 jax.ShapeDtypeStruct((B, k_pad), tail.dtype)]
    dkw = {"out_clip": out_clip}
    if dither_bits is not None:
        dkw.update(lsb=2.0 ** (1 - dither_bits), tpdf=dither_tpdf)
    kernel = functools.partial(_fir_kernel_b3t_f32, k_pad=k_pad,
                               t_tiles=t_tiles, **dkw)
    n_pref = 2 if banked else 1
    pref_args = (idx, assign_t) if banked else (idx,)
    rkw = lambda a: {"bank_assign_ref": a[1]} if (banked and resident) else {}
    if dither_bits is not None:
        kern = lambda *a: kernel(a[n_pref + 1], a[n_pref + 2], a[n_pref + 3],
                                 a[n_pref + 4], a[n_pref + 6],
                                 seed_ref=a[n_pref], t_o=a[n_pref + 7],
                                 **rkw(a))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_pref, grid=grid,
            in_specs=[seed_spec, ring_spec, t_spec, band_spec, band_spec,
                      ring_io_spec],
            out_specs=out_specs)
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            input_output_aliases={n_pref + 5: 0}, interpret=interpret,
            **_sem(interpret, "parallel"),
        )(*pref_args, seed, ring, tail, b_hi, b_lo, out_ring)
    kern = lambda *a: kernel(a[n_pref], a[n_pref + 1], a[n_pref + 2],
                             a[n_pref + 3], a[n_pref + 5],
                             t_o=a[n_pref + 6], **rkw(a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pref, grid=grid,
        in_specs=[ring_spec, t_spec, band_spec, band_spec, ring_io_spec],
        out_specs=out_specs)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={n_pref + 4: 0}, interpret=interpret,
        **_sem(interpret, "parallel"),
    )(*pref_args, ring, tail, b_hi, b_lo, out_ring)


def fir_td_mxu_ring_f32(ring: jnp.ndarray, idx, tail: jnp.ndarray,
                        band: jnp.ndarray, out_ring: jnp.ndarray,
                        interpret: bool = False,
                        dither_seed=None, dither_bits: int | None = None,
                        dither_tpdf: bool = True,
                        out_clip: float | None = None,
                        assign=None, bt: int | None = None):
    """Zero-copy serving-ring FIR step under the f32 INPUT CONTRACT: the
    HBM input ring holds raw f32 blocks (no ingest-side bf16 split), the
    kernel splits in VMEM and convolves slot `idx` straight into slot
    `idx` of the DONATED output ring.

    Same HBM bytes as the pair ring (a bf16 pair = one f32 array), same
    three bf16 MXU passes.  Outputs are bit-identical to the staged PAIR
    path (`fir_td_mxu_pair` — same padded-band geometry; asserted on
    hardware) and match the staged f32
    ``fir_td_mxu(concat([tail, x]), band, precision='B3')`` path to the
    documented ≤ −110 dB accumulation-order bound (bit-exact in
    interpret mode) — see :func:`_fir_kernel_b3t_f32`.  `tail`: [B, k_pad]
    f32 carried history (k_pad = n_taps−1 rounded up to a LANE multiple;
    narrower tails are zero-padded here for one-shot use).  Returns
    ``(out_ring, next_tail)`` — the next step's f32 tail emitted from the
    VMEM-resident block.

    `assign` + a [D, rows, LANE] band STACK (:func:`band_stack`) engage
    the BANKED form: stream `b` convolves with design ``assign[b]``
    (tile-constant; selection is a scalar-prefetch BlockSpec — same dot
    cost as the shared kernel).
    """
    assert ring.dtype == jnp.float32 and tail.dtype == jnp.float32
    band, tail = _ring_geometry(ring, tail, band)
    idx = jnp.asarray(idx, dtype=jnp.int32).reshape(1)
    a_t, bt = _ring_assign(assign, ring.shape[1], tail.shape[1],
                           ring.shape[2], bt)
    return _fir_td_ring_f32_call(idx, ring, tail, band, out_ring,
                                 interpret=interpret, seed=dither_seed,
                                 dither_bits=dither_bits,
                                 dither_tpdf=dither_tpdf, out_clip=out_clip,
                                 assign_t=a_t, bt_override=bt,
                                 resident=_bank_resident(
                                     band, tail.shape[1]))


def _bank_resident(band, k_pad: int) -> bool:
    """Whole-bank VMEM residency decision for the BANKED per-step ring
    kernels: resident when the padded [D, k_pad+LANE, LANE] hi/lo stacks
    fit the budget (``AFP_RESIDENT_BANK_MB``, default 3 MB) — then the
    bank is DMA'd once per launch instead of once per batch tile
    (`_fir_kernel_b3t_f32` bank_assign_ref note).  ``AFP_BANKED_RESIDENT``
    forces it on ('1') or off ('0') for A/B measurement."""
    if band.ndim != 3:
        return False
    mode = _os.environ.get("AFP_BANKED_RESIDENT", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    budget = float(_os.environ.get("AFP_RESIDENT_BANK_MB", "3")) * 2 ** 20
    return 2 * 2 * band.shape[0] * (k_pad + LANE) * LANE <= budget


def _ring_geometry(ring, tail, band):
    """Shared wrapper plumbing for the raw-input serving rings (f32 and
    pcm16, per-step and mega forms): band coercion, the LANE rule on the
    slot length, and zero-padding a narrow carried tail to the kernel's
    k_pad (n_taps−1 rounded up to a LANE multiple).  One definition so
    the four public wrappers can never diverge on the geometry rules."""
    band = jnp.asarray(band, dtype=jnp.float32)
    if ring.shape[-1] % LANE:
        raise ValueError(f"T={ring.shape[-1]} must be a multiple of {LANE}")
    k = band.shape[-2] - LANE  # band [rows, LANE] or banked [D, rows, LANE]
    k_pad = -(-max(k, 1) // LANE) * LANE
    if tail.shape[1] != k_pad:
        pad = k_pad - tail.shape[1]
        assert pad > 0, (tail.shape, k_pad)
        tail = jnp.pad(tail, ((0, 0), (pad, 0)))
    return band, tail


def _ring_assign(assign, B: int, k_pad: int, T: int,
                 bt: int | None = None):
    """Per-tile design assignment for the banked ring forms: [B] int32 per
    stream → [B // bt] per batch tile (the engine validated constancy).
    Returns ``(assign_t, bt)``; an explicit `bt` must sit on the tile
    ladder at or below the VMEM pick (finer per-stream granularity)."""
    pick = _pick_b_tile_b3t_f32(B, k_pad, T)
    if assign is None:
        return None, None
    if bt is None:
        bt = pick
    elif bt > pick or B % bt or bt not in (256, 128, 64, 32, 16, 8, B):
        raise ValueError(
            f"bt={bt} must be a ladder tile ≤ the picked {pick} dividing "
            f"batch {B}")
    return jnp.asarray(assign, dtype=jnp.int32).reshape(-1)[::bt], bt


def fir_td_mxu_ring_pcm16(ring: jnp.ndarray, idx, tail: jnp.ndarray,
                          band: jnp.ndarray, out_ring: jnp.ndarray,
                          interpret: bool = False,
                          dither_seed=None, dither_bits: int | None = None,
                          dither_tpdf: bool = True,
                          out_clip: float | None = None,
                          assign=None, bt: int | None = None):
    """Zero-copy serving-ring FIR step under an int16 PCM INPUT CONTRACT:
    the HBM input ring holds raw int16 blocks (the source format of most
    real audio — WAV PCM, sound-card DMA), the kernel converts to f32 on
    the VPU (``n / 32768``, exact) and splits the bf16 pair in VMEM.

    vs the f32 ring this HALVES the input-side HBM bytes (and the
    host→device ingest transfer) and the split is EXACT for 16-bit data
    (see :func:`_load_f32`), so outputs are BIT-IDENTICAL to the staged
    pair / f32-ring paths fed the same ``n / 32768`` values — same padded
    band geometry, same three bf16 MXU passes (asserted on hardware,
    tools/hw_check.py).  `tail`: [B, k_pad] raw int16 carried history;
    returns ``(out_ring, next_tail)`` with the next tail emitted in int16
    (half the tail bytes, zero conversion loss).  The f32 OUTPUT ring and
    the fused clip/dither epilogue are unchanged.
    """
    assert ring.dtype == jnp.int16 and tail.dtype == jnp.int16, (
        ring.dtype, tail.dtype)
    band, tail = _ring_geometry(ring, tail, band)
    idx = jnp.asarray(idx, dtype=jnp.int32).reshape(1)
    a_t, bt = _ring_assign(assign, ring.shape[1], tail.shape[1],
                           ring.shape[2], bt)
    return _fir_td_ring_f32_call(idx, ring, tail, band, out_ring,
                                 interpret=interpret, seed=dither_seed,
                                 dither_bits=dither_bits,
                                 dither_tpdf=dither_tpdf, out_clip=out_clip,
                                 assign_t=a_t, bt_override=bt,
                                 resident=_bank_resident(
                                     band, tail.shape[1]))


def _fir_kernel_b3mega(xhi_ref, xlo_ref, thi_ref, tlo_ref, bhi_ref, blo_ref,
                       o_ref, thi_o, tlo_o, *, k_pad: int, t_tiles: int,
                       seed_ref=None, lsb: float = 0.0, tpdf: bool = True,
                       out_clip=None):
    """Serving-loop megakernel body — the math of :func:`_fir_kernel_b3t`
    with the whole dispatch inside ONE ``pallas_call``.

    The grid walks (batch-tile MAJOR, serving step minor): each batch tile
    streams every ring slot through its VMEM in step order, so the overlap
    tail has no cross-tile dependency and can live in the (VMEM-resident,
    readable) tail OUTPUT refs across the inner step loop — initialized
    from the carried tail input at step 0, read for the straddle tiles,
    rewritten after the straddle reads.  Mosaic flushes the constant-index
    tail blocks once per tile, i.e. the FINAL tail — exactly the cross-
    dispatch carry.  No per-step kernel launch, no per-step tail HBM
    round trip, no `lax.scan` bookkeeping."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init_tail():
        thi_o[:, :] = thi_ref[:, :]
        tlo_o[:, :] = tlo_ref[:, :]

    if seed_ref is not None:
        # seed_ref is the FULL [n_steps, 1] seeds array, delivered as a
        # scalar-prefetch SMEM operand and indexed by the step program id
        # (a blocked (1,1) SMEM spec over [n_steps, 1] fails Mosaic's
        # sublane-divisibility rule on hardware — found on the first
        # on-TPU run; interpret mode accepts it)
        pltpu.prng_seed(seed_ref[step, 0] + pl.program_id(0))
    for t in range(t_tiles):
        off = t * LANE
        if off < k_pad:  # window straddles the tail/block boundary
            w_hi = jnp.concatenate(
                [thi_o[:, off:], xhi_ref[:, : off + LANE]], axis=-1)
            w_lo = jnp.concatenate(
                [tlo_o[:, off:], xlo_ref[:, : off + LANE]], axis=-1)
        else:
            s = off - k_pad
            w_hi = xhi_ref[:, s : s + k_pad + LANE]
            w_lo = xlo_ref[:, s : s + k_pad + LANE]
        y = (
            jnp.dot(w_hi, bhi_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, blo_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, bhi_ref[:, :], preferred_element_type=jnp.float32)
        )
        o_ref[:, t * LANE : (t + 1) * LANE] = _finish_tile(
            y, seed_ref, lsb, tpdf, out_clip, out_dtype=o_ref.dtype)
    T = t_tiles * LANE
    if k_pad <= T:
        thi_o[:, :] = xhi_ref[:, T - k_pad :]
        tlo_o[:, :] = xlo_ref[:, T - k_pad :]
    else:
        nh = jnp.concatenate([thi_o[:, T:], xhi_ref[:, :]], axis=-1)
        nl = jnp.concatenate([tlo_o[:, T:], xlo_ref[:, :]], axis=-1)
        thi_o[:, :] = nh
        tlo_o[:, :] = nl


@functools.partial(jax.jit, static_argnames=(
    "n_steps", "interpret", "dither_bits", "dither_tpdf", "out_clip"))
def _fir_td_ring_mega_call(start, seeds, ring_hi, ring_lo, tail_hi, tail_lo,
                           band, out_ring, n_steps: int,
                           interpret: bool = False,
                           dither_bits: int | None = None,
                           dither_tpdf: bool = True,
                           out_clip: float | None = None):
    S, B, T = ring_hi.shape
    k_pad = tail_hi.shape[1]
    n_taps = band.shape[0] - LANE + 1
    assert k_pad % LANE == 0 and k_pad >= n_taps - 1, (k_pad, n_taps)
    band_p = jnp.pad(band, ((k_pad - (n_taps - 1), 0), (0, 0)))
    t_tiles = T // LANE
    b_hi, b_lo = split_bf16(band_p)
    bt = _pick_b_tile_b3t(B, k_pad, T)
    grid = (B // bt, n_steps)  # tile MAJOR, step minor (see kernel docstring)
    # index maps take *pref so the same specs serve both the 1-prefetch
    # (no dither) and 2-prefetch (start + per-step seeds) forms; pref[0]
    # is always the start-slot ref
    ring_spec = pl.BlockSpec((None, bt, T),
                             lambda i, st, *pref: ((pref[0][0] + st) % S, i, 0),
                             memory_space=pltpu.VMEM)
    t_in_spec = pl.BlockSpec((bt, k_pad), lambda i, st, *pref: (i, 0),
                             memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((band_p.shape[0], LANE),
                             lambda i, st, *pref: (0, 0),
                             memory_space=pltpu.VMEM)
    ring_io_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_specs = [
        pl.BlockSpec((None, bt, T),
                     lambda i, st, *pref: ((pref[0][0] + st) % S, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, k_pad), lambda i, st, *pref: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, k_pad), lambda i, st, *pref: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((S, B, T), out_ring.dtype),
                 jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16),
                 jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16)]
    dkw = {"out_clip": out_clip}
    if dither_bits is not None:
        dkw.update(lsb=2.0 ** (1 - dither_bits), tpdf=dither_tpdf)
    kernel = functools.partial(_fir_kernel_b3mega, k_pad=k_pad,
                               t_tiles=t_tiles, **dkw)
    if dither_bits is not None:
        assert seeds is not None and seeds.shape == (n_steps, 1), seeds
        # seeds ride as a SECOND scalar-prefetch operand (the whole
        # [n_steps, 1] array lands in SMEM; the kernel indexes it by the
        # step program id) — a blocked (1,1) SMEM spec over it violates
        # Mosaic's sublane rule on hardware
        kern = lambda sidx, sd, a, b, c, d, e, f, rio, o, th, tl: kernel(
            a, b, c, d, e, f, o, th, tl, seed_ref=sd)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid,
            in_specs=[ring_spec, ring_spec, t_in_spec, t_in_spec,
                      band_spec, band_spec, ring_io_spec],
            out_specs=out_specs)
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            input_output_aliases={8: 0}, interpret=interpret,
            **_sem(interpret, "parallel", "arbitrary"),
        )(start, seeds, ring_hi, ring_lo, tail_hi, tail_lo, b_hi, b_lo,
          out_ring)
    kern = lambda sidx, a, b, c, d, e, f, rio, o, th, tl: kernel(
        a, b, c, d, e, f, o, th, tl)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[ring_spec, ring_spec, t_in_spec, t_in_spec,
                  band_spec, band_spec, ring_io_spec],
        out_specs=out_specs)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={7: 0}, interpret=interpret,
        **_sem(interpret, "parallel", "arbitrary"),
    )(start, ring_hi, ring_lo, tail_hi, tail_lo, b_hi, b_lo, out_ring)


def fir_td_mxu_ring_mega(ring_hi: jnp.ndarray, ring_lo: jnp.ndarray, start,
                         tail_hi: jnp.ndarray, tail_lo: jnp.ndarray,
                         band: jnp.ndarray, out_ring: jnp.ndarray,
                         n_steps: int, seeds=None,
                         interpret: bool = False,
                         dither_bits: int | None = None,
                         dither_tpdf: bool = True,
                         out_clip: float | None = None):
    """Whole-dispatch serving loop in ONE kernel launch: convolve ring slots
    ``(start+i) mod S`` for ``i < n_steps`` into the same slots of the
    DONATED output ring, carrying the overlap tail in VMEM across steps.

    Equivalent to ``n_steps`` chained :func:`fir_td_mxu_ring` calls (same
    per-step math, same per-step dither seed fold) but with no per-step
    kernel launch, no `lax.scan` carry traffic, and no tail HBM round
    trips.  When ``n_steps > S`` slots are revisited cyclically and each
    revisit fully overwrites the slot — the final ring matches the chained
    calls' final ring (intermediate overwrites are not observable within
    one dispatch).

    `seeds`: [n_steps, 1] int32 per-step hardware-PRNG seeds (required
    with `dither_bits`; build with the same per-step key fold as the
    chained path for bit-exact equivalence).  Returns ``(out_ring,
    next_tail_hi, next_tail_lo)``.
    """
    assert ring_hi.dtype == jnp.bfloat16 and tail_hi.dtype == jnp.bfloat16
    band = jnp.asarray(band, dtype=jnp.float32)
    if ring_hi.shape[-1] % LANE:
        raise ValueError(f"T={ring_hi.shape[-1]} must be a multiple of {LANE}")
    k = band.shape[0] - LANE
    k_pad = -(-max(k, 1) // LANE) * LANE
    if tail_hi.shape[1] != k_pad:
        pad = k_pad - tail_hi.shape[1]
        assert pad > 0, (tail_hi.shape, k_pad)
        tail_hi = jnp.pad(tail_hi, ((0, 0), (pad, 0)))
        tail_lo = jnp.pad(tail_lo, ((0, 0), (pad, 0)))
    start = jnp.asarray(start, dtype=jnp.int32).reshape(1)
    return _fir_td_ring_mega_call(
        start, seeds, ring_hi, ring_lo, tail_hi, tail_lo, band, out_ring,
        n_steps=int(n_steps), interpret=interpret, dither_bits=dither_bits,
        dither_tpdf=dither_tpdf, out_clip=out_clip)


def _fir_kernel_b3mega_f32(x_ref, t_in_ref, bhi_ref, blo_ref, o_ref, t_o,
                           *, k_pad: int, t_tiles: int, seed_ref=None,
                           lsb: float = 0.0, tpdf: bool = True,
                           out_clip=None):
    """f32 form of :func:`_fir_kernel_b3mega`: serving steps walk the grid's
    minor axis, the f32 overlap tail lives in the (VMEM-resident, readable)
    tail OUTPUT ref across the inner step loop, and the block/tail bf16
    splits happen in VMEM per step (numerics class of the PAIR kernels —
    see :func:`_fir_kernel_b3t_f32` for the exact equivalence contract)."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init_tail():
        t_o[:, :] = t_in_ref[:, :]

    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[step, 0] + pl.program_id(0))
    x_hi, x_lo = _split_bf16_in_kernel(_load_f32(x_ref[:, :]))
    t_hi, t_lo = _split_bf16_in_kernel(_load_f32(t_o[:, :]))
    for t in range(t_tiles):
        off = t * LANE
        if off < k_pad:
            w_hi = jnp.concatenate(
                [t_hi[:, off:], x_hi[:, : off + LANE]], axis=-1)
            w_lo = jnp.concatenate(
                [t_lo[:, off:], x_lo[:, : off + LANE]], axis=-1)
        else:
            s = off - k_pad
            w_hi = x_hi[:, s : s + k_pad + LANE]
            w_lo = x_lo[:, s : s + k_pad + LANE]
        y = (
            jnp.dot(w_hi, bhi_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, blo_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, bhi_ref[:, :], preferred_element_type=jnp.float32)
        )
        o_ref[:, t * LANE : (t + 1) * LANE] = _finish_tile(
            y, seed_ref, lsb, tpdf, out_clip, out_dtype=o_ref.dtype)
    T = t_tiles * LANE
    if k_pad <= T:
        t_o[:, :] = x_ref[:, T - k_pad :]
    else:
        t_o[:, :] = jnp.concatenate([t_o[:, T:], x_ref[:, :]], axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "n_steps", "interpret", "dither_bits", "dither_tpdf", "out_clip",
    "bt_override"))
def _fir_td_ring_mega_f32_call(start, seeds, ring, tail, band, out_ring,
                               n_steps: int, interpret: bool = False,
                               dither_bits: int | None = None,
                               dither_tpdf: bool = True,
                               out_clip: float | None = None,
                               assign_t=None, bt_override: int | None = None):
    S, B, T = ring.shape
    banked = band.ndim == 3
    k_pad = tail.shape[1]
    n_taps = band.shape[-2] - LANE + 1
    assert k_pad % LANE == 0 and k_pad >= n_taps - 1, (k_pad, n_taps)
    pad_rows = ((k_pad - (n_taps - 1), 0), (0, 0))
    band_p = jnp.pad(band, ((0, 0),) + pad_rows if banked else pad_rows)
    t_tiles = T // LANE
    b_hi, b_lo = split_bf16(band_p)
    bt = bt_override or _pick_b_tile_b3t_f32(B, k_pad, T)
    grid = (B // bt, n_steps)  # tile MAJOR, step minor
    # prefetch layout: pref[0] = start slot; banked inserts the per-tile
    # design assignment as pref[1]; per-step dither seeds are always LAST
    ring_spec = pl.BlockSpec((None, bt, T),
                             lambda i, st, *pref: ((pref[0][0] + st) % S, i, 0),
                             memory_space=pltpu.VMEM)
    t_in_spec = pl.BlockSpec((bt, k_pad), lambda i, st, *pref: (i, 0),
                             memory_space=pltpu.VMEM)
    if banked:
        band_spec = pl.BlockSpec((None, band_p.shape[-2], LANE),
                                 lambda i, st, *pref: (pref[1][i], 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        band_spec = pl.BlockSpec((band_p.shape[-2], LANE),
                                 lambda i, st, *pref: (0, 0),
                                 memory_space=pltpu.VMEM)
    ring_io_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_specs = [
        pl.BlockSpec((None, bt, T),
                     lambda i, st, *pref: ((pref[0][0] + st) % S, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, k_pad), lambda i, st, *pref: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((S, B, T), out_ring.dtype),
                 jax.ShapeDtypeStruct((B, k_pad), tail.dtype)]
    dkw = {"out_clip": out_clip}
    if dither_bits is not None:
        dkw.update(lsb=2.0 ** (1 - dither_bits), tpdf=dither_tpdf)
    kernel = functools.partial(_fir_kernel_b3mega_f32, k_pad=k_pad,
                               t_tiles=t_tiles, **dkw)
    n_pref = 2 if banked else 1
    pref = (start, assign_t) if banked else (start,)
    if dither_bits is not None:
        assert seeds is not None and seeds.shape == (n_steps, 1), seeds
        kern = lambda *a: kernel(a[n_pref + 1], a[n_pref + 2], a[n_pref + 3],
                                 a[n_pref + 4], a[n_pref + 6],
                                 a[n_pref + 7], seed_ref=a[n_pref])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_pref + 1, grid=grid,
            in_specs=[ring_spec, t_in_spec, band_spec, band_spec,
                      ring_io_spec],
            out_specs=out_specs)
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            input_output_aliases={n_pref + 5: 0}, interpret=interpret,
            **_sem(interpret, "parallel", "arbitrary"),
        )(*pref, seeds, ring, tail, b_hi, b_lo, out_ring)
    kern = lambda *a: kernel(a[n_pref], a[n_pref + 1], a[n_pref + 2],
                             a[n_pref + 3], a[n_pref + 5], a[n_pref + 6])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pref, grid=grid,
        in_specs=[ring_spec, t_in_spec, band_spec, band_spec, ring_io_spec],
        out_specs=out_specs)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={n_pref + 4: 0}, interpret=interpret,
        **_sem(interpret, "parallel", "arbitrary"),
    )(*pref, ring, tail, b_hi, b_lo, out_ring)


def fir_td_mxu_ring_mega_f32(ring: jnp.ndarray, start, tail: jnp.ndarray,
                             band: jnp.ndarray, out_ring: jnp.ndarray,
                             n_steps: int, seeds=None,
                             interpret: bool = False,
                             dither_bits: int | None = None,
                             dither_tpdf: bool = True,
                             out_clip: float | None = None,
                             assign=None, bt: int | None = None):
    """f32-contract serving megakernel: ``n_steps`` ring steps inside one
    Pallas launch, the f32 ring read/written in place and the f32 overlap
    tail carried in VMEM across steps.  Equivalent to chained
    :func:`fir_td_mxu_ring_f32` calls (same per-step math and seed fold).
    Returns ``(out_ring, next_tail)``.  `assign` + a band STACK engage the
    banked per-stream-filter form (see :func:`fir_td_mxu_ring_f32`)."""
    assert ring.dtype == jnp.float32 and tail.dtype == jnp.float32
    band, tail = _ring_geometry(ring, tail, band)
    start = jnp.asarray(start, dtype=jnp.int32).reshape(1)
    a_t, bt = _ring_assign(assign, ring.shape[1], tail.shape[1],
                           ring.shape[2], bt)
    return _fir_td_ring_mega_f32_call(
        start, seeds, ring, tail, band, out_ring, n_steps=int(n_steps),
        interpret=interpret, dither_bits=dither_bits,
        dither_tpdf=dither_tpdf, out_clip=out_clip, assign_t=a_t,
        bt_override=bt)


def fir_td_mxu_ring_mega_pcm16(ring: jnp.ndarray, start, tail: jnp.ndarray,
                               band: jnp.ndarray, out_ring: jnp.ndarray,
                               n_steps: int, seeds=None,
                               interpret: bool = False,
                               dither_bits: int | None = None,
                               dither_tpdf: bool = True,
                               out_clip: float | None = None,
                               assign=None, bt: int | None = None):
    """int16-PCM serving megakernel: ``n_steps`` ring steps inside one
    Pallas launch over a raw int16 input ring, the int16 overlap tail
    carried in VMEM across steps.  Equivalent to chained
    :func:`fir_td_mxu_ring_pcm16` calls (same per-step math and seed
    fold); see that wrapper for the exactness contract.  Returns
    ``(out_ring, next_tail)``."""
    assert ring.dtype == jnp.int16 and tail.dtype == jnp.int16, (
        ring.dtype, tail.dtype)
    band, tail = _ring_geometry(ring, tail, band)
    start = jnp.asarray(start, dtype=jnp.int32).reshape(1)
    a_t, bt = _ring_assign(assign, ring.shape[1], tail.shape[1],
                           ring.shape[2], bt)
    return _fir_td_ring_mega_f32_call(
        start, seeds, ring, tail, band, out_ring, n_steps=int(n_steps),
        interpret=interpret, dither_bits=dither_bits,
        dither_tpdf=dither_tpdf, out_clip=out_clip, assign_t=a_t,
        bt_override=bt)


def fir_td_mxu(x_ext: jnp.ndarray, band: jnp.ndarray,
               interpret: bool = False,
               precision: str | None = None,
               dither_seed=None, dither_bits: int | None = None,
               dither_tpdf: bool = True,
               out_clip: float | None = None,
               emit_i16: bool = False) -> jnp.ndarray:
    """Causal/valid FIR conv of [B, T+N−1] against the band matrix → [B, T]
    (f32, or int16 PCM with ``emit_i16`` — dither+quantize fused into the
    store, see `_finish_tile`).

    `T` must be a multiple of 128 and `B` a multiple of the batch tile
    (≤256); the engine's static shapes guarantee both.  `interpret=True` runs
    the Pallas interpreter (CPU tests).  `precision` overrides
    :data:`PRECISION_MODE` ('B3' | 'HIGHEST').  Passing `dither_seed`
    (int32 [1,1]) + `dither_bits` fuses requantization dither into the
    output store (TPU only — the hardware PRNG has no interpret lowering).
    `out_clip` fuses the reference's ±clip output clamp BEFORE the dither
    (the pipeline's stage order), saving a standalone clip pass.
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
    return _fir_td_call(x_ext, band, interpret=interpret,
                        precision=precision or PRECISION_MODE,
                        seed=dither_seed, dither_bits=dither_bits,
                        dither_tpdf=dither_tpdf, out_clip=out_clip,
                        emit_i16=emit_i16)


def _fir_kernel_ps(x_ref, wide_ref, g_ref, o_ref, *, n_taps: int,
                   t_tiles: int, n_bands: int):
    """Per-stream batch-tile kernel: one wide MXU dot per time tile yields
    every band's outputs ([BT, n_bands·LANE]); the per-stream gain mix is a
    VPU contraction.  fp32 HIGHEST (6-pass) accumulation."""
    g = g_ref[:, :]  # [BT, n_bands]
    for t in range(t_tiles):
        w = x_ref[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        z = jnp.dot(w, wide_ref[:, :], preferred_element_type=jnp.float32,
                    precision=_PRECISION)  # [BT, n_bands*LANE]
        z = z.reshape(z.shape[0], n_bands, LANE)
        # per-stream mix on the VPU (tiny K — an MXU einsum would waste tiles)
        o_ref[:, t * LANE : (t + 1) * LANE] = jnp.sum(g[:, :, None] * z, axis=1)


def _fir_kernel_ps_b3(xhi_ref, xlo_ref, whi_ref, wlo_ref, g_ref, o_ref, *,
                      n_taps: int, t_tiles: int, n_bands: int):
    """Per-stream kernel, bf16×3 precision (3 native MXU passes per tile)."""
    g = g_ref[:, :]
    for t in range(t_tiles):
        w_hi = xhi_ref[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        w_lo = xlo_ref[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        z = (jnp.dot(w_hi, whi_ref[:, :], preferred_element_type=jnp.float32)
             + jnp.dot(w_hi, wlo_ref[:, :], preferred_element_type=jnp.float32)
             + jnp.dot(w_lo, whi_ref[:, :], preferred_element_type=jnp.float32))
        z = z.reshape(z.shape[0], n_bands, LANE)
        o_ref[:, t * LANE : (t + 1) * LANE] = jnp.sum(g[:, :, None] * z, axis=1)


def wide_band_matrix(kernels: jnp.ndarray, tile: int = LANE) -> jnp.ndarray:
    """Stack band matrices for K same-length kernels side by side:
    [K, N] → [N−1+tile, K·tile], so one dot computes every band's outputs.
    Device-side (jnp) — rebuilt cheaply when kernels swap."""
    kernels = jnp.asarray(kernels, dtype=jnp.float32)
    K, N = kernels.shape
    rows = N - 1 + tile
    i = np.arange(rows)[:, None]
    j = np.arange(tile)[None, :]
    k = N - 1 + j - i
    mask = jnp.asarray((k >= 0) & (k < N))
    idx = jnp.asarray(np.clip(k, 0, N - 1), dtype=jnp.int32)
    per_band = jnp.where(mask[None], kernels[:, idx], 0.0)  # [K, rows, tile]
    return jnp.moveaxis(per_band, 0, 1).reshape(rows, K * tile)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def _fir_td_ps_call(x_ext, wide, gains, interpret=False,
                    precision=PRECISION_MODE):
    B, text = x_ext.shape
    n_bands = gains.shape[-1]
    rows = wide.shape[0]
    n_taps = rows - LANE + 1
    T = text - (n_taps - 1)
    t_tiles = T // LANE
    b_tile = _pick_b_tile(B, text + n_bands * LANE, T)
    grid = (B // b_tile,)
    x_spec = pl.BlockSpec((b_tile, text), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wide_spec = pl.BlockSpec((rows, n_bands * LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((b_tile, n_bands), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b_tile, T), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, T), jnp.float32)
    if precision == "B3":
        x_hi, x_lo = split_bf16(x_ext)
        w_hi, w_lo = split_bf16(wide)
        kernel = functools.partial(_fir_kernel_ps_b3, n_taps=n_taps,
                                   t_tiles=t_tiles, n_bands=n_bands)
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[x_spec, x_spec, wide_spec, wide_spec, g_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(x_hi, x_lo, w_hi, w_lo, gains)
    kernel = functools.partial(_fir_kernel_ps, n_taps=n_taps,
                               t_tiles=t_tiles, n_bands=n_bands)
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[x_spec, wide_spec, g_spec],
        out_specs=out_spec, out_shape=out_shape, interpret=interpret,
    )(x_ext, wide, gains)


def fir_td_mxu_per_stream(x_ext: jnp.ndarray, kernels: jnp.ndarray,
                          gains: jnp.ndarray, interpret: bool = False,
                          precision: str | None = None,
                          wide: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-stream FIR mix on the MXU: ``y[b] = Σ_k gains[b,k]·(x[b] ⊛ h_k)``.

    `x_ext`: [B, T+N−1]; `kernels`: [K, N] shared band kernels; `gains`:
    [B, K] per-stream mixing weights.  Returns [B, T].  Costs K× the shared-
    kernel dot (every stream evaluates every band) — per-stream EQ is cheaper
    on the FFT strategy; this exists for strategy parity (ROADMAP r1 #2 /
    VERDICT r1 #8) and for small band counts.
    """
    x_ext = jnp.asarray(x_ext, dtype=jnp.float32)
    gains = jnp.asarray(gains, dtype=jnp.float32)
    if wide is None:  # callers on the hot path pass a precomputed matrix
        wide = wide_band_matrix(kernels)
    B, text = x_ext.shape
    n_taps = wide.shape[0] - LANE + 1
    T = text - (n_taps - 1)
    if T % LANE:
        raise ValueError(f"output length {T} must be a multiple of {LANE}")
    n_bands = gains.shape[-1]
    if B % _pick_b_tile(B, text + n_bands * LANE, T):
        # an unwritable tail of the grid would be silently-wrong audio
        raise ValueError(f"batch {B} must be divisible by the batch tile")
    return _fir_td_ps_call(x_ext, wide, gains, interpret=interpret,
                           precision=precision or PRECISION_MODE)


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
