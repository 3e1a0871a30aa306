"""Fused AGC front half: moving-RMS boxcar + desired gain in ONE kernel.

The AGC stage is the C8 chain's biggest block cost after round 2's MXU boxcar
(measured 0.37 of 0.71 ms/block at [4096×2048], w=512).  The pipeline used to
run it as four XLA/Pallas passes — square(+pad), bf16-split, band-matrix dot,
then sqrt and desired-gain elementwise — each a full [B, T]-array HBM round
trip (~140 MB/block of pure intermediate traffic).  This kernel computes

    d = clip(target / (sqrt(boxcar_w(x²)) + 1e-10), 0, max_gain)

straight from the RAW block in a single pass: the 'same'-centering zero pad
(reference ``np.convolve(x², ones(w)/w, 'same')`` semantics,
`/root/reference/stream_process_AGC.py:60-62`) happens in VMEM (zeros square
to zero, so padding before or after squaring is identical), then square,
integer-RN bf16 split, 2–3 bf16 MXU dots (2 when the boxcar weight 1/w is
exactly bf16-representable — every power-of-two window, including the
reference's default ``min(512, bs//2)`` — because then band_lo ≡ 0), sqrt +
clip on the way to the output store.

With ``transposed=True`` the kernel stores the desired gain directly in the
time-major ``[T, B]`` layout the AGC scan kernel consumes
(:mod:`afp_tpu.ops.pallas.agc_scan`), saving that kernel's input transpose —
another full array round trip.

Numerics are identical to the unfused path (same split, same dots, same f32
sqrt/divide), preserving the reference AGC semantics to < −90 dB.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fir_td import LANE, _load_f32, _split_bf16_in_kernel, split_bf16

__all__ = ["rms_desired_pallas", "band_is_exact_bf16"]


def band_is_exact_bf16(band: np.ndarray) -> bool:
    """True iff every band entry survives an f32→bf16→f32 round trip — then
    the lo half of the split is exactly zero and one MXU pass can be skipped."""
    b = np.asarray(band, dtype=np.float32)
    return bool(np.all(b.astype(jnp.bfloat16).astype(np.float32) == b))


def _mean_matrix(mean_chunk: int):
    """[LANE, LANE/mean_chunk] bf16 chunk-mean selection matrix: entry
    (j, c) = 1/mean_chunk when chunk c covers lane j.  Exactly bf16 for
    power-of-two chunks (the only ones the wrapper accepts), so the
    two-pass bf16 split of `d` computes the mean EXACTLY up to the f32
    accumulation (every product is a bf16×bf16 → f32, exact)."""
    import jax

    ncols = LANE // mean_chunk
    j = jax.lax.broadcasted_iota(jnp.int32, (LANE, ncols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANE, ncols), 1)
    sel = (j // mean_chunk == c)
    return jnp.where(sel, jnp.float32(1.0 / mean_chunk), 0.0
                     ).astype(jnp.bfloat16)


def _store_d(o_ref, d, t: int, transposed: bool, mean_chunk: int, acc: list):
    """Shared desired-gain epilogue: store the [bt, LANE] tile — or, with
    `mean_chunk`, reduce it to its LANE/mean_chunk chunk means and
    accumulate for ONE transposed store at the end (`_flush_means`).  The
    means are what the blockwise 'fast' recurrence consumes
    (`agc_scan.smooth_gain_apply_pallas(d_is_means=True)`): emitting them
    here shrinks the d intermediate HBM traffic mean_chunk× (the chain's
    largest remaining intermediate — BENCHMARKS.md 'AGC chain roofline').

    The mean rides a banded MXU dot, not a reshape-mean: Mosaic rejects
    the lane-splitting shape cast ([bt, 128] → [bt, 4, 32]) on hardware
    (r5 hw_check find — interpret mode accepted it), and the dot is exact
    to the f32 accumulation (see `_mean_matrix`)."""
    if mean_chunk:
        d_hi, d_lo = _split_bf16_in_kernel(d)
        m = _mean_matrix(mean_chunk)
        acc.append(
            jnp.dot(d_hi, m, preferred_element_type=jnp.float32)
            + jnp.dot(d_lo, m, preferred_element_type=jnp.float32))
        return
    if transposed:
        o_ref[t * LANE : (t + 1) * LANE, :] = d.T
    else:
        o_ref[:, t * LANE : (t + 1) * LANE] = d


def _flush_means(o_ref, acc: list):
    """Single [T/mean_chunk, bt] transposed store of the accumulated chunk
    means (one store keeps the sublane granule aligned — per-tile stores
    of 4-row slices would violate Mosaic's 8-sublane rule)."""
    if acc:
        o_ref[:, :] = jnp.concatenate(acc, axis=-1).T


def _kernel(s_ref, x_ref, bhi_ref, o_ref, *, n_taps: int, t_tiles: int,
            lp: int, rp: int, transposed: bool, blo_ref=None,
            mean_chunk: int = 0, vec_refs=None):
    if vec_refs is not None:
        # per-stream target/max-gain banks: [bt, LANE] row-constant tiles
        # (`batch.with_per_stream_agc`) — same elementwise ops as scalars
        target = vec_refs[0][:, :]
        max_gain = vec_refs[1][:, :]
    else:
        target = s_ref[0, 0]
        max_gain = s_ref[0, 1]
    # int16 PCM refs convert on the VPU first (n/32768, exact —
    # fir_td._load_f32), so squaring sees the same f32 bits as f32 ingest
    sq = jnp.square(_load_f32(x_ref[:, :]))
    sq = jnp.pad(sq, ((0, 0), (lp, rp)))  # 'same' centering, in VMEM
    sq_hi, sq_lo = _split_bf16_in_kernel(sq)
    acc: list = []
    for t in range(t_tiles):
        w_hi = sq_hi[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        w_lo = sq_lo[:, t * LANE : t * LANE + (n_taps - 1) + LANE]
        s = (
            jnp.dot(w_hi, bhi_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, bhi_ref[:, :], preferred_element_type=jnp.float32)
        )
        if blo_ref is not None:  # non-exact boxcar weight: third pass
            s = s + jnp.dot(w_hi, blo_ref[:, :],
                            preferred_element_type=jnp.float32)
        rms = jnp.sqrt(jnp.maximum(s, 0.0))
        d = jnp.clip(target / (rms + 1e-10), 0.0, max_gain)
        _store_d(o_ref, d, t, transposed, mean_chunk, acc)
    _flush_means(o_ref, acc)


def _kernel_two_level(s_ref, x_ref, bhi_ref, o_ref, *, w: int, t_tiles: int,
                      lp: int, rp: int, transposed: bool,
                      mean_chunk: int = 0, vec_refs=None):
    """Two-level boxcar for LANE-multiple windows (VERDICT r2 #9).

    The width-`w` moving sum is `m = w/LANE` shifted copies of the
    width-LANE moving sum: ``s_w[u] = Σ_{j<m} s_LANE[u + j·LANE]``.  The
    LANE-sums are one banded MXU dot per 128-output tile with a
    (2·LANE−1)-row band — K = 2·LANE after MXU granularity, vs
    ``ceil((w−1+LANE)/LANE)·LANE`` for the direct window (768 at the
    reference default w=512) — and every s_LANE tile is shared by the m
    output tiles that overlap it, so the per-element executed-MAC count
    drops ~(w+LANE)/(2·LANE)× (2.5× at w=512).  The ones-weight band is
    exactly bf16 for EVERY such w (the 1/w scale moves to the f32
    epilogue), so the 2-pass split always applies.
    """
    if vec_refs is not None:
        target = vec_refs[0][:, :]
        max_gain = vec_refs[1][:, :]
    else:
        target = s_ref[0, 0]
        max_gain = s_ref[0, 1]
    m = w // LANE
    inv_w = 1.0 / w
    sq = jnp.square(_load_f32(x_ref[:, :]))  # int16 PCM converts first
    sq = jnp.pad(sq, ((0, 0), (lp, rp)))  # padded width = T + w − 1
    sq_hi, sq_lo = _split_bf16_in_kernel(sq)
    # level 1: LANE-wide moving sums over the whole padded extent
    s_lane = []
    for t in range(t_tiles + m - 1):
        w_hi = sq_hi[:, t * LANE : t * LANE + 2 * LANE - 1]
        w_lo = sq_lo[:, t * LANE : t * LANE + 2 * LANE - 1]
        s_lane.append(
            jnp.dot(w_hi, bhi_ref[:, :], preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, bhi_ref[:, :], preferred_element_type=jnp.float32)
        )
    # level 2: combine m shifted LANE-sums per output tile (VPU adds)
    acc: list = []
    for t in range(t_tiles):
        s = s_lane[t]
        for j in range(1, m):
            s = s + s_lane[t + j]
        rms = jnp.sqrt(jnp.maximum(s * inv_w, 0.0))
        d = jnp.clip(target / (rms + 1e-10), 0.0, max_gain)
        _store_d(o_ref, d, t, transposed, mean_chunk, acc)
    _flush_means(o_ref, acc)


def _pick_tile(B: int, T: int, W: int, two_level: bool = False) -> int:
    """Batch tile under the in-kernel temporaries (padded sq f32 + hi/lo bf16
    = 8 B/elem over the extended width) plus double-buffered in/out; the
    two-level kernel additionally holds the level-1 LANE-sum tiles
    (``t_tiles+m−1`` tiles of [bt, LANE] f32 ≈ 4 B/elem more).

    Raises ValueError when no candidate tile divides `B` — the grid is
    ``(B // bt,)``, so a non-divisor tile would silently leave the trailing
    ``B mod bt`` rows uncomputed (r2 advisor finding; mirrors the explicit
    raise in `_pick_b_tile_b3t` / `smooth_gain_apply_pallas`)."""
    text = T + W - 1
    per_elem = 12 if two_level else 8
    for bt in (128, 64, 32, 16, 8):
        if B % bt:
            continue
        foot = bt * text * per_elem + 2 * bt * (T + T) * 4
        if foot <= 12 * 2**20:
            return bt
    if B <= 8:  # tiny batches run as a single B-row tile
        return B
    raise ValueError(
        f"batch {B} is not divisible by any supported batch tile "
        "(must be ≤ 8 or a multiple of 8)")


@functools.partial(jax.jit, static_argnames=(
    "lp", "rp", "interpret", "exact", "transposed", "two_level_w",
    "mean_chunk"))
def _call(x, b_hi, b_lo, scal, lp: int, rp: int, interpret: bool = False,
          exact: bool = True, transposed: bool = False,
          two_level_w: int = 0, mean_chunk: int = 0, vecs=None):
    return _rms_call(x, b_hi, b_lo, scal, lp, rp, interpret=interpret,
                     exact=exact, transposed=transposed,
                     two_level_w=two_level_w, mean_chunk=mean_chunk,
                     vecs=vecs)


@functools.partial(jax.jit, static_argnames=(
    "lp", "rp", "interpret", "exact", "transposed", "two_level_w",
    "mean_chunk"))
def _call_ring(idx, x_ring, b_hi, b_lo, scal, lp: int, rp: int,
               interpret: bool = False, exact: bool = True,
               transposed: bool = False, two_level_w: int = 0,
               mean_chunk: int = 0, vecs=None):
    """Ring-input variant of :func:`_call`: `x_ring` is [S, B, T] and the
    kernel streams slot `idx` (scalar-prefetch) HBM→VMEM directly — no
    staged `dynamic_slice` copy of the block.  Kernel bodies are shared
    (the squeezed (None, bt, T) block is exactly the (bt, T) block)."""
    return _rms_call(x_ring, b_hi, b_lo, scal, lp, rp, interpret=interpret,
                     exact=exact, transposed=transposed,
                     two_level_w=two_level_w, idx=idx,
                     mean_chunk=mean_chunk, vecs=vecs)


def _rms_call(x, b_hi, b_lo, scal, lp: int, rp: int, interpret: bool,
              exact: bool, transposed: bool, two_level_w: int, idx=None,
              mean_chunk: int = 0, vecs=None):
    """Shared builder for the plain and ring-input forms: the only
    differences are the x BlockSpec (slot-selecting, scalar-prefetch) and
    the grid spec — index maps lift to the extra scalar-ref arg, kernels
    and every other spec are identical."""
    ring = idx is not None
    if ring:
        S, B, T = x.shape
    else:
        B, T = x.shape
    n_taps = two_level_w if two_level_w else b_hi.shape[0] - LANE + 1
    t_tiles = T // LANE
    bt = _pick_tile(B, T, n_taps, two_level=bool(two_level_w))
    grid = (B // bt,)
    lift = (lambda f: (lambda i, s: f(i))) if ring else (lambda f: f)
    if ring:
        x_spec = pl.BlockSpec((None, bt, T), lambda i, s: (s[0], i, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((bt, T), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((b_hi.shape[0], LANE), lift(lambda i: (0, 0)),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 2), lift(lambda i: (0, 0)),
                          memory_space=pltpu.SMEM)
    if mean_chunk:
        # chunk-mean emission (the blockwise 'fast' contract): the output
        # is the TIME-MAJOR [T/mean_chunk, B] chunk-mean matrix — the d
        # intermediate shrinks mean_chunk× in HBM
        assert transposed and LANE % mean_chunk == 0, (transposed, mean_chunk)
        Tm = T // mean_chunk
        out_spec = pl.BlockSpec((Tm, bt), lift(lambda i: (0, i)),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Tm, B), jnp.float32)
    elif transposed:
        out_spec = pl.BlockSpec((T, bt), lift(lambda i: (0, i)),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T, B), jnp.float32)
    else:
        out_spec = pl.BlockSpec((bt, T), lift(lambda i: (i, 0)),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, T), jnp.float32)

    def launch(kern, in_specs, *args):
        if ring:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=in_specs, out_specs=out_spec)
            return pl.pallas_call(
                lambda sidx, *rest: kern(*rest),
                grid_spec=grid_spec, out_shape=out_shape,
                interpret=interpret,
            )(idx, *args)
        return pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, interpret=interpret,
        )(*args)

    # per-stream target/max-gain banks: [bt, LANE] row-constant tiles
    # appended after the band operands (lane-broadcast at the wrapper —
    # a [bt, 1] block would violate Mosaic's 128-lane granule)
    vspec = pl.BlockSpec((bt, LANE), lift(lambda i: (i, 0)),
                         memory_space=pltpu.VMEM)
    if two_level_w:
        kw2 = dict(w=two_level_w, t_tiles=t_tiles, lp=lp, rp=rp,
                   transposed=transposed, mean_chunk=mean_chunk)
        if vecs is not None:
            kern2 = lambda s, xr, bh, tv, mv, o: _kernel_two_level(
                s, xr, bh, o, vec_refs=(tv, mv), **kw2)
            return launch(kern2, [s_spec, x_spec, b_spec, vspec, vspec],
                          scal, x, b_hi, *vecs)
        kern2 = functools.partial(_kernel_two_level, **kw2)
        return launch(kern2, [s_spec, x_spec, b_spec], scal, x, b_hi)
    kw = dict(n_taps=n_taps, t_tiles=t_tiles, lp=lp, rp=rp,
              transposed=transposed, mean_chunk=mean_chunk)
    if exact:
        if vecs is not None:
            kern = lambda s, xr, bh, tv, mv, o: _kernel(
                s, xr, bh, o, vec_refs=(tv, mv), **kw)
            return launch(kern, [s_spec, x_spec, b_spec, vspec, vspec],
                          scal, x, b_hi, *vecs)
        kern = functools.partial(_kernel, **kw)
        return launch(kern, [s_spec, x_spec, b_spec], scal, x, b_hi)
    if vecs is not None:
        kern3v = lambda s, xr, bh, bl, tv, mv, o: _kernel(
            s, xr, bh, o, blo_ref=bl, vec_refs=(tv, mv), **kw)
        return launch(kern3v, [s_spec, x_spec, b_spec, b_spec, vspec, vspec],
                      scal, x, b_hi, b_lo, *vecs)
    kern3 = lambda s, xr, bh, bl, o: _kernel(s, xr, bh, o, blo_ref=bl, **kw)
    return launch(kern3, [s_spec, x_spec, b_spec, b_spec],
                  scal, x, b_hi, b_lo)


def rms_desired_pallas(x: jnp.ndarray, band: jnp.ndarray, lp: int, rp: int,
                       target, max_gain, exact_band: bool,
                       interpret: bool = False,
                       transposed: bool = False,
                       ring_idx=None, mean_chunk: int = 0) -> jnp.ndarray:
    """Desired AGC gain from the raw block in one fused pass.

    `x`: [B, T] f32 (UNPADDED — the 'same'-centering pad happens in VMEM);
    `band`: [W−1+128, 128] boxcar band matrix
    (:func:`afp_tpu.ops.pallas.fir_td.band_matrix` of ``ones(w)/w``);
    `lp`/`rp`: the centering pad widths (static); `target`/`max_gain`:
    runtime scalars (never recompile); `exact_band`: host-precomputed
    :func:`band_is_exact_bf16` (static — selects the 2-pass kernel);
    `transposed`: store ``[T, B]`` time-major for the scan kernel.
    Returns the desired gain, equal to
    ``desired_gain(sqrt(boxcar(x²)), target, max_gain)``.

    With `ring_idx` set, `x` is an [S, B, T] f32 serving ring and the
    kernel streams slot `ring_idx` directly (scalar-prefetch BlockSpec —
    no staged `dynamic_slice` copy; the zero-copy ring discipline of
    `fir_td_mxu_ring`).

    `x` may also be RAW int16 PCM (``ingest='pcm16'``, block or ring):
    the kernel converts on the VPU (``n / 32768`` — exact, so `d` is
    bit-identical to feeding the floats) and the x-read HBM bytes halve.

    With ``mean_chunk`` (requires `transposed`; must divide 128) the
    kernel emits the [T/mean_chunk, B] CHUNK MEANS of `d` instead of the
    per-sample matrix — the exact input the blockwise 'fast' recurrence
    consumes (`smooth_gain_apply_pallas(d_is_means=True)`), shrinking
    the d intermediate's HBM traffic mean_chunk× (the fast chain's
    largest remaining intermediate; see BENCHMARKS.md 'AGC chain
    roofline').  The means reduce the same f32 `d` values in VMEM
    (reassociation-only delta vs a host-side reshape-mean, ≲2⁻²⁰).
    """
    if mean_chunk and (not transposed or LANE % mean_chunk
                       or mean_chunk & (mean_chunk - 1)):
        raise ValueError(
            f"mean_chunk={mean_chunk} requires transposed=True and a "
            f"power of two dividing {LANE} (the 1/chunk selection weight "
            "must be exactly bf16)")
    x = jnp.asarray(x)
    if x.dtype != jnp.int16:
        x = x.astype(jnp.float32)
    if x.shape[-1] % LANE:
        raise ValueError(f"block length {x.shape[-1]} must be a multiple of {LANE}")
    W = np.asarray(band).shape[0] - LANE + 1
    # per-stream policy banks: [B] target/max-gain vectors promote to
    # lane-broadcast [B, LANE] VMEM tiles (`batch.with_per_stream_agc`);
    # either vector promotes both (one kernel variant)
    tgt = jnp.asarray(target, jnp.float32)
    mg = jnp.asarray(max_gain, jnp.float32)
    vecs = None
    if tgt.ndim == 1 or mg.ndim == 1:
        B_ = x.shape[-2]
        vecs = tuple(
            jnp.broadcast_to(
                jnp.broadcast_to(v.reshape(-1 if v.ndim else ()),
                                 (B_,))[:, None], (B_, LANE))
            for v in (tgt, mg))
        tgt = mg = jnp.float32(0.0)  # SMEM slots inert in vector mode
    scal = jnp.stack([tgt, mg]).reshape(1, 2)
    if ring_idx is not None:
        assert x.ndim == 3, "ring mode needs an [S, B, T] ring"
        idx = jnp.asarray(ring_idx, dtype=jnp.int32).reshape(1)
        if W >= LANE and W % LANE == 0:
            from .fir_td import band_matrix

            b128 = jnp.asarray(band_matrix(np.ones(LANE, dtype=np.float32)))
            b_hi, b_lo = split_bf16(b128)
            return _call_ring(idx, x, b_hi, b_lo, scal, lp, rp,
                              interpret=interpret, exact=True,
                              transposed=transposed, two_level_w=W,
                              mean_chunk=mean_chunk, vecs=vecs)
        b_hi, b_lo = split_bf16(jnp.asarray(band, dtype=jnp.float32))
        return _call_ring(idx, x, b_hi, b_lo, scal, lp, rp,
                          interpret=interpret, exact=bool(exact_band),
                          transposed=transposed, mean_chunk=mean_chunk,
                          vecs=vecs)
    if W >= LANE and W % LANE == 0:
        # two-level boxcar (see _kernel_two_level): the level-1 band is a
        # ones(LANE) band — exactly bf16 for every such W, 2 passes always —
        # and the 1/W weight moves to the f32 epilogue.  ~2.5× fewer MXU
        # MACs at the reference default W=512.
        from .fir_td import band_matrix

        b128 = jnp.asarray(band_matrix(np.ones(LANE, dtype=np.float32)))
        b_hi, b_lo = split_bf16(b128)
        return _call(x, b_hi, b_lo, scal, lp, rp, interpret=interpret,
                     exact=True, transposed=transposed, two_level_w=W,
                     mean_chunk=mean_chunk, vecs=vecs)
    b_hi, b_lo = split_bf16(jnp.asarray(band, dtype=jnp.float32))
    return _call(x, b_hi, b_lo, scal, lp, rp, interpret=interpret,
                 exact=bool(exact_band), transposed=transposed,
                 mean_chunk=mean_chunk, vecs=vecs)
