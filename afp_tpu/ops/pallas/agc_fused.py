"""Single-kernel AGC: moving-RMS + desired gain + attack/release scan +
clip + apply (+ bf16 pair split) in ONE Pallas pass over the raw block.

**Status: measured NEGATIVE for throughput on v5e; opt-in accuracy
option (`AFP_AGC_ONE_KERNEL=1`).**  Fusing the two-kernel C8 front
(`agc_rms.rms_desired_pallas` → `agc_scan.smooth_gain_apply_pallas`)
was built and measured two ways at the C8 serving point
([4096, 2048], w=512, 2048-step ring dispatch):

* VMEM history-slab build (x/C scratch rings, same-slot rotation):
  287.4 µs/block vs 277.9 for the two-kernel chain (0.97×);
* HBM three-view build (this file: re-read x at three chunk lags, no
  slabs): 323.8 µs/block (0.86×).

In a side-by-side microbench the fused kernel alone DOES beat the two
kernels it replaces (213 vs 242 µs) — the end-to-end loss is overlap:
the chain already streams HBM at ~97% *under* compute, so removing the
d intermediate buys no wall time, while VMEM forces the fused walk down
to a 16-sublane tile (2 parallel recurrence chains vs the scan
kernel's measured-optimal 4) and the three-view form adds reads the
overlap can't fully hide.  The two-kernel chain is pareto-optimal under
DMA/compute overlap; see BENCHMARKS.md "Single-kernel AGC: measured
negative".  The kernel stays because its window sums are categorically
tighter (window-local f32, ≈2⁻²⁴, vs the MXU boxcar's bf16-split
≈2⁻¹⁷) — an accuracy knob where −102 dB vs the default path matters.

Semantics are the reference AGC chain (`/root/reference/
stream_process_AGC.py:43-89`), identical to the composite

    d  = clip(target / (sqrt(boxcar_w(x²)) + 1e-10), 0, max_gain)   # 'same'
    g  = smooth_gain_scan(d, a_att, a_rel, init)                     # scan
    gc = clip(g, 0.1, max_gain)
    y  = clip(x · gc, ±out_clip);  carry = gc[..., −1]

**Window decomposition (the precision core).**  With time chunks of
TC = 128 and a window w = 2h·TC ('same' centering: lp = w/2,
rp = w/2 − 1), the moving sum at output step t of chunk i spans chunks
i−h … i+h:

    W[t] = (S_{i−h} − C_{i−h}[t−1]) + Σ_{k=i−h+1}^{i+h−1} S_k + C_{i+h}[t−1]

where C_k is the *fresh per-chunk* cumulative sum of x² and S_k its
total.  Every term is window-local, so rounding errors are confined to
the window's own energy (≈2⁻²⁴ relative) — strictly tighter than the
two-pass bf16 MXU boxcar it replaces (≈2⁻¹⁷), and categorically unlike
a block-long running cumsum-difference, whose drift lets loud history
swamp quiet windows (why `ops.agc.moving_rms` rejects plain cumsum).

**Schedule.**  The walk over input chunk j finalizes OUTPUT chunk
i = j − h (the prefix term needs C_{i+h} = C_j), so the kernel runs with
an h-chunk lag and h flush steps.  Rather than carrying chunk history in
VMEM scratch rings (measured: the slab copies cost more than they save),
the kernel reads THREE views of the same HBM block per grid step —
x_j (new cumsum + S), x_{j−2h} (the suffix chunk's cumsum, recomputed
bit-identically), and x_{j−h} (the apply) — extra DMA that hides under
the walk compute.  Only the 2h chunk TOTALS S_k persist, in a tiny
[2h, sub, 128] scratch ring with the same-slot property (the slot read
for the base sum at step j is the one S_j overwrites).  The grid is
time-minor, so each batch tile walks its chunks in order with the gain
carried in scratch, exactly like `agc_scan._agc_kernel`.

Per grid step the serial work is two 1-add cumsum chains and the 4-op
recurrence; the sqrt/divide/clip of the desired gain are vectorised over
the whole chunk, off the serial chain.  Zero-masked edge chunks give the
'same' zero-padded edge semantics; the per-block RMS restart (reference
semantics) needs no state at all — chunk sums never cross blocks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .agc_scan import LANES
from .fir_td import _split_bf16_in_kernel

__all__ = ["agc_rms_apply_pallas", "fused_rms_supported", "pick_sub_fused"]

#: time-chunk rows per grid step.  128 is the Mosaic lane rule's floor
#: for a blocked minor dimension; with THREE double-buffered input views
#: the VMEM budget then caps the batch tile at 16 sublanes (2 parallel
#: vreg chains for the recurrence vs agc_scan's 4).
TC = 128

#: VMEM budget for IO tiles + the walk's materialised temporaries (bytes)
_VMEM_BUDGET = 13 * 2 ** 20


def _footprint(sub: int) -> int:
    """VMEM bytes at batch-tile `sub`·128 streams: 3 double-buffered f32
    input views + the pair output + gain chunk + the two shifted-cumsum
    temporaries and the fused elementwise chain's working set."""
    row = sub * LANES * 4  # one [sub, 128] f32 step-row
    io_in = 3 * 2 * TC * row
    io_out = 2 * 2 * TC * sub * LANES * 2
    c_scr = TC * row
    temps = 4 * TC * row
    return io_in + io_out + c_scr + temps


def pick_sub_fused(B: int, w: int) -> int | None:
    """Largest sublane tile (streams = sub·128) that divides the batch
    and fits VMEM; None when the shape isn't tileable."""
    for sub in (32, 16, 8):
        if B % (sub * LANES):
            continue
        if _footprint(sub) <= _VMEM_BUDGET:
            return sub
    return None


def fused_rms_supported(B: int, T: int, w: int, lp: int) -> bool:
    """Gate for the single-kernel AGC: window a multiple of 2·TC with
    exact 'same' centering (lp == w/2 — true for every even w under the
    numpy convention used by the engine), block a multiple of TC, and a
    batch the tile ladder can cover.  Other shapes keep the two-kernel
    path."""
    return (
        w >= 2 * TC
        and w % (2 * TC) == 0
        and lp == w // 2
        and T % TC == 0
        and pick_sub_fused(B, w) is not None
    )


def _fused_kernel(s_ref, x_ref, xo_ref, xa_ref, g0_ref, yh_ref, gl_ref,
                  yl_ref, g_scr, sring, c_scr, *,
                  sub: int, h: int, nch: int):
    a_att = s_ref[0, 0]
    a_rel = s_ref[0, 1]
    max_gain = s_ref[0, 2]
    out_clip = s_ref[0, 3]
    target = s_ref[0, 4]
    inv_w = s_ref[0, 5]
    restart = s_ref[0, 6]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        g_scr[...] = g0_ref[0]
        sring[...] = jnp.zeros(sring.shape, jnp.float32)

    # time-major views of the current chunk (x_j) and the suffix chunk
    # (x_{j−2h}); both masked to zero outside the block ('same' edges)
    m_new = jnp.where(j < nch, 1.0, 0.0).astype(jnp.float32)
    m_old = jnp.where(j >= 2 * h, 1.0, 0.0).astype(jnp.float32)
    # int16 PCM refs convert on the VPU first (n/32768, exact —
    # fir_td._load_f32): same f32 bits as f32 ingest, half the x bytes
    from .fir_td import _load_f32

    xs_new = _load_f32(x_ref[...]).T.reshape(TC, sub, LANES)
    xs_old = _load_f32(xo_ref[...]).T.reshape(TC, sub, LANES)

    # Phase A — two fresh per-chunk cumsums (1-add serial chains each):
    # the stored value is the SHIFTED cumsum C[t−1] the window needs.
    cn = jnp.zeros((sub, LANES), jnp.float32)
    co = jnp.zeros((sub, LANES), jnp.float32)
    cn_sh = []
    co_sh = []
    for t in range(TC):
        cn_sh.append(cn)
        co_sh.append(co)
        xn = xs_new[t]
        xo = xs_old[t]
        cn = cn + xn * xn * m_new
        co = co + xo * xo * m_old
    cn_sh = jnp.stack(cn_sh)  # C_j[t−1]
    co_sh = jnp.stack(co_sh)  # C_{j−2h}[t−1], recomputed bit-identically

    # Phase B — window sums and desired gain, vectorised over the chunk
    # (sqrt/divide never touch the serial recurrence chain):
    #   base = Σ_{k=j−2h}^{j−1} S_k  (the whole S ring, read pre-update)
    base = jnp.sum(sring[...], axis=0)
    W = base[None] - co_sh + cn_sh
    rms = jnp.sqrt(jnp.maximum(W * inv_w, 0.0))
    d_chunk = jnp.clip(target / (rms + 1e-10), 0.0, max_gain)
    sring[pl.ds(jax.lax.rem(j, 2 * h), 1)] = cn[None]  # S_j

    # Phase C — the attack/release recurrence (the true serial core,
    # ~4 VPU ops/step like agc_scan._agc_kernel).  First-output-chunk
    # restart: g₋₁ := d[0] ⇒ g[0] = d[0] under either branch.
    seed0 = restart * jnp.where(j == h, 1.0, 0.0)
    g = g_scr[...]
    for t in range(TC):
        d_t = d_chunk[t]
        alpha = jnp.where(d_t > g, a_att, a_rel)
        gn = alpha * d_t + (1.0 - alpha) * g
        if t == 0:
            gn = jnp.where(seed0 > 0, d_t, gn)
        g = gn
        c_scr[t] = g

    @pl.when(j >= h)  # pre-lag walks must not pollute the carry
    def _():
        g_scr[...] = g

    # apply to x_{j−h} (batch-major, read straight from HBM — no lag
    # buffering); pre-lag visits write masked zeros into out block 0 and
    # are overwritten at j == h (same-block revisits flush on last visit)
    chunk = c_scr[...].reshape(TC, sub * LANES)
    gcl = jnp.clip(chunk.T, 0.1, max_gain)
    mask_w = jnp.where(j >= h, 1.0, 0.0).astype(jnp.float32)
    y = jnp.clip(_load_f32(xa_ref[...]) * gcl, -out_clip, out_clip) * mask_w
    if yl_ref is None:
        yh_ref[...] = y
    else:
        y_hi, y_lo = _split_bf16_in_kernel(y)
        yh_ref[...] = y_hi
        yl_ref[...] = y_lo

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        gl_ref[...] = jnp.clip(g_scr[...], 0.1, max_gain)


@functools.partial(jax.jit, static_argnames=(
    "sub", "h", "interpret", "emit_split"))
def _fused_call(x, g0, scal, sub: int, h: int, interpret: bool = False,
                emit_split: bool = False, idx=None):
    ring = idx is not None
    if ring:
        _, B, T = x.shape
    else:
        B, T = x.shape
    Bs = B // LANES
    nch = T // TC
    grid = (Bs // sub, nch + h)

    def _xspec(lag):
        # clamped chunk index; out-of-range chunks are masked in-kernel
        if ring:
            return pl.BlockSpec(
                (None, sub * LANES, TC),
                lambda i, j, s, lag=lag: (
                    s[0], i, jnp.clip(j - lag, 0, nch - 1)),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (sub * LANES, TC),
            lambda i, j, lag=lag: (i, jnp.clip(j - lag, 0, nch - 1)),
            memory_space=pltpu.VMEM)

    ix = (lambda f: (lambda i, j, s: f(i, j))) if ring else (lambda f: f)
    in_specs = [
        pl.BlockSpec((1, 8), ix(lambda i, j: (0, 0)),
                     memory_space=pltpu.SMEM),
        _xspec(0),        # x_j: new cumsum + S
        _xspec(2 * h),    # x_{j−2h}: suffix cumsum (recomputed)
        _xspec(h),        # x_{j−h}: the apply
        pl.BlockSpec((1, sub, LANES), ix(lambda i, j: (0, i, 0)),
                     memory_space=pltpu.VMEM),
    ]
    y_spec = pl.BlockSpec((sub * LANES, TC),
                          ix(lambda i, j: (i, jnp.maximum(j - h, 0))),
                          memory_space=pltpu.VMEM)
    gl_spec = pl.BlockSpec((sub, LANES), ix(lambda i, j: (i, 0)),
                           memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((sub, LANES), jnp.float32),          # gain carry
        pltpu.VMEM((2 * h, sub, LANES), jnp.float32),   # S ring
        pltpu.VMEM((TC, sub, LANES), jnp.float32),      # gain chunk
    ]
    gl_shape = jax.ShapeDtypeStruct((Bs, LANES), jnp.float32)
    kw = dict(sub=sub, h=h, nch=nch)
    if emit_split:
        kern = functools.partial(_fused_kernel, **kw)
        out_specs = [y_spec, gl_spec, y_spec]
        out_shape = [jax.ShapeDtypeStruct((B, T), jnp.bfloat16), gl_shape,
                     jax.ShapeDtypeStruct((B, T), jnp.bfloat16)]
    else:
        kern = lambda s, x_, xo, xa, g0_, yh, gl, *scr: _fused_kernel(
            s, x_, xo, xa, g0_, yh, gl, None, *scr, **kw)
        out_specs = [y_spec, gl_spec]
        out_shape = [jax.ShapeDtypeStruct((B, T), jnp.float32), gl_shape]
    if ring:
        inner = kern
        kern = lambda sidx, *refs: inner(*refs)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch)
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(idx, scal, x, x, x, g0)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret,
    )(scal, x, x, x, g0)


def agc_rms_apply_pallas(x: jnp.ndarray, w: int, a_att, a_rel, target,
                         max_gain, init=None, out_clip: float = 0.99,
                         emit_split: bool = False, interpret: bool = False,
                         ring_idx=None):
    """Whole AGC stage in one kernel: x → (y, carry).

    `x`: [B, T] f32 raw block (or an [S, B, T] serving ring with
    `ring_idx` — the kernel streams slot `ring_idx` via a scalar-prefetch
    BlockSpec, the zero-copy ring discipline).  `w`: moving-RMS window
    (must satisfy :func:`fused_rms_supported` for the block shape —
    callers gate).  `init`: [B] previous smoothed gain, or None for the
    reference's per-block restart.  Returns ``(y, g_clipped[:, −1])``;
    with `emit_split` y is the bf16 ``(hi, lo)`` pair
    (:func:`~afp_tpu.ops.pallas.fir_td.split_bf16` semantics, done in
    VMEM on the way to the store) for the pair-input conv kernel.

    Equal to the composite
    ``rms = moving_rms(x, w); d = desired_gain(rms, target, max_gain);
    g = clip(smooth_gain_scan(d, a_att, a_rel, init), 0.1, max_gain);
    (clip(x·g, ±out_clip), g[:, −1])`` — with the moving sum computed by
    the chunk-prefix decomposition (window-local f32 error, ≈2⁻²⁴ —
    tighter than both the fft path's and the MXU band-dot path's).
    """
    if ring_idx is not None:
        assert x.ndim == 3, "ring mode needs an [S, B, T] ring"
        _, B, T = x.shape
        idx = jnp.asarray(ring_idx, dtype=jnp.int32).reshape(1)
    else:
        x = jnp.asarray(x)
        if x.dtype != jnp.int16:  # raw int16 PCM converts in VMEM (exact)
            x = x.astype(jnp.float32)
        B, T = x.shape
        idx = None
    w = int(w)
    lp = w // 2
    if not fused_rms_supported(B, T, w, lp):
        raise ValueError(
            f"shape [B={B}, T={T}], w={w} not supported by the fused AGC "
            "kernel — gate with fused_rms_supported()")
    sub = pick_sub_fused(B, w)
    h = w // (2 * TC)
    if init is None:
        restart = 1.0
        g0 = jnp.zeros((B,), jnp.float32)
    else:
        restart = 0.0
        g0 = jnp.broadcast_to(
            jnp.asarray(init, dtype=jnp.float32).reshape(-1), (B,))
    scal = jnp.stack([
        jnp.asarray(a_att, jnp.float32), jnp.asarray(a_rel, jnp.float32),
        jnp.asarray(max_gain, jnp.float32),
        jnp.asarray(out_clip, jnp.float32),
        jnp.asarray(target, jnp.float32),
        jnp.float32(1.0 / w), jnp.float32(restart), jnp.float32(0.0),
    ]).reshape(1, 8)
    g03 = g0.reshape(1, B // LANES, LANES)
    if emit_split:
        y_hi, gl, y_lo = _fused_call(x, g03, scal, sub=sub, h=h,
                                     interpret=interpret, emit_split=True,
                                     idx=idx)
        return (y_hi, y_lo), gl.reshape(B)
    y, gl = _fused_call(x, g03, scal, sub=sub, h=h, interpret=interpret,
                        emit_split=False, idx=idx)
    return y, gl.reshape(B)
