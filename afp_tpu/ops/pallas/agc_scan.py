"""Pallas TPU kernel for the AGC attack/release recurrence.

The reference's per-sample one-pole with data-dependent α
(`/root/reference/stream_process_AGC.py:68-79`) is inherently sequential in
time.  Expressed as `lax.scan`, each of the T steps pays XLA loop overhead
(dynamic-slice + dynamic-update-slice + loop bookkeeping ≈ µs), which made
the AGC stage ~10× the cost of the whole rest of the pipeline.  This kernel
runs the same recurrence as a hardware `fori_loop` over VMEM-resident rows —
per step it is ~4 VPU ops on a fully packed (8×128) vector register, no XLA
loop machinery:

* layout: the [B, T] desired-gain matrix is transposed to [T, B/128, 128] so
  each time step touches one packed row,
* grid = (batch tiles × time chunks), time minor: each batch tile walks its
  time chunks in order, carrying the running gain in a VMEM scratch that
  persists across grid steps (the standard Pallas sequential-grid carry),
* α values arrive as SMEM scalars (runtime data — attack/release changes
  never recompile).

A subtlety removes the init=None special case: seeding the carry with
``g₋₁ = desired[0]`` makes step 0 produce exactly ``desired[0]`` under either
branch — the reference's per-block restart — so the kernel always scans the
full T.

Semantics are IDENTICAL to :func:`afp_tpu.ops.agc.smooth_gain_scan`
(equivalence-tested in interpret mode; the engine selects this kernel on the
TPU backend and the lax.scan path elsewhere).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["smooth_gain_scan_pallas", "smooth_gain_apply_pallas"]

#: max batch tile: SUBLANES × 128 lanes per time-step row.  32 sublanes = 4
#: independent (8×128) vregs per step — four parallel dependency chains hide
#: the VPU result latency of the serial recurrence.  Small batches use
#: smaller tiles (multiples of 8) so they don't pad up to 4096 streams.
SUBLANES = 32
LANES = 128


def _pick_sublanes(B: int) -> int:
    """Smallest multiple-of-8 sublane count whose tile covers the batch,
    capped at SUBLANES — batch 256 needs 2 lane-groups → 8 sublanes, a
    1024-lane tile, not the full 4096."""
    need = -(-B // LANES)  # lane-groups required
    sub = -(-need // 8) * 8
    return max(8, min(SUBLANES, sub))
#: time-chunk rows per grid step; the time loop is STATICALLY UNROLLED
#: (dynamic per-step VMEM indexing measured 12× slower than XLA's scan)
T_CHUNK = 128


def _agc_kernel(a_ref, d_ref, g0_ref, o_ref, g_scr):
    a_att = a_ref[0, 0]
    a_rel = a_ref[0, 1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        g_scr[...] = g0_ref[0]

    g = g_scr[...]
    for t in range(T_CHUNK):  # static unroll: direct offsets, no loop machinery
        d_t = d_ref[t]  # [SUBLANES, LANES]
        alpha = jnp.where(d_t > g, a_att, a_rel)
        g = alpha * d_t + (1.0 - alpha) * g
        o_ref[t] = g
    g_scr[...] = g


def _agc_kernel_bm(a_ref, d_ref, g0_ref, o_ref, g_scr, c_scr, *, sub: int):
    """Batch-major-output variant: the recurrence accumulates its chunk in a
    VMEM scratch, then stores ONE transposed tile — so the gain lands in the
    [B, T] layout the clip/apply/conv stage consumes, removing the output
    transpose round trip that a time-major store forces onto XLA."""
    a_att = a_ref[0, 0]
    a_rel = a_ref[0, 1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        g_scr[...] = g0_ref[0]

    g = g_scr[...]
    for t in range(T_CHUNK):
        d_t = d_ref[t]
        alpha = jnp.where(d_t > g, a_att, a_rel)
        g = alpha * d_t + (1.0 - alpha) * g
        c_scr[t] = g
    g_scr[...] = g
    chunk = c_scr[...].reshape(T_CHUNK, sub * LANES)
    o_ref[...] = chunk.T


@functools.partial(jax.jit, static_argnames=("interpret", "sub", "batch_major"))
def _agc_scan_call(d3: jnp.ndarray, g03: jnp.ndarray, alphas: jnp.ndarray,
                   interpret: bool = False, sub: int = SUBLANES,
                   batch_major: bool = False) -> jnp.ndarray:
    """d3: [T, Bs, 128]; g03: [1, Bs, 128]; alphas: [1, 2] → [T, Bs, 128]
    (time-major) or [Bs·128, T] (`batch_major=True`).  T must be a multiple
    of T_CHUNK and Bs of `sub` (wrapper pads)."""
    T, Bs, _ = d3.shape
    grid = (Bs // sub, T // T_CHUNK)  # time minor: sequential chunks
    in_specs = [
        pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((T_CHUNK, sub, LANES), lambda i, j: (j, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sub, LANES), lambda i, j: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if batch_major:
        return pl.pallas_call(
            functools.partial(_agc_kernel_bm, sub=sub),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((sub * LANES, T_CHUNK),
                                   lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bs * LANES, T), jnp.float32),
            scratch_shapes=[pltpu.VMEM((sub, LANES), jnp.float32),
                            pltpu.VMEM((T_CHUNK, sub, LANES), jnp.float32)],
            interpret=interpret,
        )(alphas, d3, g03)
    return pl.pallas_call(
        _agc_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T_CHUNK, sub, LANES),
                               lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Bs, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((sub, LANES), jnp.float32)],
        interpret=interpret,
    )(alphas, d3, g03)


def smooth_gain_scan_pallas(desired: jnp.ndarray, a_att, a_rel,
                            init=None, interpret: bool = False,
                            time_major: bool = False,
                            out_batch_major: bool = False) -> jnp.ndarray:
    """Drop-in replacement for :func:`afp_tpu.ops.agc.smooth_gain_scan`.

    `desired`: [..., T] — or [T, B] when `time_major=True` (the layout the
    fused RMS kernel emits with ``transposed=True``, which skips this
    wrapper's input transpose).  `init`: [...] previous smoothed gain or None
    (restart at ``desired[..., 0]``, the reference's per-block behavior).
    Output is always batch-major ([..., T] / [B, T]); with
    `out_batch_major=True` the KERNEL stores it that way (in-kernel chunk
    transpose) instead of leaving the layout flip to XLA — one less array
    round trip on the hot path.  Batch and time are padded internally to the
    kernel's tile sizes (the padded tail is causal — discarding it never
    perturbs valid outputs).
    """
    d = jnp.asarray(desired, dtype=jnp.float32)
    if time_major:
        T, B = d.shape
        lead = (B,)
    else:
        lead = d.shape[:-1]
        T = d.shape[-1]
        B = 1
        for s in lead:
            B *= s
        d = d.reshape(B, T)

    if init is None:
        # g₋₁ = desired[0] ⇒ step 0 yields desired[0] under either branch
        g0 = d[0] if time_major else d[:, 0]
    else:
        g0 = jnp.broadcast_to(
            jnp.asarray(init, dtype=jnp.float32).reshape(-1), (B,)
        )

    sub = _pick_sublanes(B)
    tile = sub * LANES
    B_pad = -(-B // tile) * tile
    T_pad = -(-T // T_CHUNK) * T_CHUNK
    seq = d if time_major else d.T  # [T, B] either way
    if B_pad != B:
        seq = jnp.pad(seq, ((0, 0), (0, B_pad - B)))
        g0 = jnp.pad(g0, (0, B_pad - B))
    if T_pad != T:
        seq = jnp.pad(seq, ((0, T_pad - T), (0, 0)))

    d3 = seq.reshape(T_pad, B_pad // LANES, LANES)
    g03 = g0.reshape(1, B_pad // LANES, LANES)
    alphas = jnp.stack(
        [jnp.asarray(a_att, jnp.float32), jnp.asarray(a_rel, jnp.float32)]
    ).reshape(1, 2)
    if out_batch_major:
        out = _agc_scan_call(d3, g03, alphas, interpret=interpret, sub=sub,
                             batch_major=True)[:B, :T]
        return out.reshape(lead + (T,))
    out3 = _agc_scan_call(d3, g03, alphas, interpret=interpret, sub=sub)
    out = out3.reshape(T_pad, B_pad).T[:B, :T]
    return out.reshape(lead + (T,))


def _agc_apply_kernel(a_ref, d_ref, g0_ref, x_ref, y_ref, gl_ref, g_scr,
                      c_scr, *, sub: int, yl_ref=None,
                      chunk: int | None = None, d_means: bool = False,
                      vec_refs=None):
    """Scan + gain application in one kernel: runs the recurrence over the
    time-major desired gain, then stores ``clip(x · clip(g, 0.1, max_gain),
    ±out_clip)`` batch-major AND the final clipped gain (the cross-block
    carry) — the gain array itself never touches HBM.  With ``yl_ref`` the
    store is the bf16 hi/lo PAIR (y_ref=hi, yl_ref=lo) for the pair-input
    conv kernel.

    With ``chunk`` set, the recurrence runs BLOCKWISE — the fused TPU form
    of :func:`afp_tpu.ops.agc.smooth_gain_blockwise` (``agc_mode='fast'``):
    one attack/release step per `chunk`-sample segment mean (α values
    arrive already chunk-compounded from the wrapper), linear gain
    interpolation within the segment.  The serial dependency chain shrinks
    from T_CHUNK steps to T_CHUNK/chunk per tile; the means and the
    interpolation are chain-free vector work the VPU pipelines."""
    if vec_refs is not None:
        # per-stream AGC policy banks (`batch.with_per_stream_agc`): the
        # α/max-gain vectors ride [1, sub, LANES] tiles exactly like the
        # gain carry — same elementwise ops, zero extra serial work.
        # (The clip below runs in the [T_CHUNK, sub, LANES] layout where
        # the vector broadcasts naturally — a [sub·LANES, 1] column
        # operand is an unsupported Mosaic shape cast, r5 hw_check find.)
        att_ref, rel_ref, mg_ref = vec_refs
        a_att = att_ref[0]
        a_rel = rel_ref[0]
        max_gain = mg_ref[0]
    else:
        a_att = a_ref[0, 0]
        a_rel = a_ref[0, 1]
        max_gain = a_ref[0, 2]
    out_clip = a_ref[0, 3]

    @pl.when(pl.program_id(1) == 0)
    def _():
        g_scr[...] = g0_ref[0]

    g = g_scr[...]
    if chunk is None:
        for t in range(T_CHUNK):
            d_t = d_ref[t]
            alpha = jnp.where(d_t > g, a_att, a_rel)
            g = alpha * d_t + (1.0 - alpha) * g
            c_scr[t] = g
    else:
        # (chunk, 1, 1) fractions broadcast over the [chunk, sub, LANES]
        # segment store — matches smooth_gain_blockwise's (t+1)/chunk ramp.
        # iota must be INTEGER for Mosaic (tpu.iota rejects float results —
        # hardware-only; interpret mode accepted f32) and convert after
        fr = (jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
              .astype(jnp.float32) + 1.0) * jnp.float32(1.0 / chunk)
        for c in range(T_CHUNK // chunk):
            # d_means: the RMS kernel already emitted per-chunk means
            # ([T/chunk, B] — chunk× less d HBM traffic); otherwise reduce
            # the per-sample rows here (same f32 values either way)
            d_mean = (d_ref[c] if d_means else
                      jnp.mean(d_ref[c * chunk:(c + 1) * chunk], axis=0))
            alpha = jnp.where(d_mean > g, a_att, a_rel)
            gn = alpha * d_mean + (1.0 - alpha) * g
            c_scr[c * chunk:(c + 1) * chunk] = g[None] + (gn - g)[None] * fr
            g = gn
    g_scr[...] = g
    # clip in the [T_CHUNK, sub, LANES] layout (the per-stream max-gain
    # tile broadcasts over time there), THEN flip batch-major — clip is
    # elementwise, so the order change is bit-neutral for scalars too
    gcl3 = jnp.clip(c_scr[...], 0.1, max_gain)
    gcl = gcl3.reshape(T_CHUNK, sub * LANES).T  # [sub·128, T_CHUNK]
    from .fir_td import _load_f32

    # int16 PCM x converts on the VPU first (n/32768, exact) — the gain
    # applies to the same f32 bits f32 ingest would carry
    y = jnp.clip(_load_f32(x_ref[...]) * gcl, -out_clip, out_clip)
    if yl_ref is None:
        y_ref[...] = y
    else:
        # emit the bf16 hi/lo pair of y straight from VMEM: the downstream
        # pair-input conv kernel (`fir_td.py:_fir_kernel_b3t`) then needs no
        # staging pass at all (same bitmask split the XLA path uses)
        from .fir_td import _split_bf16_in_kernel

        y_hi, y_lo = _split_bf16_in_kernel(y)
        y_ref[...] = y_hi
        yl_ref[...] = y_lo

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        gl_ref[...] = jnp.clip(g_scr[...], 0.1, max_gain)


@functools.partial(jax.jit, static_argnames=("interpret", "sub", "emit_split",
                                             "chunk", "d_means"))
def _agc_apply_call(d3, g03, x, scal, interpret: bool = False,
                    sub: int = SUBLANES, emit_split: bool = False,
                    idx=None, chunk: int | None = None,
                    d_means: bool = False, vecs=None):
    if d_means:
        # d3 rows are chunk means: T/chunk rows cover T output samples
        T = d3.shape[0] * chunk
        Bs = d3.shape[1]
        d_rows = T_CHUNK // chunk  # mean rows per grid step
    else:
        T, Bs, _ = d3.shape
        d_rows = T_CHUNK
    B = Bs * LANES
    grid = (Bs // sub, T // T_CHUNK)
    ring = idx is not None  # x is an [S, B, T] ring; stream slot idx
    if ring:
        x_spec = pl.BlockSpec((None, sub * LANES, T_CHUNK),
                              lambda i, j, s: (s[0], i, j),
                              memory_space=pltpu.VMEM)
        ix = lambda f: (lambda i, j, s: f(i, j))  # lift index_maps
    else:
        x_spec = pl.BlockSpec((sub * LANES, T_CHUNK), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
        ix = lambda f: f
    in_specs = [
        pl.BlockSpec((1, 4), ix(lambda i, j: (0, 0)),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((d_rows, sub, LANES), ix(lambda i, j: (j, i, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sub, LANES), ix(lambda i, j: (0, i, 0)),
                     memory_space=pltpu.VMEM),
        x_spec,
    ]
    y_spec = pl.BlockSpec((sub * LANES, T_CHUNK), ix(lambda i, j: (i, j)),
                          memory_space=pltpu.VMEM)
    gl_spec = pl.BlockSpec((sub, LANES), ix(lambda i, j: (i, 0)),
                           memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((sub, LANES), jnp.float32),
               pltpu.VMEM((T_CHUNK, sub, LANES), jnp.float32)]
    gl_shape = jax.ShapeDtypeStruct((Bs, LANES), jnp.float32)
    # per-stream policy vectors ride [1, sub, LANES] tiles like the carry
    nv = 0 if vecs is None else len(vecs)
    if vecs is not None:
        in_specs += [pl.BlockSpec((1, sub, LANES),
                                  ix(lambda i, j: (0, i, 0)),
                                  memory_space=pltpu.VMEM)] * nv
    args = (scal, d3, g03, x) + (tuple(vecs) if vecs is not None else ())

    def _kern(a, d, g0, xx, *rest):
        vr = rest[:nv] if nv else None
        rest = rest[nv:]
        if emit_split:
            yh, gl, yl, g_scr, c_scr = rest
            return _agc_apply_kernel(a, d, g0, xx, yh, gl, g_scr, c_scr,
                                     sub=sub, yl_ref=yl, chunk=chunk,
                                     d_means=d_means, vec_refs=vr)
        yy, gl, g_scr, c_scr = rest
        return _agc_apply_kernel(a, d, g0, xx, yy, gl, g_scr, c_scr,
                                 sub=sub, chunk=chunk, d_means=d_means,
                                 vec_refs=vr)

    kern = _kern
    if emit_split:
        out_specs = [y_spec, gl_spec, y_spec]
        out_shape = [jax.ShapeDtypeStruct((B, T), jnp.bfloat16), gl_shape,
                     jax.ShapeDtypeStruct((B, T), jnp.bfloat16)]
    else:
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
        )(idx, *args)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch, interpret=interpret,
    )(*args)


def smooth_gain_apply_pallas(desired_tm: jnp.ndarray, x: jnp.ndarray,
                             a_att, a_rel, max_gain, init=None,
                             out_clip: float = 0.99,
                             interpret: bool = False,
                             emit_split: bool = False,
                             ring_idx=None,
                             blockwise: int | None = None,
                             d_is_means: bool = False):
    """Fully fused AGC back half: scan + clip + apply + carry in one kernel.

    `desired_tm`: [T, B] time-major desired gain (the layout
    :func:`afp_tpu.ops.pallas.agc_rms.rms_desired_pallas` emits with
    ``transposed=True``); `x`: [B, T] raw block; `init`: [B] previous
    smoothed gain or None (per-block restart).  Returns
    ``(clip(x · g_clipped, ±out_clip), g_clipped[:, −1])`` — identical to

        g = smooth_gain_scan(d, a_att, a_rel, init)
        g = clip(g, 0.1, max_gain)
        (clip(x * g, -out_clip, out_clip), g[..., -1])

    Requires B divisible by the kernel tile (`_pick_sublanes(B)·128`) and
    T by T_CHUNK — the caller falls back to the unfused path otherwise
    (padding x would cost the round trip this kernel exists to remove).

    With ``emit_split=True`` the first return value is the bf16 hi/lo PAIR
    ``(y_hi, y_lo)`` (``split_bf16`` semantics, done in VMEM on the way to
    the store) for the pair-input conv kernel
    (:func:`afp_tpu.ops.pallas.fir_td.fir_td_mxu_pair`) — y never exists in
    HBM as f32.

    With ``ring_idx`` set, `x` is an [S, B, T] f32 serving ring and the
    kernel streams slot `ring_idx` directly (scalar-prefetch BlockSpec,
    the zero-copy ring discipline) — no staged block copy.

    `x` may also be RAW int16 PCM (``ingest='pcm16'``, block or ring):
    the kernel converts on the VPU (``n / 32768`` — exact), halving the
    x-read HBM bytes; outputs are bit-identical to feeding the floats.

    With ``blockwise=chunk`` the recurrence runs at `chunk` granularity —
    the fused form of :func:`afp_tpu.ops.agc.smooth_gain_blockwise`
    (``agc_mode='fast'``): same chunk means, compound α values
    ``1−(1−α)^chunk``, linear within-chunk interpolation, init=None
    restarting at the FIRST CHUNK MEAN (the blockwise restart semantics).
    The serial chain shrinks `chunk`×; everything else (clip, apply,
    carry, pair split, ring streaming) is unchanged.

    With ``d_is_means=True`` (requires `blockwise`), `desired_tm` is the
    time-major [T/blockwise, B] CHUNK-MEAN matrix the RMS kernel emits
    with ``mean_chunk=blockwise`` — the kernel consumes the means
    directly instead of reducing per-sample rows, and the d intermediate
    carries blockwise× fewer HBM bytes through the fast chain.
    """
    d = jnp.asarray(desired_tm, dtype=jnp.float32)
    x = jnp.asarray(x)
    if x.dtype != jnp.int16:
        x = x.astype(jnp.float32)
    if d_is_means:
        if blockwise is None:
            raise ValueError("d_is_means requires blockwise")
        Tm, B = d.shape
        T = Tm * blockwise
    else:
        T, B = d.shape
    sub = _pick_sublanes(B)
    if B % (sub * LANES) or T % T_CHUNK:
        raise ValueError(
            f"shape [{B}, {T}] not tileable ({sub * LANES}, {T_CHUNK}); "
            "use smooth_gain_scan_pallas + XLA apply instead")
    if blockwise is not None:
        if T_CHUNK % blockwise:
            raise ValueError(
                f"blockwise chunk {blockwise} must divide {T_CHUNK}")
        # compound per-chunk coefficients — the smooth_gain_blockwise math,
        # computed in f32 jnp ops so the fused and XLA paths agree bitwise
        a_att = 1.0 - (1.0 - jnp.asarray(a_att, jnp.float32)) ** blockwise
        a_rel = 1.0 - (1.0 - jnp.asarray(a_rel, jnp.float32)) ** blockwise
    # per-stream policy banks: [B] α / max-gain vectors (any one vector
    # promotes all three — ONE kernel variant, vectors tiled like the carry)
    a_att = jnp.asarray(a_att, jnp.float32)
    a_rel = jnp.asarray(a_rel, jnp.float32)
    mg = jnp.asarray(max_gain, jnp.float32)
    vecs = None
    if a_att.ndim == 1 or a_rel.ndim == 1 or mg.ndim == 1:
        vecs = tuple(
            jnp.broadcast_to(v.reshape(-1 if v.ndim else ()), (B,))
            .reshape(1, B // LANES, LANES)
            for v in (a_att, a_rel, mg))
        mg = jnp.float32(3.4e38)  # scal slot unused in vector mode
    if init is not None:
        g0 = jnp.broadcast_to(
            jnp.asarray(init, dtype=jnp.float32).reshape(-1), (B,))
    elif blockwise is not None:
        # blockwise restart: g₋₁ := mean(d[:chunk]) makes the first segment
        # exactly flat at the first chunk mean under either α branch —
        # smooth_gain_blockwise's init=None semantics (with d_is_means the
        # first row IS that mean)
        g0 = d[0] if d_is_means else d[:blockwise].mean(axis=0)
    else:
        g0 = d[0]
    d3 = d.reshape(d.shape[0], B // LANES, LANES)
    g03 = g0.reshape(1, B // LANES, LANES)
    # scalar-mode values ride SMEM; in vector mode the first three slots
    # are inert placeholders (the kernel reads the VMEM vector tiles)
    z = jnp.float32(0.0)
    scal = jnp.stack([
        z if vecs is not None else a_att.astype(jnp.float32),
        z if vecs is not None else a_rel.astype(jnp.float32),
        mg if vecs is None else z,
        jnp.asarray(out_clip, jnp.float32),
    ]).reshape(1, 4)
    idx = None
    if ring_idx is not None:
        assert x.ndim == 3, "ring mode needs an [S, B, T] ring"
        idx = jnp.asarray(ring_idx, dtype=jnp.int32).reshape(1)
    if emit_split:
        y_hi, gl, y_lo = _agc_apply_call(d3, g03, x, scal, interpret=interpret,
                                         sub=sub, emit_split=True, idx=idx,
                                         chunk=blockwise, d_means=d_is_means,
                                         vecs=vecs)
        return (y_hi, y_lo), gl.reshape(B)
    y, gl = _agc_apply_call(d3, g03, x, scal, interpret=interpret, sub=sub,
                            idx=idx, chunk=blockwise, d_means=d_is_means,
                            vecs=vecs)
    return y, gl.reshape(B)
