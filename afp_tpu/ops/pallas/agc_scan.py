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

__all__ = ["smooth_gain_scan_pallas"]

#: max batch tile: SUBLANES × 128 lanes per time-step row.  32 sublanes = 4
#: independent (8×128) vregs per step — four parallel dependency chains hide
#: the VPU result latency of the serial recurrence.  Small batches use
#: smaller tiles (multiples of 8) so they don't pad up to 4096 streams.
SUBLANES = 32
LANES = 128


def _pick_sublanes(B: int) -> int:
    """Smallest multiple-of-8 sublane count whose tile covers the batch,
    capped at SUBLANES — batch 256 runs a 2048-lane tile, not 4096."""
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


@functools.partial(jax.jit, static_argnames=("interpret", "sub"))
def _agc_scan_call(d3: jnp.ndarray, g03: jnp.ndarray, alphas: jnp.ndarray,
                   interpret: bool = False, sub: int = SUBLANES) -> jnp.ndarray:
    """d3: [T, Bs, 128]; g03: [1, Bs, 128]; alphas: [1, 2] → [T, Bs, 128].
    T must be a multiple of T_CHUNK and Bs of `sub` (wrapper pads)."""
    T, Bs, _ = d3.shape
    grid = (Bs // sub, T // T_CHUNK)  # time minor: sequential chunks
    return pl.pallas_call(
        _agc_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T_CHUNK, sub, LANES), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANES), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T_CHUNK, sub, LANES),
                               lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Bs, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((sub, LANES), jnp.float32)],
        interpret=interpret,
    )(alphas, d3, g03)


def smooth_gain_scan_pallas(desired: jnp.ndarray, a_att, a_rel,
                            init=None, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for :func:`afp_tpu.ops.agc.smooth_gain_scan`.

    `desired`: [..., T]; `init`: [...] previous smoothed gain or None
    (restart at ``desired[..., 0]``, the reference's per-block behavior).
    Batch and time are padded internally to the kernel's tile sizes (the
    padded tail is causal — discarding it never perturbs valid outputs).
    """
    d = jnp.asarray(desired, dtype=jnp.float32)
    lead = d.shape[:-1]
    T = d.shape[-1]
    B = 1
    for s in lead:
        B *= s
    d2 = d.reshape(B, T)

    if init is None:
        # g₋₁ = desired[0] ⇒ step 0 yields desired[0] under either branch
        g0 = d2[:, 0]
    else:
        g0 = jnp.broadcast_to(
            jnp.asarray(init, dtype=jnp.float32).reshape(-1), (B,)
        )

    sub = _pick_sublanes(B)
    tile = sub * LANES
    B_pad = -(-B // tile) * tile
    T_pad = -(-T // T_CHUNK) * T_CHUNK
    seq = d2
    if B_pad != B:
        seq = jnp.pad(seq, ((0, B_pad - B), (0, 0)))
        g0 = jnp.pad(g0, (0, B_pad - B))
    if T_pad != T:
        seq = jnp.pad(seq, ((0, 0), (0, T_pad - T)))

    d3 = seq.T.reshape(T_pad, B_pad // LANES, LANES)
    g03 = g0.reshape(1, B_pad // LANES, LANES)
    alphas = jnp.stack(
        [jnp.asarray(a_att, jnp.float32), jnp.asarray(a_rel, jnp.float32)]
    ).reshape(1, 2)
    out3 = _agc_scan_call(d3, g03, alphas, interpret=interpret, sub=sub)
    out = out3.reshape(T_pad, B_pad).T[:B, :T]
    return out.reshape(lead + (T,))
