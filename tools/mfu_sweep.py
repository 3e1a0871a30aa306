"""MFU campaign harness (VERDICT r3 #1): the f32-ring serving megakernel
at the headline shape under tile-geometry / compiler-parameter variants,
plus the ablations that decompose the gap between measured useful-MFU and
the B3 structural bound.

The bound, for the banded-Toeplitz B3 kernel at cascade length N with
LANE=128 output tiles and k_pad = ceil128(N−1):

    bound = N / (3 · (k_pad + 128))      (× bf16 peak)

    'fast' cascade  N=271: 271/(3·512) = 0.176
    'vhq'  cascade  N=379: 379/(3·512) = 0.247   ← same k_pad, same K!

i.e. the vhq upgrade adds useful taps into tile slots the dense dot was
already paying for — the wall time should be FLAT across N∈[259, 385].
This sweep verifies that on hardware and probes the engineering residual
(pipeline bubbles, epilogue, in-kernel split) via:

  * n_casc sweep at fixed k_pad (271 vs 379 — flat-time check),
  * batch-tile ladder (64 / 128),
  * Mosaic ``dimension_semantics`` on the (tile, step) grid,
  * dither-off (epilogue ablation),
  * pair-ring (in-kernel split ablation: the pair kernel is the same
    body minus `_split_bf16_in_kernel`),
  * nodots (dots removed: the DMA/VPU floor of the walk).

Usage (real TPU):  python tools/mfu_sweep.py  [N_STEPS=512] [REPS=4]
Writes one JSON line per variant to stdout.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from afp_tpu.ops.pallas.fir_td import (LANE, _fir_kernel_b3mega_f32,
                                       _pick_b_tile_b3t_f32, split_bf16)

S = 16
BATCH = int(os.environ.get("SWEEP_BATCH", "4096"))
T = int(os.environ.get("SWEEP_BLOCK", "4096"))
N_STEPS = int(os.environ.get("SWEEP_STEPS", "512"))
REPS = int(os.environ.get("SWEEP_REPS", "4"))
PEAK = 197e12  # v5e bf16


def _nodots_kernel(x_ref, t_in_ref, bhi_ref, blo_ref, o_ref, t_o, *,
                   k_pad: int, t_tiles: int):
    """The mega-f32 walk with the three MXU passes removed: measures the
    DMA + split + store floor the dots must hide under."""
    from afp_tpu.ops.pallas.fir_td import _split_bf16_in_kernel

    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        t_o[:, :] = t_in_ref[:, :]

    x_hi, x_lo = _split_bf16_in_kernel(x_ref[:, :])
    for t in range(t_tiles):
        o_ref[:, t * LANE:(t + 1) * LANE] = (
            x_hi[:, t * LANE:(t + 1) * LANE].astype(jnp.float32)
            + x_lo[:, t * LANE:(t + 1) * LANE].astype(jnp.float32))
    Tt = t_tiles * LANE
    t_o[:, :] = x_ref[:, Tt - k_pad:]


@functools.partial(jax.jit, static_argnames=(
    "n_steps", "bt", "sem", "pair", "nodots"))
def _mega_call(start, ring, tail, band, out_ring, ring_lo=None, tail_lo=None,
               n_steps: int = 512, bt: int | None = None,
               sem: tuple | None = None, pair: bool = False,
               nodots: bool = False):
    if pair:
        Sn, B, Tn = ring.shape
    else:
        Sn, B, Tn = ring.shape
    k_pad = tail.shape[1]
    n_taps = band.shape[0] - LANE + 1
    band_p = jnp.pad(band, ((k_pad - (n_taps - 1), 0), (0, 0)))
    t_tiles = Tn // LANE
    b_hi, b_lo = split_bf16(band_p)
    if bt is None:
        bt = _pick_b_tile_b3t_f32(B, k_pad, Tn)
    grid = (B // bt, n_steps)
    ring_spec = pl.BlockSpec((None, bt, Tn),
                             lambda i, st, *pref: ((pref[0][0] + st) % Sn, i, 0),
                             memory_space=pltpu.VMEM)
    t_in_spec = pl.BlockSpec((bt, k_pad), lambda i, st, *pref: (i, 0),
                             memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((band_p.shape[0], LANE),
                             lambda i, st, *pref: (0, 0),
                             memory_space=pltpu.VMEM)
    ring_io_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_specs = [
        pl.BlockSpec((None, bt, Tn),
                     lambda i, st, *pref: ((pref[0][0] + st) % Sn, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, k_pad), lambda i, st, *pref: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((Sn, B, Tn), jnp.float32),
                 jax.ShapeDtypeStruct((B, k_pad), tail.dtype)]
    kwargs = {}
    if sem is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=sem)
    if pair:
        from afp_tpu.ops.pallas.fir_td import _fir_kernel_b3mega

        out_specs = [out_specs[0],
                     pl.BlockSpec((bt, k_pad), lambda i, st, *pref: (i, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((bt, k_pad), lambda i, st, *pref: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape[0],
                     jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16),
                     jax.ShapeDtypeStruct((B, k_pad), jnp.bfloat16)]
        kernel = functools.partial(_fir_kernel_b3mega, k_pad=k_pad,
                                   t_tiles=t_tiles)
        kern = lambda sidx, a, b, c, d, e, f, rio, o, th, tl: kernel(
            a, b, c, d, e, f, o, th, tl)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[ring_spec, ring_spec, t_in_spec, t_in_spec,
                      band_spec, band_spec, ring_io_spec],
            out_specs=out_specs)
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            input_output_aliases={7: 0}, **kwargs,
        )(start, ring, ring_lo, tail, tail_lo, b_hi, b_lo, out_ring)
    body = (_nodots_kernel if nodots else _fir_kernel_b3mega_f32)
    kernel = functools.partial(body, k_pad=k_pad, t_tiles=t_tiles)
    kern = lambda sidx, x, t, e, f, rio, o, to: kernel(x, t, e, f, o, to)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[ring_spec, t_in_spec, band_spec, band_spec, ring_io_spec],
        out_specs=out_specs)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={5: 0}, **kwargs,
    )(start, ring, tail, b_hi, b_lo, out_ring)


def time_variant(name, n_casc, **kw):
    from afp_tpu.ops.pallas.fir_td import band_matrix

    h = (np.hanning(n_casc) / n_casc).astype(np.float32)
    band = jnp.asarray(band_matrix(h))
    k_pad = -(-(n_casc - 1) // LANE) * LANE
    rng = np.random.default_rng(0)
    base = rng.standard_normal((BATCH, T), dtype=np.float32) * 0.3
    pair = kw.get("pair", False)
    if pair:
        rh, rl = split_bf16(jnp.broadcast_to(jnp.asarray(base), (S, BATCH, T)))
        rh, rl = jnp.asarray(rh), jnp.asarray(rl)
        tail = jnp.zeros((BATCH, k_pad), jnp.bfloat16)
        tail_lo = jnp.zeros((BATCH, k_pad), jnp.bfloat16)
    else:
        rh = jnp.broadcast_to(jnp.asarray(base), (S, BATCH, T)) + 0.0
        rl, tail_lo = None, None
        tail = jnp.zeros((BATCH, k_pad), jnp.float32)
    out = jnp.zeros((S, BATCH, T), jnp.float32)
    start = jnp.zeros((1,), jnp.int32)

    def dispatch(out):
        r = _mega_call(start, rh, tail, band, out, ring_lo=rl,
                       tail_lo=tail_lo, n_steps=N_STEPS, **kw)
        return r[0]

    try:
        out = dispatch(out)
        float(jnp.sum(out[0, 0, :8]))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:300]}),
              flush=True)
        return
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = dispatch(out)
        float(jnp.sum(out[0, 0, :8]))
        times.append(time.perf_counter() - t0)
    best = min(times)
    per_block = best / N_STEPS
    useful = 2.0 * BATCH * T * n_casc
    mfu = useful / per_block / PEAK
    xrt = N_STEPS * BATCH * T / 44100 / best
    bound = n_casc / (3.0 * (k_pad + LANE))
    print(json.dumps({
        "variant": name, "n_casc": n_casc, "k_pad": k_pad,
        "best_s": round(best, 4), "us_per_block": round(per_block * 1e6, 1),
        "mfu": round(mfu, 4), "bound": round(bound, 4),
        "pct_of_bound": round(mfu / bound * 100, 1), "xrt": round(xrt, 0),
    }), flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    # flat-time check: same k_pad, different useful taps
    time_variant("base_fast_casc", 271)
    time_variant("base_vhq_casc", 379)
    # compiler semantics: batch tiles are independent → 'parallel'
    time_variant("sem_par_vhq", 379, sem=("parallel", "arbitrary"))
    # batch-tile ladder
    time_variant("bt64_vhq", 379, bt=64)
    time_variant("bt256_vhq", 379, bt=256)
    # ablations
    time_variant("pair_vhq", 379, pair=True)      # no in-kernel split
    time_variant("nodots", 379, nodots=True)      # DMA/VPU floor
    # K-boundary probe: N=385 fills k_pad=384 exactly; N=386 spills to 512
    time_variant("casc385", 385)
    time_variant("casc386_spill", 386)


if __name__ == "__main__":
    main()
