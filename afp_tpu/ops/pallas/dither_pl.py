"""Pallas TPU dither kernel — the output-stage noise at native PRNG speed.

Round-2 ablation on the headline config measured the XLA threefry dither at
~1.0 ms of the 1.58 ms block budget (62%!) — generating 16.7M keyed uniforms
per block dominates everything else combined.  This kernel replaces it on
TPU with `pltpu.prng_random_bits` (the hardware's counter PRNG seeded
per-block, per-tile), fused add in VMEM:

* same distributions as :func:`afp_tpu.ops.dither.dither` — RPDF
  ``(u−0.5)·lsb`` (the reference's math, `stream_process.py:61-64`) and true
  TPDF ``(u₁−u₂)·lsb`` — with the same ``lsb = 2/2**bits`` amplitude,
* deterministic: the block key folds into a 31-bit seed, so same key ⇒ same
  noise (different bitstream than threefry, same contract),
* per-tile seed offset keeps batch tiles decorrelated.

The engine selects this kernel on the TPU backend; the XLA path remains for
CPU/interpret and is the distribution oracle in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dither_pallas", "fold_seed", "tile_noise"]


def tile_noise(shape, lsb: float, tpdf: bool):
    """TPDF/RPDF noise tile off the hardware PRNG (caller seeds).

    TPDF derives its two uniforms from the 16-bit halves of ONE 32-bit draw
    (quantization 96 dB below the dither floor — half the PRNG cost); int32
    hops because Mosaic lacks uint32→f32 casts.  This is the single source
    of truth for the noise math (the conv-fused and standalone kernels both
    call it)."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    if tpdf:
        u1 = (b1 & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        u2 = (b1 >> 16).astype(jnp.int32).astype(jnp.float32)
        return (u1 - u2) * (lsb / 65536.0)
    u1 = (b1 >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u1 - 0.5) * lsb


def fold_seed(key: jax.Array) -> jnp.ndarray:
    """Fold a threefry key into a 31-bit hardware-PRNG seed ([1,1] int32,
    SMEM-ready) — scalar work, negligible next to a 16M-sample block."""
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    seed = ((kd[0] ^ (kd[-1] << 13) ^ (kd[-1] >> 7)) & jnp.uint32(0x7FFFFFFF))
    return seed.astype(jnp.int32).reshape(1, 1)


def _kernel(seed_ref, x_ref, o_ref, *, lsb: float, tpdf: bool):
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    o_ref[...] = x_ref[...] + tile_noise(x_ref.shape, lsb, tpdf)


def _pick_tile(B: int, T: int) -> int:
    for bt in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if B % bt == 0 and 2 * bt * T * 4 <= 12 * 2**20:
            return bt
    return 1


@functools.partial(jax.jit, static_argnames=("bit_depth", "kind", "interpret"))
def dither_pallas(key: jax.Array, x: jnp.ndarray, bit_depth: int = 24,
                  kind: str = "tpdf", interpret: bool = False) -> jnp.ndarray:
    """Drop-in TPU replacement for :func:`afp_tpu.ops.dither.dither`
    (same distribution and determinism contract, hardware PRNG)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    if kind == "off":
        return x
    if kind not in ("rpdf", "tpdf"):
        raise ValueError(f"kind must be 'rpdf', 'tpdf' or 'off', got {kind!r}")
    lsb = 2.0 ** (1 - bit_depth)
    seed = fold_seed(key)

    lead = x.shape[:-1]
    T = x.shape[-1]
    B = 1
    for s in lead:
        B *= s
    x2 = x.reshape(B, T)
    bt = _pick_tile(B, T)
    out = pl.pallas_call(
        functools.partial(_kernel, lsb=lsb, tpdf=(kind == "tpdf")),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.float32),
        interpret=interpret,
    )(seed, x2)
    return out.reshape(x.shape)
