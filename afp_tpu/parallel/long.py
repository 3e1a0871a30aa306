"""Long-signal processing: the fused pipeline over a time-sharded mesh
(SURVEY.md §5.7 "context parallelism", applied to the production engine).

Because the engine's linear chain collapses to one base-rate FIR (the fused
cascade, see `engine/pipeline.py`), filtering an arbitrarily long signal
across D devices is exactly :func:`~afp_tpu.parallel.halo.halo_convolve` with
the cascade kernel: shard the time axis, exchange an ``n_casc−1`` halo with
one `ppermute`, convolve locally.  Output equals the streaming engine's
block-scan output bit-near (equivalence-tested).

The nonlinear stages are handled per their structure:
* dither is position-independent → applied per-shard with decorrelated keys,
* AGC is a sequential recurrence → not time-shardable exactly; long-signal
  mode requires ``agc_enabled=False`` (use the streaming engine for AGC
  jobs — time is the scan axis there).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..engine.pipeline import DeviceParams, Pipeline
from .halo import halo_convolve

__all__ = ["filter_long_signal"]


def filter_long_signal(pipe: Pipeline, params: DeviceParams, x: jnp.ndarray,
                       mesh: Mesh, axis: str = "time",
                       dither_seed: Optional[int] = None) -> jnp.ndarray:
    """Filter [T] or [B, T] through the fused cascade, time-sharded.

    `T` must divide over the mesh axis and the per-device chunk must exceed
    the cascade length.  Equivalent to streaming the signal through the
    pipeline (dither-off) block by block.
    """
    if not pipe.fused:
        raise ValueError("long-signal mode requires fuse_rate_conversion=True")
    if pipe.cfg.agc_enabled:
        raise ValueError("AGC is sequential in time; disable it for "
                         "time-sharded long-signal mode")
    has_eq = pipe.cfg.eq_enabled and len(pipe.cfg.eq_bands) > 0
    if params.casc_main is not None:
        k = params.combined_cascade(has_eq)
    else:
        # reconstruct time-domain cascade from the spectrum
        H = params.combined_response(has_eq, premultiplied=True)
        k = jnp.fft.irfft(H, n=pipe.nfft)[: pipe.n_casc]
    y = halo_convolve(x, k, mesh, axis=axis)
    if pipe.cfg.dither_kind != "off" and dither_seed is not None:
        from ..ops.dither import dither

        y = dither(jax.random.PRNGKey(dither_seed), y,
                   pipe.cfg.dither_bits, pipe.cfg.dither_kind)
    if pipe.cfg.output_clip is not None:
        y = jnp.clip(y, -pipe.cfg.output_clip, pipe.cfg.output_clip)
    return y
