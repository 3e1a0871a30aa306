#!/usr/bin/env python
"""Per-kernel time decomposition of the fused AGC (C8) serving chain.

r5 established the chain is bound by its overlapped compute/DMA envelope
(byte cuts move nothing).  This probe times each kernel of the chain
ALONE at the C8 operating point ([4096, 2048] f32, w=512) so BENCHMARKS
can name the envelope's parts:

    rms     — rms_desired_pallas (ring input, time-major d)
    rms+mc  — same with mean_chunk=32 (the fast-mode means emission)
    apply   — smooth_gain_apply_pallas (ring x, pair emit)
    conv    — fir_td_mxu_pair_to_ring (tail emit)

Each timed as 512 chained dispatches (scalar-fetch synced), reported as
µs/block.  Run on the TPU: python tools/probe_agc_envelope.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    B, T, W = 4096, 2048, 512
    cfg = StreamConfig(
        samplerate=44100, blocksize=T, upsample_factor=2, numtaps=129,
        batch=B, cutoff=14000.0, eq_enabled=True, agc_enabled=True,
        agc_mode="exact", agc_window_size=W, agc_carry=True,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=0.99,
        conv_strategy="td_mxu")
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    rng = np.random.default_rng(0)
    K = 8
    ring = jnp.asarray((rng.standard_normal((K, B, T)) * 0.1
                        ).astype(np.float32))
    n = 512

    from afp_tpu.ops.pallas.agc_rms import rms_desired_pallas
    from afp_tpu.ops.pallas.agc_scan import smooth_gain_apply_pallas
    from afp_tpu.ops.pallas.fir_td import (fir_td_mxu_pair_to_ring,
                                           split_bf16)

    lp, rp = pipe._rms_pad
    band_rms = pipe._rms_band
    k = params.combined_cascade(True)
    band = jnp.where(pipe._band_mask, jnp.take(k, pipe._band_idx), 0.0)
    kp = pipe._k_pad

    # big operands ride as ARGUMENTS (a closed-over array bakes into the
    # compile request as a constant — 256 MB blew the tunnel's body limit)
    def loop(fn):
        @jax.jit
        def run(carry, *ops):
            def body(c, i):
                return fn(c, i, *ops), ()
            c, _ = jax.lax.scan(body, carry, jnp.arange(n, dtype=jnp.int32))
            return c
        return run

    legs = {}

    # rms alone: carry = d (keeps a data dependence so the scan is honest)
    def rms_step(c, i, ring_a, mc=0):
        d = rms_desired_pallas(ring_a, band_rms, lp, rp,
                               params.agc_target, params.agc_max_gain,
                               exact_band=pipe._rms_exact, transposed=True,
                               ring_idx=jnp.mod(i, K), mean_chunk=mc)
        return c + d[0, 0]

    legs["rms"] = (loop(rms_step), (ring,))
    legs["rms_mc32"] = (loop(
        lambda c, i, r: rms_step(c, i, r, mc=32)), (ring,))

    d_tm = jnp.abs(jnp.asarray(
        (rng.standard_normal((T, B)) * 0.2 + 1.0).astype(np.float32)))

    def apply_step(c, i, ring_a, d_a):
        (xh, xl), gl = smooth_gain_apply_pallas(
            d_a, ring_a, params.agc_a_att, params.agc_a_rel,
            params.agc_max_gain, init=c, out_clip=0.99, emit_split=True,
            ring_idx=jnp.mod(i, K))
        return gl

    legs["apply"] = (loop(apply_step), (ring, d_tm))

    xh0, xl0 = split_bf16(ring[0])
    th0 = jnp.zeros((B, kp), jnp.bfloat16)
    out_ring0 = jnp.zeros((K, B, T), jnp.float32)

    def conv_run():
        @jax.jit
        def run(th, tl, org, xh, xl):
            def body(carry, i):
                th, tl, org = carry
                org, th, tl = fir_td_mxu_pair_to_ring(
                    xh, xl, th, tl, band, jnp.mod(i, K), org,
                    out_clip=0.99, emit_tail=True)
                return (th, tl, org), ()
            (th, tl, org), _ = jax.lax.scan(
                body, (th, tl, org), jnp.arange(n, dtype=jnp.int32))
            return org
        return run

    print(f"C8 decomposition [{B}, {T}] w={W}, {n}-step dispatches "
          f"(µs/block):", flush=True)
    for name, (run, ops) in legs.items():
        carry = (jnp.zeros((B,), jnp.float32) + 1.0 if name == "apply"
                 else jnp.float32(0.0))
        r = run(carry, *ops)
        jax.block_until_ready(r)
        float(jnp.sum(r))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            r = run(carry, *ops)
            float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:>8}: {best / n * 1e6:8.1f} µs/block", flush=True)

    run = conv_run()
    org = run(th0, th0, out_ring0, xh0, xl0)
    float(jnp.sum(org))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        org = run(th0, th0, out_ring0, xh0, xl0)
        float(jnp.sum(org))
        best = min(best, time.perf_counter() - t0)
    print(f"  {'conv':>8}: {best / n * 1e6:8.1f} µs/block", flush=True)


if __name__ == "__main__":
    main()
