#!/usr/bin/env python
"""On-hardware Pallas kernel validation sweep.

CI (`tests/`) pins JAX to the CPU backend and exercises the Pallas kernels in
interpret mode — which cannot catch compiled-lowering bugs (the −50 dB bf16
rounding trap of round 1, the even-window centering off-by-one of round 2
were both hardware-only).  `bench.py` asserts accuracy for the single primary
config.  This script is the broad sweep: it runs EVERY Pallas kernel on the
real TPU against a float64 host oracle and hard-fails on any contract break.

Run from the repo root on a machine with a TPU attached:

    python tools/hw_check.py            # full sweep, prints one JSON line

Checks (each asserted, not just reported):
  1. fir_td_mxu, all precision modes (B3 / B3F / B3C / HIGHEST), several
     (taps, block, batch) shapes vs float64 np.convolve         < −90 dB
  2. fir_td_mxu_per_stream (B3 + HIGHEST) vs per-stream oracle  < −90 dB
  3. smooth_gain_scan_pallas vs the float64 per-sample recurrence
     (the reference AGC semantics, stream_process_AGC.py:68-79) < −120 dB
  4. dither_pallas distribution: mean ≈ 0, tpdf/rpdf variance ratio ≈ 2,
     determinism under the key, cross-stream decorrelation
  5. conv-fused dither: residual noise (fused − clean) has dither stats

CPU flow mode (``AFP_HW_CHECK_CPU_FLOW=1 JAX_PLATFORMS=cpu``): runs the
SAME sweep — same configs, same shapes, same call graph — on the CPU
backend in interpret mode, so a wiring/crash bug (a cfg a check builds
wrong, a ring-form mismatch, a dtype contract break) is caught before it
burns a hardware window mid-sweep.  Only the hardware-only claims relax:
the pltpu-PRNG dither checks are skipped (no CPU interpret lowering —
tests/test_agc_dither.py documents this), the serving-ring legs run
dither-off (their in-kernel dither/quantize stores are PRNG-backed), and
the fold's bit-exact asserts widen to the documented interpret-GEMM
reassociation bound (tests/test_fold.py:CPU_ATOL).  Flow mode passing
certifies WIRING, never numerics — the hardware sweep is the contract.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

# repo root importability without PYTHONPATH (env PYTHONPATH breaks the axon
# TPU plugin discovery — docs/ROADMAP.md dev-environment note)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent compile cache: the sweep compiles ~20 kernel variants; cold
# compiles through the tunneled device dominate the run time otherwise
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/afp_jax_cache")

#: CPU flow mode — see the module docstring.  Read at import time so the
#: fused-AGC force flag is in the environment before any Pipeline builds.
FLOW = os.environ.get("AFP_HW_CHECK_CPU_FLOW", "0") == "1"
#: interpret flag for the direct kernel calls below (pipelines pick their
#: own via jax.default_backend())
INTERPRET = FLOW
if FLOW:
    # engage the fused AGC chain / conv-pair paths off-TPU (the same env
    # the CPU test suite uses) so flow mode traces the hardware call graph
    os.environ.setdefault("AFP_AGC_FUSED_FORCE", "1")


def db(err: float, scale: float) -> float:
    return float(20 * np.log10(err / (scale + 1e-300) + 1e-300))


def check_fir_td() -> dict:
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import band_matrix, fir_td_mxu

    rng = np.random.default_rng(0)
    results = {}
    for taps, T, B in ((379, 4096, 256), (1001, 2048, 64), (129, 512, 512)):
        h = (rng.standard_normal(taps) * (2.0 / taps)).astype(np.float32)
        x = rng.standard_normal((B, T + taps - 1)).astype(np.float32) * 0.3
        gold = np.stack(
            [np.convolve(xi.astype(np.float64), h.astype(np.float64),
                         mode="valid") for xi in x]
        )
        band = jnp.asarray(band_matrix(h))
        xj = jnp.asarray(x)
        for prec in ("B3", "B3F", "B3C", "HIGHEST"):
            y = np.asarray(fir_td_mxu(xj, band, precision=prec,
                                      interpret=INTERPRET))
            e = db(np.max(np.abs(y - gold)), np.max(np.abs(gold)))
            key = f"fir_{taps}t_{T}x{B}_{prec}"
            results[key] = round(e, 1)
            assert e < -90, f"{key}: {e:.1f} dB breaks the −90 dB contract"
    return results


def check_fir_per_stream() -> dict:
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import fir_td_mxu_per_stream

    rng = np.random.default_rng(1)
    taps, T, B, K = 257, 1024, 128, 4
    kernels = (rng.standard_normal((K, taps)) * (2.0 / taps)).astype(np.float32)
    gains = rng.uniform(0.2, 2.0, size=(B, K)).astype(np.float32)
    x = rng.standard_normal((B, T + taps - 1)).astype(np.float32) * 0.3
    gold = np.zeros((B, T))
    for b in range(B):
        for k in range(K):
            gold[b] += gains[b, k] * np.convolve(
                x[b].astype(np.float64), kernels[k].astype(np.float64),
                mode="valid")
    results = {}
    for prec in ("B3", "HIGHEST"):
        y = np.asarray(fir_td_mxu_per_stream(
            jnp.asarray(x), jnp.asarray(kernels), jnp.asarray(gains),
            precision=prec, interpret=INTERPRET))
        e = db(np.max(np.abs(y - gold)), np.max(np.abs(gold)))
        results[f"fir_ps_{prec}"] = round(e, 1)
        assert e < -90, f"fir_ps_{prec}: {e:.1f} dB"
    return results


def check_agc_scan() -> dict:
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.agc_scan import smooth_gain_scan_pallas

    rng = np.random.default_rng(2)
    B, T = 300, 2048  # deliberately not a tile multiple (padding path)
    d = rng.uniform(0.1, 4.0, size=(B, T)).astype(np.float32)
    a_att, a_rel = 0.15, 0.013
    # float64 per-sample oracle (reference recurrence)
    g64 = np.empty((B, T))
    g = d[:, 0].astype(np.float64)
    for t in range(T):
        dt = d[:, t].astype(np.float64)
        alpha = np.where(dt > g, a_att, a_rel)
        g = alpha * dt + (1.0 - alpha) * g
        g64[:, t] = g
    y = np.asarray(smooth_gain_scan_pallas(jnp.asarray(d), a_att, a_rel,
                                           interpret=INTERPRET))
    e = db(np.max(np.abs(y - g64)), np.max(np.abs(g64)))
    # carried-init variant
    init = rng.uniform(0.5, 2.0, size=(B,)).astype(np.float32)
    g = init.astype(np.float64)
    g64i = np.empty((B, T))
    for t in range(T):
        dt = d[:, t].astype(np.float64)
        alpha = np.where(dt > g, a_att, a_rel)
        g = alpha * dt + (1.0 - alpha) * g
        g64i[:, t] = g
    yi = np.asarray(smooth_gain_scan_pallas(jnp.asarray(d), a_att, a_rel,
                                            init=jnp.asarray(init),
                                            interpret=INTERPRET))
    ei = db(np.max(np.abs(yi - g64i)), np.max(np.abs(g64i)))
    assert e < -120 and ei < -120, f"agc scan: {e:.1f} / {ei:.1f} dB"
    return {"agc_restart": round(e, 1), "agc_carried": round(ei, 1)}


def check_dither() -> dict:
    import jax
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.dither_pl import dither_pallas

    bits = 24
    lsb = 2.0 ** (1 - bits)
    x = jnp.zeros((64, 8192), dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    tp = np.asarray(dither_pallas(key, x, bits, "tpdf"))
    rp = np.asarray(dither_pallas(key, x, bits, "rpdf"))
    tp2 = np.asarray(dither_pallas(key, x, bits, "tpdf"))
    var_ratio = float(tp.var() / rp.var())
    mean_lsb = float(abs(tp.mean()) / lsb)
    # cross-stream decorrelation (adjacent rows)
    c = np.corrcoef(tp[:-1].ravel(), tp[1:].ravel())[0, 1]
    assert np.array_equal(tp, tp2), "dither must be deterministic under key"
    assert 1.8 < var_ratio < 2.2, f"tpdf/rpdf var ratio {var_ratio:.3f}"
    assert mean_lsb < 0.05, f"dither mean {mean_lsb:.4f} LSB"
    assert abs(c) < 0.05, f"cross-stream corr {c:.4f}"
    assert float(np.max(np.abs(tp))) <= lsb * (1 + 1e-6), "tpdf range"
    return {"dither_var_ratio": round(var_ratio, 3),
            "dither_mean_lsb": round(mean_lsb, 5),
            "dither_xcorr": round(float(c), 4)}


def check_fused_dither() -> dict:
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.dither_pl import fold_seed
    from afp_tpu.ops.pallas.fir_td import band_matrix, fir_td_mxu
    import jax

    rng = np.random.default_rng(3)
    taps, T, B = 129, 2048, 128
    bits = 24
    lsb = 2.0 ** (1 - bits)
    h = (rng.standard_normal(taps) * (2.0 / taps)).astype(np.float32)
    x = rng.standard_normal((B, T + taps - 1)).astype(np.float32) * 0.3
    band = jnp.asarray(band_matrix(h))
    xj = jnp.asarray(x)
    clean = np.asarray(fir_td_mxu(xj, band))
    seed = fold_seed(jax.random.PRNGKey(11))
    noisy = np.asarray(fir_td_mxu(xj, band, dither_seed=seed,
                                  dither_bits=bits, dither_tpdf=True))
    res = noisy - clean
    # residual must be TPDF noise: zero-mean, var = lsb²/6, bounded by ±lsb
    var_norm = float(res.var() / (lsb * lsb / 6.0))
    assert np.max(np.abs(res)) <= lsb * (1 + 1e-6), "fused dither range"
    assert 0.9 < var_norm < 1.1, f"fused dither var {var_norm:.3f}× expected"
    assert abs(res.mean()) < 0.05 * lsb, "fused dither mean"
    return {"fused_dither_var_norm": round(var_norm, 3)}


def check_fused_clip() -> dict:
    """The fused output clamp (`fir_td_mxu(out_clip=c)`) must be bit-exact
    against clipping the plain kernel's output — on the compiled lowering,
    not just interpret mode (tests/test_pallas.py covers that)."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import band_matrix, fir_td_mxu

    rng = np.random.default_rng(4)
    taps, T, B = 129, 1024, 256
    h = (rng.standard_normal(taps) * 0.2).astype(np.float32)
    x = rng.standard_normal((B, T + taps - 1)).astype(np.float32) * 2.0
    band = jnp.asarray(band_matrix(h))
    xj = jnp.asarray(x)
    plain = np.asarray(fir_td_mxu(xj, band, interpret=INTERPRET))
    assert np.max(np.abs(plain)) > 0.99, "clip must bite for this check"
    fused = np.asarray(fir_td_mxu(xj, band, out_clip=0.99,
                                  interpret=INTERPRET))
    assert np.array_equal(fused, np.clip(plain, -0.99, 0.99)), \
        "fused out_clip diverges from staged clip on hardware"
    return {"fused_clip_exact": True}


def check_conv_pair() -> dict:
    """The zero-staging pair path (AGC apply emits the bf16 hi/lo pair,
    `fir_td_mxu_pair` consumes it with the pair-carried tail) vs the staged
    path on the compiled lowering, through the full pipeline across carried
    blocks.  On the MXU the padded band changes the K-dimension tiling, so
    f32 accumulation order differs by ~1 ulp (interpret mode is bit-exact,
    tests/test_agc_dither.py); the bound here is ulp-scale, far below the
    −90 dB contract."""
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    cfg = StreamConfig(
        samplerate=44100, blocksize=2048, upsample_factor=2, numtaps=129,
        batch=1024, eq_enabled=True, agc_enabled=True, agc_mode="exact",
        agc_window_size=512, agc_carry=True, dither_kind="off",
        downsample_mode="decimate", output_clip=0.99, conv_strategy="td_mxu",
    )
    rng = np.random.default_rng(6)
    sig = (rng.standard_normal((3, 1024, 2048)) * 0.1).astype(np.float32)

    p = Pipeline(cfg)
    assert p._conv_pair, ("pair mode must engage (TPU; flow mode forces it "
                          "via AFP_AGC_FUSED_FORCE)")
    params = p.device_params(PipelineParams.design(p.cfg))
    st = p.init_state()
    assert isinstance(st.conv_tail, tuple)
    pair_out = []
    for b in sig:
        st, y = p.step(params, st, jnp.asarray(b))
        pair_out.append(np.asarray(y))

    p._conv_pair = False  # force the staged path on the same Pipeline
    st = p.init_state()
    assert not isinstance(st.conv_tail, tuple)
    worst = 0.0
    for i, b in enumerate(sig):
        st, y = p.step(params, st, jnp.asarray(b))
        d = float(np.max(np.abs(np.asarray(y) - pair_out[i])))
        worst = max(worst, d)
        assert d < 1e-6, f"pair vs staged diverge at block {i}: {d}"
    return {"conv_pair_max_abs_diff": worst}


def check_agc_fused() -> dict:
    """The fused RMS front half and the fused scan+apply back half vs the
    staged float64 oracle, through realistic C8-like shapes."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.agc_rms import band_is_exact_bf16, rms_desired_pallas
    from afp_tpu.ops.pallas.agc_scan import smooth_gain_apply_pallas
    from afp_tpu.ops.pallas.fir_td import band_matrix

    rng = np.random.default_rng(5)
    results = {}
    for W, B, T in ((512, 4096, 2048), (500, 1024, 1024)):
        x = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
        band = band_matrix(np.full(W, 1.0 / W, dtype=np.float32))
        lp, rp = W // 2, W - 1 - W // 2
        # float64 oracle of the reference front half
        sq = (x.astype(np.float64)) ** 2
        box = np.full(W, 1.0 / W)
        rms = np.stack([np.sqrt(np.maximum(
            np.convolve(r, box, "same"), 0.0)) for r in sq])
        gold_d = np.clip(0.1 / (rms + 1e-10), 0.0, 10.0)
        d = np.asarray(rms_desired_pallas(
            jnp.asarray(x), jnp.asarray(band), lp, rp, 0.1, 10.0,
            exact_band=band_is_exact_bf16(band), transposed=True,
            interpret=INTERPRET))
        e = db(np.max(np.abs(d.T - gold_d)), np.max(np.abs(gold_d)))
        results[f"agc_rms_fused_w{W}"] = round(e, 1)
        assert e < -90, f"agc_rms_fused_w{W}: {e:.1f} dB"
        # back half on the oracle's d (isolates the kernel)
        a_att, a_rel = 0.15, 0.013
        g = gold_d[:, 0].copy()
        g64 = np.empty_like(gold_d)
        for t in range(T):
            dt = gold_d[:, t]
            alpha = np.where(dt > g, a_att, a_rel)
            g = alpha * dt + (1.0 - alpha) * g
            g64[:, t] = g
        g64 = np.clip(g64, 0.1, 10.0)
        y_gold = np.clip(x * g64, -0.99, 0.99)
        y, gl = smooth_gain_apply_pallas(
            jnp.asarray(gold_d.astype(np.float32).T), jnp.asarray(x),
            a_att, a_rel, 10.0, out_clip=0.99, interpret=INTERPRET)
        ey = db(np.max(np.abs(np.asarray(y) - y_gold)),
                np.max(np.abs(y_gold)) + 1e-300)
        eg = float(np.max(np.abs(np.asarray(gl) - g64[:, -1])))
        results[f"agc_apply_fused_w{W}"] = round(ey, 1)
        assert ey < -100 and eg < 1e-5, f"apply {ey:.1f} dB / carry {eg}"
    return results


def check_agc_one_kernel() -> dict:
    """The opt-in single-kernel AGC (`agc_fused.agc_rms_apply_pallas`,
    AFP_AGC_ONE_KERNEL=1 — measured throughput-negative but the tighter-
    accuracy option) on the compiled lowering: whole chain vs a float64
    oracle at the C8 shape, pair emit ≡ split of the f32 form, and the
    serving-ring form bit-exact against the staged form."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.agc_fused import agc_rms_apply_pallas
    from afp_tpu.ops.pallas.fir_td import split_bf16

    rng = np.random.default_rng(11)
    W, B, T = 512, 4096, 2048
    x = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    x[0, : T // 2] = 0.95   # loud-then-quiet: stresses window locality
    x[0, T // 2:] = 1e-4
    a_att, a_rel = 0.15, 0.013
    # float64 oracle of the full chain (per-block restart)
    sq = x.astype(np.float64) ** 2
    box = np.full(W, 1.0 / W)
    rms = np.stack([np.sqrt(np.maximum(
        np.convolve(r, box, "same"), 0.0)) for r in sq])
    d64 = np.clip(0.1 / (rms + 1e-10), 0.0, 10.0)
    g = d64[:, 0].copy()
    g64 = np.empty_like(d64)
    for t in range(T):
        dt = d64[:, t]
        alpha = np.where(dt > g, a_att, a_rel)
        g = alpha * dt + (1.0 - alpha) * g
        g64[:, t] = g
    g64 = np.clip(g64, 0.1, 10.0)
    y64 = np.clip(x * g64, -0.99, 0.99)

    y, gl = agc_rms_apply_pallas(jnp.asarray(x), W, a_att, a_rel, 0.1,
                                 10.0, init=None, out_clip=0.99,
                                 interpret=INTERPRET)
    e = db(np.max(np.abs(np.asarray(y) - y64)), np.max(np.abs(y64)))
    assert e < -100, f"agc_one_kernel vs f64: {e:.1f} dB"
    eg = float(np.max(np.abs(np.asarray(gl) - g64[:, -1])))
    assert eg < 1e-4, f"carry {eg}"

    # pair emit ≡ split_bf16 of the f32 output (on the compiled lowering)
    (yh, yl), gl2 = agc_rms_apply_pallas(jnp.asarray(x), W, a_att, a_rel,
                                         0.1, 10.0, init=None,
                                         out_clip=0.99, emit_split=True,
                                         interpret=INTERPRET)
    gh, glo = split_bf16(y)
    assert np.array_equal(np.asarray(yh), np.asarray(gh))
    assert np.array_equal(np.asarray(yl), np.asarray(glo))
    assert np.array_equal(np.asarray(gl2), np.asarray(gl))

    # serving-ring form bit-exact vs staged (slot-select BlockSpec only)
    ring = jnp.stack([jnp.asarray(x)] * 2)
    (rh, rl), rgl = agc_rms_apply_pallas(ring, W, a_att, a_rel, 0.1, 10.0,
                                         init=None, out_clip=0.99,
                                         emit_split=True, ring_idx=1,
                                         interpret=INTERPRET)
    assert np.array_equal(np.asarray(rh), np.asarray(yh))
    assert np.array_equal(np.asarray(rl), np.asarray(yl))
    assert np.array_equal(np.asarray(rgl), np.asarray(gl))
    return {"agc_one_kernel_vs_f64": round(e, 1)}


def check_serving_ring() -> dict:
    """The zero-copy serving rings (scalar-prefetch slot select, aliased
    output ring, kernel-emitted tail carry) vs per-block ``step()`` on the
    compiled lowering — BOTH ring forms: pair ingest and the fused AGC
    chain.  Bit-exact is required: ring and staged paths share the same
    kernel bodies and the same per-step key fold.  The f32 conv ring
    (kernel splits bf16 in VMEM) is additionally held to the staged f32
    steps — the split must commute with concat/slicing on the compiled
    lowering, not just in interpret mode."""
    import dataclasses

    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
    from afp_tpu.ops.pallas.fir_td import split_bf16

    rng = np.random.default_rng(8)
    K, B, T = 3, 1024, 2048
    sig = (rng.standard_normal((K, B, T)) * 0.1).astype(np.float32)
    results = {}

    cfg = StreamConfig(
        samplerate=44100, blocksize=T, upsample_factor=2, numtaps=129,
        batch=B, eq_enabled=True, output_clip=0.99,
        # flow mode: the in-kernel dither/quantize stores are pltpu-PRNG-
        # backed (no CPU interpret lowering) — run the same legs dither-off
        dither_kind="off" if FLOW else "tpdf",
        downsample_mode="decimate", conv_strategy="td_mxu", ingest="pair",
    )
    p = Pipeline(cfg)
    assert p.supports_ring_step and p._pair_ingest
    params = p.device_params(PipelineParams.design(p.cfg))
    rh, rl = split_bf16(jnp.asarray(sig))
    st = p.init_state(seed=4)
    gold = []
    for i in range(K):
        st, y = p.step(params, st, (rh[i], rl[i]))
        gold.append(np.asarray(y))
    ring = jnp.zeros((K, B, T), jnp.float32)
    st2, ring = p.run_ring(params, p.init_state(seed=4), rh, rl, ring, K)
    d = float(np.max(np.abs(np.asarray(ring) - np.stack(gold))))
    assert d == 0.0, f"pair serving ring vs staged steps diverge: {d}"
    # BOTH pair-tail halves — a lowering bug corrupting only the low-order
    # bf16 half would leave the hi tail identical
    for k in (0, 1):
        assert np.array_equal(np.asarray(st.conv_tail[k]),
                              np.asarray(st2.conv_tail[k])), (
            f"emitted tail carry diverges (half {k})")
    results["serving_ring_pair_max_abs_diff"] = d

    # one-launch megakernel form (dithered — the TPU-only fused epilogue)
    ring = jnp.zeros((K, B, T), jnp.float32)
    st3, ring = p.run_ring_mega(params, p.init_state(seed=4), rh, rl, ring, K)
    d = float(np.max(np.abs(np.asarray(ring) - np.stack(gold))))
    assert d == 0.0, f"mega serving ring vs staged steps diverge: {d}"
    for k in (0, 1):
        assert np.array_equal(np.asarray(st3.conv_tail[k]),
                              np.asarray(st.conv_tail[k])), (
            f"mega tail carry diverges (half {k})")
    results["serving_ring_mega_max_abs_diff"] = d

    # f32 conv ring (single raw-f32 ring, in-VMEM bf16 split).  Numerics
    # contract (fir_td.py:_fir_kernel_b3t_f32): BIT-exact vs the staged
    # PAIR path (same padded-band kernel geometry; the in-VMEM split is
    # measured bit-identical to split_bf16, and the tile pickers agree at
    # this shape so the fused-dither noise↔row mapping matches too);
    # ≤ −110 dB of the block peak vs the staged f32 path (the k_pad band
    # pad changes the dot's K extent and the MXU regroups the fp32
    # accumulation — same documented effect as the conv-pair path).
    fcfg = dataclasses.replace(cfg, ingest="f32")
    pf = Pipeline(fcfg)
    assert pf.supports_ring_step and not pf._pair_ingest
    fparams = pf.device_params(PipelineParams.design(pf.cfg))
    # gold A (bit-exact): staged pair steps — `gold` from the pair block
    # above IS that sequence (same params/seed/signal)
    pair_gold = np.stack(gold)
    # gold B (ulp bound): staged f32 steps
    st = pf.init_state(seed=4)
    f32_gold = []
    for i in range(K):
        st, y = pf.step(fparams, st, jnp.asarray(sig[i]))
        f32_gold.append(np.asarray(y))
    f32_gold = np.stack(f32_gold)
    n_tail = np.asarray(st.conv_tail).shape[-1]
    bound = float(np.max(np.abs(f32_gold))) * 10 ** (-110 / 20)
    for name, dispatch in (("f32", pf.run_ring), ("f32_mega",
                                                  pf.run_ring_mega)):
        ring = jnp.zeros((K, B, T), jnp.float32)
        st2, ring = dispatch(fparams, pf.init_state(seed=4),
                             jnp.asarray(sig), None, ring, K)
        r = np.asarray(ring)
        d = float(np.max(np.abs(r - pair_gold)))
        assert d == 0.0, (
            f"{name} serving ring vs staged PAIR steps diverge: {d}")
        d32 = float(np.max(np.abs(r - f32_gold)))
        assert d32 <= bound, (
            f"{name} ring vs staged f32 steps {d32:.3e} exceeds the "
            f"−110 dB accumulation-order bound {bound:.3e}")
        assert np.array_equal(np.asarray(st2.conv_tail)[:, -n_tail:],
                              np.asarray(st.conv_tail)), (
            f"{name} ring tail carry diverges")
        results[f"serving_ring_{name}_vs_pair_max_abs_diff"] = d
        results[f"serving_ring_{name}_vs_staged_f32_db"] = float(round(
            20 * np.log10(d32 / float(np.max(np.abs(f32_gold)))
                          + 1e-300), 1))

    # pcm16 conv ring (raw int16 ring, in-kernel convert n/32768 + split).
    # Exactness contract (fir_td.py:_load_f32): for 16-bit data the
    # conversion AND the bf16 split are exact, so the kernel's operands are
    # bit-identical to the f32 ring's fed the same n/32768 floats — outputs
    # must be BIT-exact vs that f32 ring on the compiled lowering, and the
    # emitted int16 tail must be the raw input history.
    icfg = dataclasses.replace(cfg, ingest="pcm16")
    pi = Pipeline(icfg)
    assert pi.supports_ring_step and pi._i16_ingest
    iparams = pi.device_params(PipelineParams.design(pi.cfg))
    i_sig = np.clip(np.round(sig * 32768.0), -32768, 32767).astype(np.int16)
    f_sig = i_sig.astype(np.float32) / np.float32(32768.0)
    fgold = {}
    for name, dispatch in (("f32", pf.run_ring), ("f32_mega",
                                                  pf.run_ring_mega)):
        ring = jnp.zeros((K, B, T), jnp.float32)
        _, ring = dispatch(fparams, pf.init_state(seed=4),
                           jnp.asarray(f_sig), None, ring, K)
        fgold[name] = np.asarray(ring)
    for name, dispatch in (("pcm16", pi.run_ring), ("pcm16_mega",
                                                    pi.run_ring_mega)):
        ring = jnp.zeros((K, B, T), jnp.float32)
        st2, ring = dispatch(iparams, pi.init_state(seed=4),
                             jnp.asarray(i_sig), None, ring, K)
        gold16 = fgold["f32" if name == "pcm16" else "f32_mega"]
        d = float(np.max(np.abs(np.asarray(ring) - gold16)))
        assert d == 0.0, (
            f"{name} ring vs f32 ring on the same n/32768 floats "
            f"diverges: {d} (the exact-convert contract broke)")
        tail = np.asarray(st2.conv_tail)
        assert tail.dtype == np.int16, tail.dtype
        assert np.array_equal(tail, i_sig[-1][:, -tail.shape[-1]:]), (
            f"{name} int16 tail is not the raw input history")
        results[f"serving_ring_{name}_vs_f32_ring_max_abs_diff"] = d

    acfg = dataclasses.replace(
        cfg, ingest="f32", agc_enabled=True, agc_mode="exact",
        agc_window_size=512, agc_carry=True,
    )
    pa = Pipeline(acfg)
    assert pa.supports_ring_step and not pa._pair_ingest, (
        "fused AGC chain must engage at the C8 shape (TPU, or flow mode's "
        "AFP_AGC_FUSED_FORCE)")
    aparams = pa.device_params(PipelineParams.design(pa.cfg))
    st = pa.init_state(seed=4)
    gold = []
    for i in range(K):
        st, y = pa.step(aparams, st, jnp.asarray(sig[i]))
        gold.append(np.asarray(y))
    ring = jnp.zeros((K, B, T), jnp.float32)
    st2, ring = pa.run_ring(aparams, pa.init_state(seed=4),
                            jnp.asarray(sig), None, ring, K)
    d = float(np.max(np.abs(np.asarray(ring) - np.stack(gold))))
    assert d == 0.0, f"AGC serving ring vs staged steps diverge: {d}"
    ga, gb = np.asarray(st.agc_gain), np.asarray(st2.agc_gain)
    assert np.array_equal(ga, gb), "AGC gain carry diverges in ring mode"
    results["serving_ring_agc_max_abs_diff"] = d

    # pcm16 AGC chain (raw int16 ring through RMS → scan+apply → conv):
    # the in-VMEM convert is exact, so the compiled lowering must be
    # BIT-identical to the f32 AGC ring fed the same n/32768 floats —
    # output ring, gain carry, and the pair conv tail.
    a16 = dataclasses.replace(acfg, ingest="pcm16")
    p16 = Pipeline(a16)
    assert p16.supports_ring_step and p16._i16_agc_raw, (
        "pcm16 fused AGC chain must engage on TPU at the C8 shape")
    params16 = p16.device_params(PipelineParams.design(p16.cfg))
    ai_sig = np.clip(np.round(sig * 32768.0), -32768, 32767).astype(np.int16)
    af_sig = ai_sig.astype(np.float32) / np.float32(32768.0)
    ring_f = jnp.zeros((K, B, T), jnp.float32)
    stf, ring_f = pa.run_ring(aparams, pa.init_state(seed=4),
                              jnp.asarray(af_sig), None, ring_f, K)
    ring_i = jnp.zeros((K, B, T), jnp.float32)
    sti, ring_i = p16.run_ring(params16, p16.init_state(seed=4),
                               jnp.asarray(ai_sig), None, ring_i, K)
    d = float(np.max(np.abs(np.asarray(ring_i) - np.asarray(ring_f))))
    assert d == 0.0, (
        f"pcm16 AGC ring vs f32 AGC ring on the same n/32768 floats "
        f"diverges: {d} (the exact-convert contract broke)")
    assert np.array_equal(np.asarray(sti.agc_gain),
                          np.asarray(stf.agc_gain)), (
        "pcm16 AGC gain carry diverges from the f32 chain")
    for k in (0, 1):
        assert np.array_equal(np.asarray(sti.conv_tail[k]),
                              np.asarray(stf.conv_tail[k])), (
            "pcm16 AGC pair tail diverges from the f32 chain")
    results["serving_ring_agc_pcm16_vs_f32_max_abs_diff"] = d

    # emit='pcm16' (int16 output rings): the in-kernel dither+quantize
    # store must be BIT-identical to quantizing the f32 ring's dithered
    # output on the host-visible side (same key walk → same noise; same
    # round-half-even quantizer — fir_td.quantize_pcm16).  Certified on
    # the compiled lowering for the conv ring, the megakernel, and the
    # full int16-I/O AGC chain (pcm16 in + pcm16 out).
    from afp_tpu.ops.pallas.fir_td import quantize_pcm16

    # ingest='f32': these legs drive a SINGLE f32 ring (`sig, None`), which
    # a pair-ingest pipeline rejects at trace time (ring form mismatch)
    ecfg = dataclasses.replace(cfg, ingest="f32", emit="pcm16",
                               dither_bits=16)
    fcfg16 = dataclasses.replace(cfg, ingest="f32", dither_bits=16)
    pe, pf16 = Pipeline(ecfg), Pipeline(fcfg16)
    assert pe._emit16 and pe.supports_ring_step
    eparams = pe.device_params(PipelineParams.design(pe.cfg))
    fparams16 = pf16.device_params(PipelineParams.design(pf16.cfg))
    for name, disp_e, disp_f in (
            ("conv", pe.run_ring, pf16.run_ring),
            ("conv_mega", pe.run_ring_mega, pf16.run_ring_mega)):
        ring_i = jnp.zeros((K, B, T), jnp.int16)
        _, ring_i = disp_e(eparams, pe.init_state(seed=4),
                           jnp.asarray(sig), None, ring_i, K)
        ring_f = jnp.zeros((K, B, T), jnp.float32)
        _, ring_f = disp_f(fparams16, pf16.init_state(seed=4),
                           jnp.asarray(sig), None, ring_f, K)
        exp = np.asarray(quantize_pcm16(ring_f))
        d = float(np.max(np.abs(np.asarray(ring_i).astype(np.int64)
                                - exp.astype(np.int64))))
        assert d == 0.0, (
            f"emit16 {name} ring vs quantize(f32 ring) diverges: {d} LSB")
        results[f"emit16_{name}_vs_quantized_f32_max_lsb"] = d
    # full int16 transport: pcm16 in + pcm16 out through the AGC chain
    e16 = dataclasses.replace(acfg, ingest="pcm16", emit="pcm16",
                              dither_bits=16)
    a16f = dataclasses.replace(acfg, dither_bits=16)
    pei, paf = Pipeline(e16), Pipeline(a16f)
    assert pei._i16_agc_raw and pei._emit16 and pei.supports_ring_step
    peiparams = pei.device_params(PipelineParams.design(pei.cfg))
    pafparams = paf.device_params(PipelineParams.design(paf.cfg))
    ring_i = jnp.zeros((K, B, T), jnp.int16)
    sti, ring_i = pei.run_ring(peiparams, pei.init_state(seed=4),
                               jnp.asarray(ai_sig), None, ring_i, K)
    ring_f = jnp.zeros((K, B, T), jnp.float32)
    stf, ring_f = paf.run_ring(pafparams, paf.init_state(seed=4),
                               jnp.asarray(af_sig), None, ring_f, K)
    exp = np.asarray(quantize_pcm16(ring_f))
    d = float(np.max(np.abs(np.asarray(ring_i).astype(np.int64)
                            - exp.astype(np.int64))))
    assert d == 0.0, (
        f"int16-I/O AGC chain vs quantize(f32 chain) diverges: {d} LSB")
    assert np.array_equal(np.asarray(sti.agc_gain), np.asarray(stf.agc_gain))
    results["emit16_agc_i16io_vs_quantized_f32_max_lsb"] = d
    return results


def _fold_bound(int16: bool) -> float:
    """Hardware claim: bit-exact.  Flow mode: the documented interpret-GEMM
    reassociation bound (tests/test_fold.py:CPU_ATOL; ±1 LSB for int16)."""
    if not FLOW:
        return 0.0
    return 1.0 if int16 else 1e-5


def check_agc_fast_means() -> dict:
    """r5 fast-mode chunk-mean d path on the compiled lowering:
    `rms_desired_pallas(mean_chunk=32)` ≡ the chunk means of the full
    per-sample d, and the fast PIPELINE serving ring ≡ the staged fused
    step bit-for-bit with the means path engaged (`Pipeline._agc_means`)."""
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
    from afp_tpu.ops.pallas.agc_rms import (band_is_exact_bf16,
                                            rms_desired_pallas)
    from afp_tpu.ops.pallas.fir_td import band_matrix

    rng = np.random.default_rng(9)
    results = {}
    W, B, T = 512, 1024, 2048
    x = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    band = band_matrix(np.full(W, 1.0 / W, dtype=np.float32))
    lp, rp = W // 2, W - 1 - W // 2
    kw = dict(exact_band=band_is_exact_bf16(band), transposed=True,
              interpret=INTERPRET)
    d = np.asarray(rms_desired_pallas(
        jnp.asarray(x), jnp.asarray(band), lp, rp, 0.1, 10.0, **kw))
    dm = np.asarray(rms_desired_pallas(
        jnp.asarray(x), jnp.asarray(band), lp, rp, 0.1, 10.0,
        mean_chunk=32, **kw))
    ref = d.reshape(T // 32, 32, B).mean(axis=1)
    e = db(np.max(np.abs(dm - ref)), np.max(np.abs(ref)) + 1e-300)
    results["agc_means_rms_db"] = round(e, 1)
    assert e < -110, f"mean emission diverged: {e:.1f} dB"

    cfg = StreamConfig(
        samplerate=44100, blocksize=T, upsample_factor=2, numtaps=129,
        batch=B, eq_enabled=True, agc_enabled=True, agc_mode="fast",
        agc_window_size=W, agc_carry=True,
        dither_kind="off" if FLOW else "tpdf", output_clip=0.99,
        downsample_mode="decimate", conv_strategy="td_mxu")
    pipe = Pipeline(cfg)
    assert pipe._agc_means and pipe.supports_ring_step
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    sig = (rng.standard_normal((3, B, T)) * 0.1).astype(np.float32)
    st = pipe.init_state(seed=2)
    refs = []
    for b in sig:
        st, y = pipe.step(params, st, jnp.asarray(b))
        refs.append(np.asarray(y))
    st2 = pipe.init_state(seed=2)
    st2, org = pipe.run_ring(params, st2, jnp.asarray(sig), None,
                             jnp.zeros(sig.shape, jnp.float32), 3)
    org = np.asarray(org)
    for i in range(3):
        assert np.array_equal(org[i], refs[i]), f"fast ring != staged @ {i}"
    results["agc_means_ring_bitexact"] = True
    return results


def check_banked_resident() -> dict:
    """r5 resident-bank banked serving ring (whole-stack constant-index
    fetch + in-kernel dynamic design select) bit-identical to the per-tile
    BlockSpec selection on the compiled lowering, f32 and pcm16 rings."""
    import os

    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, StreamConfig
    from afp_tpu.engine.batch import with_per_stream_filters

    rng = np.random.default_rng(10)
    B, T = 256, 2048
    blocks = (rng.standard_normal((2, B, T)) * 0.2).astype(np.float32)
    results = {}
    prev = os.environ.get("AFP_BANKED_RESIDENT")
    try:
        for ingest, blk in (("f32", blocks),
                            ("pcm16", np.clip(np.round(blocks * 32768.0),
                                              -32768, 32767
                                              ).astype(np.int16))):
            outs = {}
            for mode in ("0", "1"):
                os.environ["AFP_BANKED_RESIDENT"] = mode
                cfg = StreamConfig(
                    samplerate=44100, blocksize=T, upsample_factor=2,
                    numtaps=129, batch=B, eq_enabled=False,
                    agc_enabled=False,
                    dither_kind="off" if FLOW else "tpdf",
                    output_clip=0.99, downsample_mode="decimate",
                    conv_strategy="td_mxu", ingest=ingest)
                pipe = Pipeline(cfg)
                bank = with_per_stream_filters(
                    pipe, [dict(cutoff=4000.0 if i < B // 2 else 12000.0)
                           for i in range(B)])
                st = pipe.init_state(seed=1)
                st, org = pipe.run_ring(
                    bank, st, jnp.asarray(blk), None,
                    jnp.zeros(blocks.shape, jnp.float32), 2)
                outs[mode] = np.asarray(org)
            assert np.array_equal(outs["0"], outs["1"]), (
                f"resident != per-tile ({ingest})")
            results[f"banked_resident_bitexact_{ingest}"] = True
    finally:
        if prev is None:
            os.environ.pop("AFP_BANKED_RESIDENT", None)
        else:
            os.environ["AFP_BANKED_RESIDENT"] = prev
    return results


def check_per_stream_agc() -> dict:
    """r5 [B]-vector AGC policy banks on the compiled lowering: the vector
    run must match per-policy scalar runs row-for-row (exact mode; ulp
    tolerance for the vector-operand lowering)."""
    import dataclasses

    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
    from afp_tpu.engine.batch import with_per_stream_agc

    rng = np.random.default_rng(11)
    B, T, W = 1024, 2048, 512
    cfg = StreamConfig(
        samplerate=44100, blocksize=T, upsample_factor=2, numtaps=129,
        batch=B, eq_enabled=True, agc_enabled=True, agc_mode="exact",
        agc_window_size=W, agc_carry=True,
        dither_kind="off" if FLOW else "tpdf", output_clip=0.99,
        downsample_mode="decimate", conv_strategy="td_mxu")
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    h = B // 2
    pol = ((0.1, 10.0, 0.01, 0.1), (0.3, 4.0, 0.05, 0.2))
    vp = with_per_stream_agc(
        pipe, params,
        target_level=np.r_[np.full(h, pol[0][0]), np.full(h, pol[1][0])],
        max_gain=np.r_[np.full(h, pol[0][1]), np.full(h, pol[1][1])],
        attack=np.r_[np.full(h, pol[0][2]), np.full(h, pol[1][2])],
        release=np.r_[np.full(h, pol[0][3]), np.full(h, pol[1][3])])
    sig = (rng.standard_normal((2, B, T)) * 0.1).astype(np.float32)
    st = pipe.init_state(seed=3)
    outs = []
    for b in sig:
        st, y = pipe.step(vp, st, jnp.asarray(b))
        outs.append(np.asarray(y))
    results = {}
    worst = -np.inf
    for k, (tg, mg, at, rl) in enumerate(pol):
        rows = slice(0, h) if k == 0 else slice(h, B)
        cfg_k = dataclasses.replace(
            cfg, agc_target_level=tg, agc_max_gain=mg, agc_attack=at,
            agc_release=rl).validate()
        p2 = Pipeline(cfg_k)
        pp2 = p2.device_params(PipelineParams.design(p2.cfg))
        st2 = p2.init_state(seed=3)
        for i, b in enumerate(sig):
            st2, g = p2.step(pp2, st2, jnp.asarray(b))
            dmax = np.max(np.abs(outs[i][rows] - np.asarray(g)[rows]))
            peak = np.max(np.abs(np.asarray(g)[rows])) + 1e-300
            worst = max(worst, db(dmax, peak))
    # bit-exact runs give -inf; clamp so the JSON stays parseable
    results["per_stream_agc_vs_scalar_db"] = round(max(float(worst),
                                                       -999.0), 1)
    assert worst < -120, f"vector AGC diverged: {worst:.1f} dB"
    return results


def check_offline_fold() -> dict:
    """The offline time-folded fast path vs the streaming scan on the
    compiled lowering.  The bit-exact claim rests on a HARDWARE property —
    the MXU's per-output K accumulation is batch-size-independent (the
    fold runs the same per-row windows at a different batch tile) — so it
    must be certified here, not in interpret mode (where host GEMM
    blocking reassociates at ~1e-7; tests/test_fold.py documents that)."""
    import dataclasses

    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    rng = np.random.default_rng(12)
    B, nb, L = 1, 8, 2048
    results = {}
    base = StreamConfig(
        samplerate=44100, blocksize=L, upsample_factor=2, numtaps=129,
        batch=B, eq_enabled=True, dither_kind="off", output_clip=0.99,
        downsample_mode="decimate", conv_strategy="td_mxu",
    )
    sig = (rng.standard_normal((B, nb * L)) * 0.3).astype(np.float32)
    sig_i = np.clip(np.round(sig * 32768.0), -32768, 32767).astype(np.int16)
    for name, cfg, x in (
            ("f32", base, sig),
            ("pair", dataclasses.replace(base, ingest="pair"), sig),
            ("pcm16", dataclasses.replace(base, ingest="pcm16"), sig_i),
            ("i16io", dataclasses.replace(base, ingest="pcm16",
                                          emit="pcm16"), sig_i)):
        p = Pipeline(cfg)
        assert p.supports_fold
        params = p.device_params(PipelineParams.design(p.cfg))
        _, y_scan = p.process_signal(params, p.init_state(0), x, fold=False)
        st_f, y_fold = p.process_signal(params, p.init_state(0), x,
                                        fold=True)
        a, b = np.asarray(y_scan), np.asarray(y_fold)
        is_i16 = a.dtype == np.int16
        if is_i16:
            d = float(np.max(np.abs(a.astype(np.int64) - b.astype(np.int64))))
        else:
            d = float(np.max(np.abs(a - b)))
        assert d <= _fold_bound(is_i16), (
            f"offline fold ({name}) vs scan diverges: {d}")
        results[f"offline_fold_{name}_max_abs_diff"] = d

    # per-stream gain banks: the wide-dot kernel's folded-batch lowering is
    # NOT bit-exact vs the scan at every cascade length (measured 7.9e-7 at
    # the r4 'hq' default, n_casc=209; bit-exact at the r3 'fast' length) —
    # so fold='auto' EXCLUDES per-stream banks (Pipeline._fold_decision)
    # and the explicit fold=True path is certified here at the documented
    # ≤ 2e-6 class bound instead
    from afp_tpu.engine.batch import with_per_stream_gains

    B2 = 2
    sig2 = (rng.standard_normal((B2, nb * L)) * 0.3).astype(np.float32)
    for name, cfg in (
            ("ps_f32", dataclasses.replace(base, batch=B2)),
            ("ps_pair", dataclasses.replace(base, batch=B2,
                                            ingest="pair"))):
        p = Pipeline(cfg)
        assert p.supports_fold
        params = p.device_params(PipelineParams.design(p.cfg))
        gains = np.ones((B2, params.eq_gains.shape[-1]), np.float32)
        gains[1] *= 0.5
        params = with_per_stream_gains(p, params, gains)
        # the auto gate must scan for per-stream banks (semantics contract)
        assert not p._fold_decision("auto", params), (
            f"fold='auto' must exclude per-stream banks ({name})")
        _, y_scan = p.process_signal(params, p.init_state(0), sig2,
                                     fold=False)
        _, y_fold = p.process_signal(params, p.init_state(0), sig2,
                                     fold=True)
        d = float(np.max(np.abs(np.asarray(y_scan) - np.asarray(y_fold))))
        assert d <= 2e-6, (
            f"offline fold ({name}) vs scan exceeds the class bound: {d}")
        results[f"offline_fold_{name}_max_abs_diff"] = d
    return results


def main() -> None:
    import threading

    import jax

    watchdog = None
    pin = os.environ.get("JAX_PLATFORMS", "").lower()
    if FLOW:
        # flow mode is a CPU-backend wiring rehearsal — never touch the
        # (possibly wedged) tunnel; pin before the first backend init
        jax.config.update("jax_platforms", "cpu")
    elif "cpu" in pin.split(","):
        # honor an explicit CPU pin (any spelling JAX itself accepts:
        # 'cpu', 'CPU', 'cpu,tpu') before the first backend init — the axon
        # plugin overrides the env var during discovery, and a wedged tunnel
        # would hang the guard check below instead of exiting cleanly
        jax.config.update("jax_platforms", "cpu")
    else:
        # first device contact can block forever inside backend init on a
        # wedged tunnel (GIL released — SIGALRM handlers never run); a
        # daemon thread still gets scheduled and fails the sweep with the
        # JSON contract instead of hanging (same guard as bench.py)
        seconds = int(os.environ.get("AFP_HW_CONTACT_TIMEOUT", "120"))

        def fire():
            print(json.dumps({
                "ok": False,
                "error": f"device contact timed out after {seconds}s "
                         "(tunnel unreachable)"}), flush=True)
            os._exit(3)

        watchdog = threading.Timer(seconds, fire)
        watchdog.daemon = True
        watchdog.start()
    dev = jax.devices()[0]
    if watchdog is not None:
        watchdog.cancel()
    if not FLOW and dev.platform != "tpu":
        print(json.dumps({"ok": False,
                          "error": f"needs a real TPU, got {dev.platform} "
                                   "(AFP_HW_CHECK_CPU_FLOW=1 for the "
                                   "CPU wiring rehearsal)"}))
        sys.exit(2)
    out = {"device": str(dev), "ok": True}
    checks = [check_fir_td, check_fir_per_stream, check_agc_scan,
              check_dither, check_fused_dither, check_fused_clip,
              check_agc_fused, check_agc_one_kernel, check_conv_pair,
              check_serving_ring, check_offline_fold,
              check_agc_fast_means, check_banked_resident,
              check_per_stream_agc]
    if FLOW:
        # pltpu PRNG has no CPU interpret lowering (tests/test_agc_dither.py)
        skipped = {check_dither, check_fused_dither}
        out["mode"] = "cpu_flow"
        out["skipped"] = sorted(f.__name__ for f in skipped)
        checks = [f for f in checks if f not in skipped]
    for fn in checks:
        print(f"hw_check: {fn.__name__}...", file=sys.stderr, flush=True)
        out.update(fn())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
