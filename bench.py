#!/usr/bin/env python
"""Benchmark harness: aggregate real-time factor on the headline config.

Headline metric (BASELINE.md north star): aggregate xRT — audio-seconds
processed per wall-second per chip — for the reference's baseline chain
(`/root/reference/stream_process.py:19-30` scaled up): 1001-tap lowpass FIR,
4× polyphase upsample @ 44.1 kHz, blocksize 4096, TPDF dither, batched over
concurrent streams on one chip.  The reference achieves xRT = 1.0 by
construction (one real-time mono stream on a pinned RPi5 core), so
``vs_baseline`` is the raw xRT number.

Beyond the headline, the harness also publishes (as extra keys on the same
JSON line):

* ``mfu`` — model FLOP utilization of the fused FIR (useful MACs vs the
  chip's bf16 peak); ``mfu_ring`` — the same for the best zero-copy
  serving-ring mode (max of ``sustained_pair_ring_xrt`` and the
  one-launch ``sustained_pair_ring_mega_xrt``); ``mfu_f32_ring`` — the
  same for the f32 conv ring (``sustained_f32_ring_*_xrt``: zero-copy
  serving under the reference's f32 input contract — the kernel splits
  bf16 in VMEM, so it is headline-eligible and takes the headline when
  it wins, under methodology name ``sustained_f32ring``),
* ``agc_*_xrt`` — the C8 engine (9-band EQ + AGC, the reference's most
  advanced runtime, `stream_process_AGC.py`) for each AGC execution mode
  ('parallel' associative-scan, 'exact' per-sample scan, 'fast' chunked) —
  the AGC recurrence is the acknowledged serial ceiling (SURVEY.md §7),
* ``agc_parallel_vs_exact_db`` — on-hardware consistency of the parallel
  solver against the per-sample recurrence.

The primary config's accuracy is ASSERTED (< −90 dB vs the float64 causal
oracle), not just reported: a precision regression (e.g. the bf16-rounding
trap found in round 1) fails the run over to the next strategy.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import os
import signal
import sys
import time

import numpy as np


class BenchTimeout(Exception):
    pass


class AccuracyError(Exception):
    pass


def _alarm(seconds: int, residual: int = 600):
    """Arm a SIGALRM watchdog raising :class:`BenchTimeout`.

    signal.alarm is one-shot; several mid-bench sections catch
    BenchTimeout to skip only their own metrics, which used to leave the
    rest of the run unbounded on the exact failure mode alarms exist for
    (a wedged tunnel).  The handler therefore re-arms a `residual`
    budget BEFORE raising, so every catch-and-continue still runs under
    a live watchdog; successful completion cancels via signal.alarm(0)."""
    def handler(signum, frame):
        if residual:
            signal.alarm(residual)
        raise BenchTimeout(f"stage exceeded {seconds}s")

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


#: bf16 matmul peak FLOP/s by device kind (MFU denominator)
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops() -> float:
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return 197e12  # assume v5e-class


def _time_runs(pipe, params, state, blocks, reps, chain: int = 1):
    """Best-of-`reps` steady-state wall time for `chain` back-to-back
    `pipe.run` dispatches (async-queued, one sync at the end — production
    dispatch pipelining; amortizes the ~26 ms tunnel RTT).

    A scalar fetch inside the timed region guarantees the device really
    finished (on tunneled devices block_until_ready alone can return early).
    """
    import jax.numpy as jnp

    state, out = pipe.run(params, state, blocks)  # warmup/compile
    float(jnp.sum(out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            state, out = pipe.run(params, state, blocks)
        checksum = float(jnp.sum(out))
        times.append(time.perf_counter() - t0)
    assert np.isfinite(checksum)
    return min(times), state


def _sustained_xrt(pipe, params, blocks, reps: int):
    """Sustained serving mode: ONE dispatch scans AFP_BENCH_SUSTAIN steps
    over the HBM-resident input ring, writing a bounded output ring in
    place (donated) — the shape of a long-running streaming server.  The
    chained-dispatch measurement pays ~26 ms of tunnel RTT per dispatch
    that a co-located production host does not; the device profile shows
    the chip idle ~40% of wall time there (BENCHMARKS.md)."""
    import functools
    import time as _time

    import jax
    import jax.numpy as jnp

    n_sust = int(os.environ.get("AFP_BENCH_SUSTAIN", "512"))
    if not n_sust:
        return None
    pair = isinstance(blocks, tuple)  # pair-ingest pipelines take (hi, lo)
    K, batch, blocksize = (blocks[0] if pair else blocks).shape

    # blocks passed as an ARGUMENT: closure capture would serialize the
    # multi-GB input ring as a lowering constant (and ship it through the
    # tunnel's compile RPC)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def sustained(state, ring, blk):
        def body(carry, i):
            st, rg = carry
            if pair:
                xb = tuple(jax.lax.dynamic_index_in_dim(
                    b, jnp.mod(i, K), keepdims=False) for b in blk)
            else:
                xb = jax.lax.dynamic_index_in_dim(
                    blk, jnp.mod(i, K), keepdims=False)
            st, y = pipe._step_impl(params, st, xb)
            rg = jax.lax.dynamic_update_index_in_dim(
                rg, y, jnp.mod(i, K), axis=0)
            return (st, rg), ()
        carry, _ = jax.lax.scan(body, (state, ring), jnp.arange(n_sust))
        return carry

    return _time_sustained("sustained",
                           lambda st, rg: sustained(st, rg, blocks),
                           pipe, n_sust, K, batch, blocksize, reps)


def _time_sustained(label, dispatch, pipe, n_sust, K, batch, blocksize,
                    reps: int):
    """Shared sustained-timing skeleton: warm (compile) dispatch, then
    time `max(2, reps-2)` repeats, each chained on a scalar checksum
    fetch (the tunnel's `block_until_ready` returns early — ROADMAP
    dev-env note 3); report best as aggregate xRT.

    `dispatch(state, out_ring) -> (state, out_ring)` — one device
    dispatch covering `n_sust` blocks."""
    import time as _time

    import jax.numpy as jnp

    st = pipe.init_state(seed=0)
    # emit='pcm16' pipelines serve into an int16 output ring (the checksum
    # fetch sums int16 → int32, still a real device→host scalar fetch)
    out_dtype = (jnp.int16 if getattr(pipe, "_emit16", False)
                 or getattr(getattr(pipe, "pipeline", None), "_emit16", False)
                 else jnp.float32)
    ring = jnp.zeros((K, batch, blocksize), out_dtype)
    st, ring = dispatch(st, ring)  # compile + warm
    float(jnp.sum(ring))
    times = []
    for _ in range(max(2, reps - 2)):
        t0 = _time.perf_counter()
        st, ring = dispatch(st, ring)
        checksum = float(jnp.sum(ring))
        times.append(_time.perf_counter() - t0)
    assert np.isfinite(checksum)
    sbest = min(times)
    xrt = float(round(
        n_sust * batch * blocksize / pipe.cfg.samplerate / sbest, 1))
    print(f"bench: {label} best={sbest:.4f}s ({n_sust} blocks/dispatch) "
          f"xrt={xrt:.0f}", file=sys.stderr, flush=True)
    return xrt


def _sustained_ring_xrt(pipe, params, pblocks, reps: int,
                        n_sust: int | None = None):
    """Zero-copy serving mode: like :func:`_sustained_xrt` in pair mode,
    but via `Pipeline._ring_step_impl` — the conv kernel reads slot i of
    the HBM-resident input ring directly (scalar-prefetch BlockSpec) and
    writes slot i of the donated output ring in place, so the per-step
    `dynamic_slice`/`dynamic_update_slice` staging copies disappear
    (~3 full-block HBM round trips per step at the headline shape)."""
    import time as _time

    import jax.numpy as jnp

    # AFP_BENCH_SUSTAIN=0 disables ALL sustained legs, including the
    # asymptote calls that pass n_sust explicitly
    if not int(os.environ.get("AFP_BENCH_SUSTAIN", "512")):
        return None
    if n_sust is None:
        n_sust = int(os.environ.get("AFP_BENCH_SUSTAIN", "512"))
    if not pipe.supports_ring_step:
        return None
    ring_hi, ring_lo = pblocks
    K, batch, blocksize = ring_hi.shape
    return _time_sustained(
        f"ring-mode[{n_sust}]",
        lambda st, rg: pipe.run_ring(params, st, ring_hi, ring_lo, rg,
                                     n_sust),
        pipe, n_sust, K, batch, blocksize, reps)


def _sustained_ring_mega_xrt(pipe, params, pblocks, reps: int,
                             n_sust: int | None = None):
    """One-launch serving megakernel (`Pipeline.run_ring_mega`): the whole
    n_sust-step dispatch inside a single Pallas kernel — no per-step
    launches, no lax.scan carries, no tail HBM round trips.  Same slot
    order, numerics, and dither folds as :func:`_sustained_ring_xrt`.
    Pair-ingest and f32-conv forms (pass ``(ring_f32, None)`` as
    `pblocks` for the latter); the fused AGC chain has no mega form."""
    import time as _time

    import jax.numpy as jnp

    if not int(os.environ.get("AFP_BENCH_SUSTAIN", "512")):
        return None  # =0 disables all sustained legs, asymptotes included
    if n_sust is None:
        n_sust = int(os.environ.get("AFP_BENCH_SUSTAIN", "512"))
    if not pipe.supports_ring_step or pipe.cfg.agc_enabled:
        return None
    ring_hi, ring_lo = pblocks
    K, batch, blocksize = ring_hi.shape
    return _time_sustained(
        f"ring-mega[{n_sust}]",
        lambda st, rg: pipe.run_ring_mega(params, st, ring_hi, ring_lo, rg,
                                          n_sust),
        pipe, n_sust, K, batch, blocksize, reps)


def _ring_mfu(pipe, batch: int, blocksize: int, *xrts) -> float | None:
    """Useful-MAC MFU of the best of several ring-mode xRT measurements
    (one shared formula — the four ring/asymptote call sites used to
    carry verbatim copies that could silently diverge)."""
    best = max((x or 0) for x in xrts) or None
    if best is None or not pipe.n_casc:
        return None
    per_block = batch * blocksize / pipe.cfg.samplerate / best
    return float(round(2.0 * batch * blocksize * pipe.n_casc
                       / per_block / _peak_flops(), 4))


def _ring_leg_suite(pipe, params, ring_blocks, reps: int, label: str) -> dict:
    """The standard zero-copy serving measurement set for ONE pipeline:
    default-step ring + megakernel + the 2048-step asymptote pair.  The
    base ring leg raises through to the caller's section guard (a broken
    ring mode skips the whole section, as before); every later leg is
    individually try-guarded so one failure never discards another leg's
    measurement.  The four former verbatim copies of this block had
    already diverged on exactly that (the i16io copy clobbered its own
    measured ring xrt).  Returns {ring, mega, asym, mega_asym} with None
    where a leg was skipped or failed."""
    out = {"ring": None, "mega": None, "asym": None, "mega_asym": None}
    out["ring"] = _sustained_ring_xrt(pipe, params, ring_blocks, reps)
    try:
        out["mega"] = _sustained_ring_mega_xrt(pipe, params, ring_blocks,
                                               reps)
    except Exception as e:  # noqa: BLE001
        print(f"bench: {label} ring-mega variant failed ({e})",
              file=sys.stderr, flush=True)
    n_asym = int(os.environ.get("AFP_BENCH_SUSTAIN_ASYMPTOTE", "2048"))
    if n_asym > int(os.environ.get("AFP_BENCH_SUSTAIN", "512")):
        try:
            out["asym"] = _sustained_ring_xrt(pipe, params, ring_blocks,
                                              reps, n_sust=n_asym)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {label} ring asymptote failed ({e})",
                  file=sys.stderr, flush=True)
        try:
            out["mega_asym"] = _sustained_ring_mega_xrt(
                pipe, params, ring_blocks, reps, n_sust=n_asym)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {label} ring-mega asymptote failed ({e})",
                  file=sys.stderr, flush=True)
    return out


def run_config(batch: int, nblocks: int, reps: int, strategy: str,
               precision: str) -> dict:
    import jax
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    os.environ["AFP_TD_PRECISION"] = precision
    import afp_tpu.ops.pallas.fir_td as fir_td

    fir_td.PRECISION_MODE = precision

    cfg = StreamConfig(
        samplerate=44100,
        blocksize=4096,
        upsample_factor=4,
        numtaps=1001,
        batch=batch,
        filter_type="lowpass",
        cutoff=11000.0,
        window_type="hamming",
        eq_enabled=False,  # the C5 baseline chain: upsample→FIR→decimate→dither
        agc_enabled=False,
        downsample_mode="decimate",
        dither_kind="tpdf",
        output_clip=None,
        conv_strategy=strategy,
        # C5 parity: the reference's baseline hot path runs soxr VHQ
        # (`stream_process.py:69-74`).  In the td_mxu geometry the upgrade
        # is ~free: the fused cascade grows 271→379 taps but k_pad (384)
        # and the banded-dot K extent (512 lanes) are UNCHANGED, so the
        # dense MXU work is identical — only band zeros become useful taps
        # (raising useful-MFU at ~constant wall time; see BENCHMARKS.md).
        resample_quality="vhq",
    )
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))

    key = jax.random.PRNGKey(0)
    blocks = jax.random.normal(
        key, (nblocks, batch, cfg.blocksize), dtype=jnp.float32
    ) * 0.3

    chain = int(os.environ.get("AFP_BENCH_CHAIN", "8"))
    print(f"bench: strategy={strategy}/{precision} batch={batch} compiling...",
          file=sys.stderr, flush=True)
    state = pipe.init_state(seed=0)
    best, _ = _time_runs(pipe, params, state, blocks, reps, chain=chain)
    print(f"bench: primary best={best:.4f}s ({chain} chained dispatches)",
          file=sys.stderr, flush=True)

    audio_seconds = chain * batch * nblocks * cfg.blocksize / cfg.samplerate
    xrt = audio_seconds / best

    # Sustained serving mode: ONE dispatch scans n_sust steps over the
    # HBM-resident input ring, writing a bounded output ring in place
    # (donated) — the shape of a long-running streaming server.  The
    # chained-dispatch number above includes ~26 ms of tunnel RTT per
    # dispatch that a co-located production host does not pay; the device
    # profile shows the chip idle ~40% of wall time there (BENCHMARKS.md).
    # Guarded: a sustained-mode failure (extra ~4.3 GB ring, fresh 512-step
    # scan compile) must not discard the valid chained measurement above.
    try:
        sustained_xrt = _sustained_xrt(pipe, params, blocks, reps)
    except Exception as e:  # noqa: BLE001
        print(f"bench: sustained mode failed ({e}); keeping chained",
              file=sys.stderr, flush=True)
        sustained_xrt = None

    # MFU: useful MACs of the fused single-rate cascade (n_casc taps per
    # output sample) vs the chip's native matmul peak — computed from the
    # best (sustained, if measured) throughput
    mfu = None
    if pipe.n_casc:
        flops_per_block = 2.0 * batch * cfg.blocksize * pipe.n_casc
        best_per_block = best / (nblocks * chain)
        if sustained_xrt is not None:
            sust_per_block = (
                batch * cfg.blocksize / cfg.samplerate) / sustained_xrt
            best_per_block = min(best_per_block, sust_per_block)
        mfu = float(round(flops_per_block / best_per_block / _peak_flops(), 4))

    # on-hardware accuracy: one stream, dither off, vs the float64 host
    # oracle of the causal chain (upfirdn cascade, phase-0 decimation).
    # ASSERTED — a silent precision regression must fail the strategy over.
    err_db = None
    if os.environ.get("AFP_BENCH_CHECK", "1") != "0":
        import dataclasses

        import scipy.signal as sps

        from afp_tpu.engine import PipelineParams as PP
        from afp_tpu.ops.resample import streaming_kernel

        ccfg = dataclasses.replace(cfg, batch=1, dither_kind="off")
        cpipe = Pipeline(ccfg)
        cparams = cpipe.device_params(PP.design(cpipe.cfg))
        rngx = np.random.default_rng(0)
        sig = (rngx.standard_normal((1, cfg.blocksize * 4)) * 0.3).astype(np.float32)
        # fold=False: the gate certifies the streaming SCAN path serving
        # actually dispatches, not the offline fold (which is separately
        # certified bit-exact vs the scan by tools/hw_check.py)
        _, out = cpipe.process_signal(cparams, cpipe.init_state(), sig,
                                      fold=False)
        out = np.asarray(out)[0]
        design = PP.design(cpipe.cfg)
        h_up = streaming_kernel(cfg.upsample_factor, 1,
                                quality=cfg.resample_quality)
        y = sps.upfirdn(h_up, sig[0].astype(np.float64), cfg.upsample_factor, 1)
        y = y[: sig.shape[1] * cfg.upsample_factor]
        y = np.convolve(y, design.main_taps.astype(np.float64))[: len(y)]
        gold = y[:: cfg.upsample_factor]
        err = np.max(np.abs(out - gold)) / (np.max(np.abs(gold)) + 1e-300)
        err_db = float(round(20 * np.log10(err + 1e-300), 1))
        if err_db >= -90:
            raise AccuracyError(
                f"{strategy}/{precision}: {err_db} dB vs oracle breaks the "
                f"−90 dB contract"
            )

    # Pair-ingest variant (cfg.ingest='pair'): the bf16 hi/lo split happens
    # at ingest (host/DMA side), the device runs ZERO staging passes.  Extra
    # metric, not the headline — the headline keeps the reference's f32
    # input contract.  Measured on the SAME 16-block ring as the f32
    # like-for-like number below (r2 advisor: the +14% quote mixed ring
    # sizes; the full-size pair ring also OOM'd at 16 GB).
    sustained_pair_xrt = None
    sustained_pair_ring_xrt = None
    sustained_pair_ring_mega_xrt = None
    sustained_pair_ring_asym_xrt = None
    sustained_pair_ring_mega_asym_xrt = None
    sustained_xrt_ring16 = None
    mfu_ring = None
    mfu_ring_asym = None
    if (strategy == "td_mxu" and precision.startswith("B3")
            and os.environ.get("AFP_BENCH_PAIR", "1") != "0"):
        import dataclasses

        from afp_tpu.ops.pallas.fir_td import split_bf16

        try:
            ring = min(16, blocks.shape[0])
            if ring < blocks.shape[0]:
                sustained_xrt_ring16 = _sustained_xrt(
                    pipe, params, blocks[:ring], reps)
            else:
                sustained_xrt_ring16 = sustained_xrt
            pcfg = dataclasses.replace(cfg, ingest="pair")
            ppipe = Pipeline(pcfg)
            pparams = ppipe.device_params(PipelineParams.design(ppipe.cfg))
            pblocks = split_bf16(blocks[:ring])
            jax.block_until_ready(pblocks)
            print("bench: pair-ingest variant compiling...",
                  file=sys.stderr, flush=True)
            sustained_pair_xrt = _sustained_xrt(ppipe, pparams, pblocks, reps)
            # zero-copy serving ring + megakernel + the 2048-step asymptote
            # pair (per-dispatch tunnel RTT ~26 ms amortized 4× further;
            # extra keys, NOT the 512-step default methodology — a
            # co-located production host with long-lived dispatches sees
            # the asymptote numbers)
            legs = _ring_leg_suite(ppipe, pparams, pblocks, reps, "pair")
            sustained_pair_ring_xrt = legs["ring"]
            sustained_pair_ring_mega_xrt = legs["mega"]
            sustained_pair_ring_asym_xrt = legs["asym"]
            sustained_pair_ring_mega_asym_xrt = legs["mega_asym"]
            mfu_ring = _ring_mfu(pipe, batch, cfg.blocksize,
                                 sustained_pair_ring_xrt,
                                 sustained_pair_ring_mega_xrt)
            mfu_ring_asym = _ring_mfu(pipe, batch, cfg.blocksize,
                                      sustained_pair_ring_asym_xrt,
                                      sustained_pair_ring_mega_asym_xrt)
            del pblocks
        except Exception as e:  # noqa: BLE001
            print(f"bench: pair-ingest variant failed ({e})",
                  file=sys.stderr, flush=True)

    # f32 conv serving ring: the SAME pipeline/params as the headline (f32
    # ingest — the reference's input contract), but dispatched through the
    # zero-copy ring (`fir_td_mxu_ring_f32`: kernel reads the raw f32 slot,
    # splits bf16 in VMEM, convolves into the donated output slot).  A bf16
    # pair costs exactly the bytes of one f32 array, so this carries the
    # pair-ring's HBM traffic under the f32 contract — it is headline-
    # eligible (same contract, same 512-step dispatch granularity; ring
    # slots 16, same as `sustained_xrt_ring16` for like-for-like).
    sustained_f32_ring_xrt = None
    sustained_f32_ring_mega_xrt = None
    sustained_f32_ring_asym_xrt = None
    sustained_f32_ring_mega_asym_xrt = None
    mfu_f32_ring = None
    mfu_f32_ring_asym = None
    if (pipe.supports_ring_step
            and os.environ.get("AFP_BENCH_F32RING", "1") != "0"):
        try:
            ring_n = min(16, blocks.shape[0])
            if sustained_xrt_ring16 is None and sustained_xrt is not None:
                # like-for-like promotion bar (normally computed in the
                # pair section; recompute here when AFP_BENCH_PAIR=0)
                sustained_xrt_ring16 = (
                    _sustained_xrt(pipe, params, blocks[:ring_n], reps)
                    if ring_n < blocks.shape[0] else sustained_xrt)
            fring = (blocks[:ring_n], None)
            print("bench: f32 conv ring compiling...",
                  file=sys.stderr, flush=True)
            legs = _ring_leg_suite(pipe, params, fring, reps, "f32")
            sustained_f32_ring_xrt = legs["ring"]
            sustained_f32_ring_mega_xrt = legs["mega"]
            sustained_f32_ring_asym_xrt = legs["asym"]
            sustained_f32_ring_mega_asym_xrt = legs["mega_asym"]
            mfu_f32_ring = _ring_mfu(pipe, batch, cfg.blocksize,
                                     sustained_f32_ring_xrt,
                                     sustained_f32_ring_mega_xrt)
            mfu_f32_ring_asym = _ring_mfu(pipe, batch, cfg.blocksize,
                                          sustained_f32_ring_asym_xrt,
                                          sustained_f32_ring_mega_asym_xrt)
        except Exception as e:  # noqa: BLE001
            print(f"bench: f32 conv ring failed ({e})",
                  file=sys.stderr, flush=True)

    # pcm16 conv serving ring (ingest='pcm16'): the input ring holds RAW
    # int16 PCM — the source format of WAV files and sound-card DMA — and
    # the kernel converts (n/32768, exact) + splits in VMEM
    # (`fir_td_mxu_ring_pcm16`).  Input-side HBM bytes and host→device
    # ingest bytes HALVE vs the f32/pair rings.  A DIFFERENT input
    # contract, so it never competes for the f32-contract headline; its
    # own keys quantify what a 16-bit-source deployment gains.
    sustained_pcm16_ring_xrt = None
    sustained_pcm16_ring_mega_xrt = None
    sustained_pcm16_ring_asym_xrt = None
    sustained_pcm16_ring_mega_asym_xrt = None
    mfu_pcm16_ring = None
    mfu_pcm16_ring_asym = None
    sustained_i16io_ring_xrt = None
    sustained_i16io_ring_mega_xrt = None
    sustained_i16io_ring_asym_xrt = None
    sustained_i16io_ring_mega_asym_xrt = None
    if (strategy == "td_mxu" and precision.startswith("B3")
            and os.environ.get("AFP_BENCH_PCM16", "1") != "0"):
        import dataclasses

        try:
            ring_n = min(16, blocks.shape[0])
            icfg = dataclasses.replace(cfg, ingest="pcm16")
            ipipe = Pipeline(icfg)
            iparams = ipipe.device_params(PipelineParams.design(ipipe.cfg))
            # quantize the SAME test signal to int16 (the pcm16 contract:
            # the source data IS 16-bit PCM)
            iring = jnp.clip(jnp.round(blocks[:ring_n] * 32768.0),
                             -32768, 32767).astype(jnp.int16)
            jax.block_until_ready(iring)
            fring16 = (iring, None)
            print("bench: pcm16 conv ring compiling...",
                  file=sys.stderr, flush=True)
            legs = _ring_leg_suite(ipipe, iparams, fring16, reps, "pcm16")
            sustained_pcm16_ring_xrt = legs["ring"]
            sustained_pcm16_ring_mega_xrt = legs["mega"]
            sustained_pcm16_ring_asym_xrt = legs["asym"]
            sustained_pcm16_ring_mega_asym_xrt = legs["mega_asym"]
            mfu_pcm16_ring = _ring_mfu(ipipe, batch, cfg.blocksize,
                                       sustained_pcm16_ring_xrt,
                                       sustained_pcm16_ring_mega_xrt)
            mfu_pcm16_ring_asym = _ring_mfu(ipipe, batch, cfg.blocksize,
                                            sustained_pcm16_ring_asym_xrt,
                                            sustained_pcm16_ring_mega_asym_xrt)
            # full int16 transport (emit='pcm16' on top of pcm16 ingest):
            # int16 ring → int16 ring — output HBM bytes and device→host
            # drain halve; the dither+quantize fuses into the store
            try:
                ecfg = dataclasses.replace(icfg, emit="pcm16")
                epipe = Pipeline(ecfg)
                eparams = epipe.device_params(
                    PipelineParams.design(epipe.cfg))
                print("bench: int16-I/O conv ring compiling...",
                      file=sys.stderr, flush=True)
                legs = _ring_leg_suite(epipe, eparams, fring16, reps,
                                       "int16-I/O")
                sustained_i16io_ring_xrt = legs["ring"]
                sustained_i16io_ring_mega_xrt = legs["mega"]
                sustained_i16io_ring_asym_xrt = legs["asym"]
                sustained_i16io_ring_mega_asym_xrt = legs["mega_asym"]
            except Exception as e:  # noqa: BLE001
                # already-measured legs keep their values (the suite guards
                # each leg); this catches the pipeline/params build only
                print(f"bench: int16-I/O conv ring failed ({e})",
                      file=sys.stderr, flush=True)
            del iring, fring16
        except Exception as e:  # noqa: BLE001
            print(f"bench: pcm16 conv ring failed ({e})",
                  file=sys.stderr, flush=True)

    # Metric NAME carries the methodology (r2 advisor: round 1's value was
    # chained-dispatch xRT, round 2 silently switched to sustained under the
    # same name).  Both numbers are always present under their own keys.
    # The f32 conv ring keeps the f32 input contract AND the 512-step
    # dispatch granularity, so it competes for the headline under its own
    # methodology name.
    headline = sustained_xrt if sustained_xrt is not None else float(round(xrt, 1))
    methodology = "sustained" if sustained_xrt is not None else "chained"
    _f32_headline = max(sustained_f32_ring_xrt or 0,
                        sustained_f32_ring_mega_xrt or 0)
    # Promotion requires beating the staged loop BOTH on the same 16-slot
    # ring (r2 advisor: never compare across ring sizes) AND on the
    # published full-ring number, so a ring-size artifact can neither
    # trigger the methodology flip nor shrink the headline value.
    _bar = max(headline, sustained_xrt_ring16 or 0)
    if _f32_headline > _bar:
        headline = _f32_headline
        methodology = "sustained_f32ring"
        if pipe.n_casc:
            mfu = mfu_f32_ring
    return {
        "metric": f"{methodology}_xrt_1001tap_4x_44k1",
        "value": headline,
        "unit": "x_realtime_per_chip",
        "vs_baseline": headline,
        "methodology": methodology,
        "sustained_xrt_ring16": sustained_xrt_ring16,
        "batch": batch,
        "blocksize": cfg.blocksize,
        "nblocks_per_run": nblocks,
        "chained_dispatches": chain,
        "chained_xrt": float(round(xrt, 1)),
        "sustained_xrt": sustained_xrt,
        "sustained_pair_xrt": sustained_pair_xrt,
        "sustained_pair_ring_xrt": sustained_pair_ring_xrt,
        "sustained_pair_ring_mega_xrt": sustained_pair_ring_mega_xrt,
        "sustained_pair_ring_asym2048_xrt": sustained_pair_ring_asym_xrt,
        "sustained_pair_ring_mega_asym2048_xrt":
            sustained_pair_ring_mega_asym_xrt,
        "sustained_f32_ring_xrt": sustained_f32_ring_xrt,
        "sustained_f32_ring_mega_xrt": sustained_f32_ring_mega_xrt,
        "sustained_f32_ring_asym2048_xrt": sustained_f32_ring_asym_xrt,
        "sustained_f32_ring_mega_asym2048_xrt":
            sustained_f32_ring_mega_asym_xrt,
        "sustained_pcm16_ring_xrt": sustained_pcm16_ring_xrt,
        "sustained_pcm16_ring_mega_xrt": sustained_pcm16_ring_mega_xrt,
        "sustained_pcm16_ring_asym2048_xrt": sustained_pcm16_ring_asym_xrt,
        "sustained_pcm16_ring_mega_asym2048_xrt":
            sustained_pcm16_ring_mega_asym_xrt,
        "sustained_i16io_ring_xrt": sustained_i16io_ring_xrt,
        "sustained_i16io_ring_mega_xrt": sustained_i16io_ring_mega_xrt,
        "sustained_i16io_ring_asym2048_xrt": sustained_i16io_ring_asym_xrt,
        "sustained_i16io_ring_mega_asym2048_xrt":
            sustained_i16io_ring_mega_asym_xrt,
        "strategy": strategy,
        "precision": precision if strategy == "td_mxu" else None,
        "mfu": mfu,
        "mfu_ring": mfu_ring,
        "mfu_ring_asym2048": mfu_ring_asym,
        "mfu_f32_ring": mfu_f32_ring,
        "mfu_f32_ring_asym2048": mfu_f32_ring_asym,
        "mfu_pcm16_ring": mfu_pcm16_ring,
        "mfu_pcm16_ring_asym2048": mfu_pcm16_ring_asym,
        "best_run_s": round(best, 4),
        "error_db_vs_oracle": err_db,
        "device": str(jax.devices()[0]),
    }


def run_engine_pair_xrt(batch: int, nblocks: int, reps: int) -> float:
    """The headline config driven THROUGH the StreamEngine surface (ladder,
    metrics, checkpointable state) with ingest='pair' — VERDICT r2 #4 asked
    for the fastest mode to be measured through the engine path, not just
    the raw Pipeline.  One process_signal call = one lax.scan dispatch."""
    from afp_tpu.engine import StreamConfig, StreamEngine

    cfg = StreamConfig(
        samplerate=44100, blocksize=4096, upsample_factor=4, numtaps=1001,
        batch=batch, filter_type="lowpass", cutoff=11000.0,
        window_type="hamming", eq_enabled=False, agc_enabled=False,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=None,
        conv_strategy="td_mxu", ingest="pair", resample_quality="vhq",
    )
    eng = StreamEngine(cfg)
    rng = np.random.default_rng(3)
    # one random block tiled across time: this box's large-array RNG stalls
    # in kernel time (~190 s/GB even at dtype=f32; the full [batch,
    # nblocks·bs] draw measured >600 s and ate the stage's entire alarm
    # budget) — timing is content-independent, so don't pay it
    base = rng.standard_normal((batch, cfg.blocksize),
                               dtype=np.float32) * np.float32(0.3)
    sig = np.tile(base, (1, nblocks))
    print(f"bench: engine pair path compiling ({sig.nbytes >> 20} MB "
          "signal)...", file=sys.stderr, flush=True)
    eng.process_signal(sig)  # compile + warm
    times = []
    for _ in range(max(2, reps - 2)):
        t0 = time.perf_counter()
        out = eng.process_signal(sig)
        times.append(time.perf_counter() - t0)
    assert np.all(np.isfinite(out[:, -1]))
    best = min(times)
    xrt = float(round(batch * sig.shape[1] / cfg.samplerate / best, 1))
    print(f"bench: engine-path pair ingest xrt={xrt:.0f} "
          f"({nblocks} blocks/dispatch incl. host staging)",
          file=sys.stderr, flush=True)
    return xrt


def resample_tier_report() -> dict:
    """Measured 4×-upsample error per quality tier, as promised by
    `afp_tpu/ops/resample.py`: the DEVICE op (f32) vs the ideal bandlimited
    interpolation (float64 FFT zero-padding of a periodic signal, exact for
    in-band content), interior samples only.  Reported, not asserted — the
    'vhq' tier's −141 dB kernel class saturates at the f32 arithmetic floor.
    Also reports error vs soxr VHQ/HQ when the soxr module is importable
    (it is not baked into the TPU image)."""
    import jax.numpy as jnp

    from afp_tpu.ops.resample import resample_poly

    rng = np.random.default_rng(7)
    N, up = 4096, 4
    # periodic signal bandlimited to 85% of Nyquist (inside every tier's
    # passband) — its ideal 4× interpolation is exact spectral zero-padding
    X = np.zeros(N, dtype=np.complex128)
    nband = int(0.85 * N // 2)
    X[1 : nband + 1] = rng.normal(size=nband) + 1j * rng.normal(size=nband)
    X[-nband:] = np.conj(X[1 : nband + 1][::-1])
    x = np.fft.ifft(X).real
    x = (0.3 * x / np.max(np.abs(x))).astype(np.float32)
    ideal = np.fft.irfft(np.fft.rfft(x.astype(np.float64)), n=N * up) * up

    try:
        import soxr  # noqa: F401
        have_soxr = True
    except ImportError:
        have_soxr = False

    out = {}
    margin = 64 * up * 8  # skip the FIR edge transients (≤ vhq half length ·up)
    for tier in ("fast", "hq", "vhq"):
        y = np.asarray(resample_poly(jnp.asarray(x), up, 1, quality=tier))
        err = np.abs(y - ideal)[margin:-margin]
        out[f"resample_err_db_{tier}"] = float(round(
            20 * np.log10(err.max() / np.max(np.abs(ideal)) + 1e-300), 1))
        if have_soxr:
            import soxr

            quality = {"fast": "MQ", "hq": "HQ", "vhq": "VHQ"}[tier]
            ys = soxr.resample(x, 44100, 44100 * up, quality=quality)
            m = min(len(ys), len(y)) - margin
            derr = np.abs(ys[margin:m] - y[margin:m]).max()
            out[f"resample_vs_soxr_{quality}_db"] = float(round(
                20 * np.log10(derr / np.max(np.abs(ideal)) + 1e-300), 1))
    out["resample_soxr_available"] = have_soxr
    return out


def chain_imaging_report() -> dict:
    """Cross-kernel imaging oracle (VERDICT r3 weak #1): the C5 chain
    (upsample → main FIR → decimate) measured against a KERNEL-INDEPENDENT
    float64 oracle — ideal bandlimited interpolation (FFT zero-padding of
    a periodic in-band signal) through the SAME main FIR + decimation.

    `error_db_vs_oracle` uses our own up-kernel in the gold chain, so
    anti-imaging leakage cancels out of it; here any image the tier's
    kernel lets through lands in the error (the tier-report analog, but
    through the full chain's filters — the main lowpass legitimately mops
    up part of the image band, which is why the chain numbers can beat
    the raw tier stopbands).  Two chains:

    * ``headline``: upf 4, 1001 taps @ 11 kHz (the bench headline, which
      ships 'vhq' — reference parity, `stream_process.py:69-74`),
    * ``default``: upf 2, 129 taps @ 14 kHz (the GUI-generation defaults
      a no-flags user gets), at the DEFAULT engine tier.

    The default-config chain is ASSERTED ≤ −90 dB — the framework's
    contract must hold for a default-config user ('fast' is reported
    alongside to show why it is not the default)."""
    import jax.numpy as jnp

    from afp_tpu.design import create_fir_filter
    from afp_tpu.engine import StreamConfig
    from afp_tpu.ops.resample import resample_poly

    rng = np.random.default_rng(11)
    N = 16384
    default_q = StreamConfig().resample_quality

    def periodic(nband: int) -> np.ndarray:
        X = np.zeros(N, dtype=np.complex128)
        X[1 : nband + 1] = rng.normal(size=nband) + 1j * rng.normal(size=nband)
        X[-nband:] = np.conj(X[1 : nband + 1][::-1])
        x = np.fft.ifft(X).real
        return (0.3 * x / np.max(np.abs(x))).astype(np.float32)

    out = {"resample_default_quality": default_q}
    legs = {
        "headline": (4, 1001, 11000.0, ("fast", "vhq")),
        "default": (2, 129, 14000.0, ("fast", default_q)),
    }
    for name, (up, numtaps, cutoff, tiers) in legs.items():
        h = np.asarray(create_fir_filter(
            method="window", cutoff=cutoff, numtaps=numtaps,
            window_type="hamming", filter_type="lowpass",
            samplerate=44100 * up), dtype=np.float64)
        x = periodic(int(0.85 * N // 2))
        # exact interpolation of the periodic signal: spectral zero-padding
        ideal = np.fft.irfft(np.fft.rfft(x.astype(np.float64)), n=N * up) * up
        gold = np.convolve(ideal, h, mode="same")[::up]
        scale = np.max(np.abs(gold))
        m = 2048  # FIR edge transients
        for q in dict.fromkeys(tiers):  # dedup if default_q == 'fast'
            y = np.asarray(
                resample_poly(jnp.asarray(x), up, 1, quality=q)
            ).astype(np.float64)
            ours = np.convolve(y, h, mode="same")[::up]
            err = np.abs(ours - gold)[m:-m].max() / scale
            out[f"chain_err_db_{name}_{q}"] = float(round(
                20 * np.log10(err + 1e-300), 1))
    key = f"chain_err_db_default_{default_q}"
    if out[key] >= -90:
        raise AccuracyError(
            f"default-config chain imaging {out[key]} dB vs the "
            "kernel-independent oracle breaks the −90 dB contract")
    return out


def run_agc_config(batch: int, nblocks: int, reps: int, strategy: str,
                   agc_mode: str) -> dict:
    """Chained/sustained/ring xRT for the C8 engine (9-band EQ + AGC + 2× upsample,
    block 2048 — `stream_process_AGC.py` operating point)."""
    import jax
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    cfg = StreamConfig(
        samplerate=44100,
        blocksize=2048,
        upsample_factor=2,
        numtaps=129,
        batch=batch,
        cutoff=14000.0,
        eq_enabled=True,
        agc_enabled=True,
        agc_mode=agc_mode,
        agc_window_size=512,
        agc_carry=True,
        downsample_mode="decimate",
        dither_kind="tpdf",
        output_clip=0.99,
        conv_strategy=strategy,
    )
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    blocks = jax.random.normal(
        jax.random.PRNGKey(1), (nblocks, batch, cfg.blocksize), dtype=jnp.float32
    ) * 0.1
    chain = int(os.environ.get("AFP_BENCH_CHAIN", "8"))
    print(f"bench: agc mode={agc_mode} compiling...", file=sys.stderr, flush=True)
    best, _ = _time_runs(pipe, params, pipe.init_state(), blocks, reps,
                         chain=chain)
    xrt = chain * batch * nblocks * cfg.blocksize / cfg.samplerate / best
    print(f"bench: agc mode={agc_mode} xrt={xrt:.0f}", file=sys.stderr, flush=True)
    sustained = _sustained_xrt(pipe, params, blocks, reps)
    # zero-copy AGC serving ring (exact mode on TPU engages the fused
    # pair chain): the f32 input ring feeds the ring-input RMS/apply
    # kernels, the conv writes the output ring in place
    ring = None
    ring_asym = None
    ring_pcm16 = None
    ring_pcm16_asym = None
    ring_i16io_asym = None
    n_asym = int(os.environ.get("AFP_BENCH_SUSTAIN_ASYMPTOTE", "2048"))
    if pipe.supports_ring_step:
        try:
            ring = _sustained_agc_ring_xrt(pipe, params, blocks, reps)
        except Exception as e:  # noqa: BLE001
            print(f"bench: agc ring mode failed ({e})",
                  file=sys.stderr, flush=True)
        if ring is not None and n_asym > int(
                os.environ.get("AFP_BENCH_SUSTAIN", "512")):
            try:
                ring_asym = _sustained_agc_ring_xrt(pipe, params, blocks,
                                                    reps, n_sust=n_asym)
            except Exception as e:  # noqa: BLE001
                print(f"bench: agc ring asymptote failed ({e})",
                      file=sys.stderr, flush=True)
        # pcm16 C8 serving ring: the AGC kernels read the RAW int16 ring
        # slot and convert in VMEM (exact), halving the chain's two f32
        # x-reads — outputs bit-identical to the f32 ring fed n/32768
        if ring is not None and agc_mode == "exact":
            try:
                import dataclasses as _dc

                icfg = _dc.replace(cfg, ingest="pcm16")
                ipipe = Pipeline(icfg)
                if ipipe.supports_ring_step and ipipe._i16_agc_raw:
                    iparams = ipipe.device_params(
                        PipelineParams.design(ipipe.cfg))
                    iblocks = jnp.clip(
                        jnp.round(blocks * 32768.0), -32768, 32767
                    ).astype(jnp.int16)
                    ring_pcm16 = _sustained_agc_ring_xrt(
                        ipipe, iparams, iblocks, reps)
                    if ring_pcm16 is not None and n_asym > int(
                            os.environ.get("AFP_BENCH_SUSTAIN", "512")):
                        ring_pcm16_asym = _sustained_agc_ring_xrt(
                            ipipe, iparams, iblocks, reps, n_sust=n_asym)
                        # full int16 transport: pcm16 in + pcm16 out (the
                        # conv store quantizes; output ring bytes halve).
                        # Only measured at the true asymptote — the key
                        # says asym2048, so never fall back to the
                        # 512-step sustain
                        ecfg = _dc.replace(icfg, emit="pcm16")
                        epipe = Pipeline(ecfg)
                        if epipe.supports_ring_step:
                            eparams = epipe.device_params(
                                PipelineParams.design(epipe.cfg))
                            ring_i16io_asym = _sustained_agc_ring_xrt(
                                epipe, eparams, iblocks, reps,
                                n_sust=n_asym)
            except Exception as e:  # noqa: BLE001
                print(f"bench: agc pcm16 ring failed ({e})",
                      file=sys.stderr, flush=True)
    hbm_frac = None
    if ring_asym:
        hbm_frac = _agc_ring_hbm_frac(pipe, batch, cfg.blocksize, ring_asym)
    return {"chained": float(round(xrt, 1)), "sustained": sustained,
            "ring": ring, "ring_asym": ring_asym,
            "ring_pcm16": ring_pcm16, "ring_pcm16_asym": ring_pcm16_asym,
            "ring_i16io_asym": ring_i16io_asym, "ring_hbm_frac": hbm_frac}


def _agc_ring_hbm_frac(pipe, batch: int, blocksize: int,
                       xrt: float) -> float:
    """Achieved fraction of the HBM-bandwidth roofline for the fused AGC
    serving chain at the measured asymptote (VERDICT r4 #2's
    decomposition leg): analytic bytes/step over `wall × peak_BW`.

    Bytes/step (f32 ring, exact mode): x read twice (RMS + apply), the
    per-sample desired gain written + read, the bf16 pair written + read,
    the output written — 7 full [B, T] f32 arrays — plus the pair tail
    round trip and the conv band's per-tile fetches.  'fast' mode's
    chunk-mean d path (r5) shrinks the d term 32×.

    Read it as the chain's HBM byte DEMAND against the nominal 819 GB/s:
    ≥ ~1.0 (exact mode measured 1.09 in r5 — the analytic count slightly
    exceeds nominal-peak × wall) means the DMA engine is saturated for
    essentially the whole step.  r5's byte-cut experiments (pcm16 −14%,
    the means path −27%) moved the wall by ~0 — so at this operating
    point the wall is set by the overlapping COMPUTE/serial envelope of
    the three kernels, with the DMA fully hidden beneath it; neither
    fewer launches (mega) nor fewer bytes buys wall time until that
    envelope shrinks (BENCHMARKS.md 'AGC chain roofline, r5 measured')."""
    from afp_tpu.ops.pallas.fir_td import LANE, _pick_b_tile_b3t_f32

    B, T = batch, blocksize
    arr = B * T * 4  # one full f32 array
    d_factor = 2.0 / (pipe._agc_blockwise or 1) if pipe._agc_means else 2.0
    k_pad = pipe._k_pad
    # x is read twice (RMS + apply): f32 at 4 B/sample, pcm16 at 2
    x_rd = arr if pipe._i16_ingest else 2 * arr
    bytes_step = (
        x_rd                      # x read by RMS + apply
        + d_factor * arr          # d write + read (means: /chunk)
        + 2 * arr                 # bf16 pair write + read
        + (arr // 2 if pipe._emit16 else arr)  # output write
        + 8 * B * k_pad           # bf16 pair tail r/w
    )
    bt = _pick_b_tile_b3t_f32(B, k_pad, T)
    bytes_step += (B // bt) * (k_pad + LANE) * LANE * 2 * 2  # conv band DMA
    peak = float(os.environ.get("AFP_HBM_GBPS", "819")) * 1e9
    wall = B * T / pipe.cfg.samplerate / xrt
    return float(round(bytes_step / (wall * peak), 4))


def _sustained_agc_ring_xrt(pipe, params, blocks, reps: int,
                            n_sust: int | None = None):
    """Ring-mode sustained serving for the fused AGC chain (f32 ring)."""
    if n_sust is None:
        n_sust = int(os.environ.get("AFP_BENCH_SUSTAIN", "512"))
    if not n_sust or not pipe.supports_ring_step:
        return None
    K, batch, blocksize = blocks.shape
    return _time_sustained(
        f"agc ring-mode[{n_sust}]",
        lambda st, rg: pipe.run_ring(params, st, blocks, None, rg, n_sust),
        pipe, n_sust, K, batch, blocksize, reps)


def agc_parallel_vs_exact_db(strategy: str) -> float:
    """On-hardware consistency: the associative-scan AGC solver against the
    per-sample reference recurrence, through the full C8 pipeline."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    base = StreamConfig(
        samplerate=44100, blocksize=2048, upsample_factor=2, numtaps=129,
        batch=64, eq_enabled=True, agc_enabled=True, agc_window_size=512,
        downsample_mode="decimate", dither_kind="off", output_clip=0.99,
        conv_strategy=strategy,
    )
    sig = jax.random.normal(
        jax.random.PRNGKey(2), (8, 64, 2048), dtype=jnp.float32
    ) * 0.05
    outs = {}
    for mode in ("exact", "parallel"):
        cfg = dataclasses.replace(base, agc_mode=mode)
        pipe = Pipeline(cfg)
        params = pipe.device_params(PipelineParams.design(pipe.cfg))
        _, out = pipe.run(params, pipe.init_state(), sig)
        outs[mode] = np.asarray(out)
    err = np.max(np.abs(outs["parallel"] - outs["exact"]))
    scale = np.max(np.abs(outs["exact"])) + 1e-300
    return float(round(20 * np.log10(err / scale + 1e-300), 1))


def run_offline_fold_xrt(reps: int) -> dict:
    """Single-stream offline processing (the CLI case, batch 1) at the
    headline filter chain: the time-FOLDED batched path vs the streaming
    scan, device-resident signal.  The scan starves the MXU at batch 1
    (one row of the 128-row systolic array per dispatch step); the fold
    runs the same per-block windows as rows of one batched call."""
    import jax
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    nb = int(os.environ.get("AFP_BENCH_FOLD_BLOCKS", "256"))
    cfg = StreamConfig(
        samplerate=44100, blocksize=4096, upsample_factor=4, numtaps=1001,
        batch=1, filter_type="lowpass", cutoff=11000.0,
        window_type="hamming", eq_enabled=False, agc_enabled=False,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=None,
        conv_strategy="td_mxu", resample_quality="vhq",
    )
    pipe = Pipeline(cfg)
    assert pipe.supports_fold
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    sig = jax.random.normal(jax.random.PRNGKey(0),
                            (1, nb * cfg.blocksize), jnp.float32) * 0.3
    jax.block_until_ready(sig)
    audio_s = nb * cfg.blocksize / cfg.samplerate
    out = {}
    for name, fold in (("fold", "prefer"), ("scan", False)):
        print(f"bench: offline b1 {name} compiling...", file=sys.stderr,
              flush=True)
        _, y = pipe.process_signal(params, pipe.init_state(seed=0), sig,
                                   fold=fold)  # compile + warm
        float(jnp.sum(y.astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _, y = pipe.process_signal(params, pipe.init_state(seed=0),
                                       sig, fold=fold)
            float(jnp.sum(y.astype(jnp.float32)))  # force (early-return BUR)
            ts.append(time.perf_counter() - t0)
        out[f"offline_b1_{name}_xrt"] = round(audio_s / min(ts), 1)
    # derived: per-block device latency of ONE real-time stream (the
    # reference's operating shape) — the scan leg is nb sequential steps
    # inside one jit, so RTT amortizes out
    scan_xrt = out.get("offline_b1_scan_xrt")
    if scan_xrt:  # a 0.0 xrt would divide to inf; skip the derived key then
        block_s = cfg.blocksize / cfg.samplerate
        out["block_latency_us_b1"] = round(block_s / scan_xrt * 1e6, 2)
    return out


def run_per_stream_ring_xrt(batch: int, reps: int) -> dict:
    """Per-stream FILTER banks on the f32 serving ring (VERDICT r3 #3's
    hardware leg): the headline config with FOUR distinct per-group main
    filters (cutoffs 8/10/11/12 kHz in batch/4-row groups) through the
    banked ring + megakernel.  The banked kernels select each tile's band
    by scalar-prefetch ADDRESSING, so the target is ~1.0× the shared-kernel
    ring (the judge's bar was within ~2×)."""
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
    from afp_tpu.engine.batch import with_per_stream_filters

    cfg = StreamConfig(
        samplerate=44100, blocksize=4096, upsample_factor=4, numtaps=1001,
        batch=batch, filter_type="lowpass", cutoff=11000.0,
        window_type="hamming", eq_enabled=False, agc_enabled=False,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=None,
        conv_strategy="td_mxu", resample_quality="vhq",
    )
    cuts = [8000.0, 10000.0, 11000.0, 12000.0]
    K = int(os.environ.get("AFP_BENCH_RING_BLOCKS", "16"))
    rng = np.random.default_rng(2)
    base = rng.standard_normal((batch, cfg.blocksize),
                               dtype=np.float32) * 0.3
    ring = jnp.broadcast_to(jnp.asarray(base), (K, batch, cfg.blocksize)) + 0.0
    n_sust = int(os.environ.get("AFP_BENCH_SUSTAIN", "512"))
    out = {}
    # r5 A/B: the per-step banked ring's r4 gap (−23% vs the shared ring)
    # was band re-DMA — the per-TILE BlockSpec selection refetches the
    # design band for every batch tile, where the shared kernel's
    # constant-index band is fetched once per launch.  The shipped 'auto'
    # mode keeps the whole bank VMEM-resident (one fetch per launch,
    # in-kernel select — fir_td._bank_resident); '0' re-measures the r4
    # per-tile form as the ablation baseline.
    prev = os.environ.get("AFP_BANKED_RESIDENT")
    try:
        for mode, key, label in (
                ("1", "per_stream_ring_xrt", "per-stream banked ring"),
                ("0", "per_stream_ring_pertile_xrt",
                 "per-stream banked ring (per-tile band DMA)")):
            os.environ["AFP_BANKED_RESIDENT"] = mode
            pipe = Pipeline(cfg)
            variants = [dict(cutoff=cuts[4 * i // batch])
                        for i in range(batch)]
            params = with_per_stream_filters(pipe, variants)
            assert params.casc_bank.shape[0] == 4
            out[key] = _time_sustained(
                label,
                lambda st, rg: pipe.run_ring(params, st, ring, None, rg,
                                             n_sust),
                pipe, n_sust, K, batch, cfg.blocksize, reps)
            if mode == "1":
                out["per_stream_ring_mega_xrt"] = _time_sustained(
                    "per-stream banked ring-mega",
                    lambda st, rg: pipe.run_ring_mega(params, st, ring,
                                                      None, rg, n_sust),
                    pipe, n_sust, K, batch, cfg.blocksize, reps)
    finally:
        if prev is None:
            os.environ.pop("AFP_BANKED_RESIDENT", None)
        else:
            os.environ["AFP_BANKED_RESIDENT"] = prev
    return out


def run_reconfig_latency(reps: int) -> dict:
    """Live-reconfig-on-the-rings latency (VERDICT r4 #1's hardware leg):
    a mid-serve `RingServer.set_eq_gains` (gain ×2 — runtime data, no
    redesign) lands while the pump streams a constant tone; detect the
    first drained block whose energy reflects the new bank.

    Reports `reconfig_effect_blocks` (output blocks between the swap call
    and the first affected block — 0 when the swap lands on a chunk
    boundary, the contract's bound is the next chunk) and
    `reconfig_to_effect_ms` (wall time from the swap call to DRAINING the
    first affected block — includes the in-flight pipeline the server was
    configured to run ahead by, `(max_inflight+1)·chunk` blocks).

    Batch 64, deliberately: the metric times land→dispatch→DRAIN, and at
    batch 4096 the drain is 64 MB/chunk of device→host transfer — on the
    ~50 MB/s dev tunnel that measures the LINK (first run at batch 1024:
    8.5 s of pure drain bandwidth), not the engine's reconfig behavior.
    At batch 64 the drain is 4 MB/chunk and the number is dominated by
    the dispatch pipeline it exists to measure."""
    import time as _time

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
    from afp_tpu.runtime import RingServer

    cfg = StreamConfig(
        samplerate=44100, blocksize=4096, upsample_factor=4, numtaps=1001,
        batch=64, filter_type="lowpass", cutoff=11000.0,
        window_type="hamming", eq_enabled=True, agc_enabled=False,
        downsample_mode="decimate", dither_kind="off", output_clip=None,
        conv_strategy="td_mxu", resample_quality="vhq",
    )
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    rng = np.random.default_rng(5)
    tone = (rng.standard_normal((cfg.batch, cfg.blocksize))
            .astype(np.float32) * 0.05)
    g2 = np.asarray(params.eq_gains) * 2.0
    n, swap_at, chunk = 32, 16, 4
    out = {}
    for rep in range(max(2, min(reps, 3))):  # first rep compiles; keep last
        srv = RingServer(pipe, params, slots=16, chunk=chunk, max_inflight=2)
        t_swap = [0.0]

        def src():
            for i in range(n):
                if i == swap_at:
                    srv.set_eq_gains(g2)
                    t_swap[0] = _time.perf_counter()
                yield tone

        e0 = None
        eff_idx = t_eff = None
        for i, blk in enumerate(srv.stream(src())):
            e = float(np.mean(np.square(blk[0], dtype=np.float64)))
            if e0 is None:
                e0 = e
            if eff_idx is None and e > 2.0 * e0:
                eff_idx, t_eff = i, _time.perf_counter()
        assert eff_idx is not None, "gain swap never took effect"
        out = {"reconfig_effect_blocks": int(eff_idx - swap_at),
               "reconfig_to_effect_ms": float(round(
                   (t_eff - t_swap[0]) * 1e3, 2))}
    print(f"bench: reconfig effect after {out['reconfig_effect_blocks']} "
          f"blocks, {out['reconfig_to_effect_ms']} ms wall",
          file=sys.stderr, flush=True)
    return out


def latency_sla_report(reps: int) -> dict:
    """Per-block latency percentiles (VERDICT r3 #7): p50/p99 device time
    per block at batch ∈ {1, 64, 4096} for the staged scan vs the
    zero-copy ring vs the megakernel, headline config (vhq).

    Methodology: each sample is one K-block device dispatch (chained on a
    scalar fetch — the tunnel's block_until_ready returns early) divided
    by K; ≥ `reps·8` samples per cell.  Per-single-block round-trip times
    are NOT reported — on this dev tunnel they are ~26 ms of link RTT,
    which measures the tunnel, not the engine (DEPLOY.md maps these
    numbers to the reference's 92.9 ms real-time budget)."""
    import time as _time

    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    K = 16
    n_samp = max(16, reps * 8)
    out = {}
    # measured per-dispatch round trip: every latency sample carries RTT/K
    # of link time on top of device time (on this dev tunnel the RTT is
    # ~26 ms, i.e. ~1.6 ms/block at K=16 — often LARGER than the device
    # time; a PCIe host's RTT is tens of µs).  Published so the table can
    # be read as device + rtt/K.
    tiny = jnp.zeros((8, 128), jnp.float32) + 1.0
    float(jnp.sum(tiny))
    rtts = []
    for _ in range(10):
        t0 = _time.perf_counter()
        float(jnp.sum(tiny + 1.0))
        rtts.append(_time.perf_counter() - t0)
    out["dispatch_rtt_ms"] = round(float(np.median(rtts)) * 1e3, 2)
    for batch in (1, 64, 4096):
        cfg = StreamConfig(
            samplerate=44100, blocksize=4096, upsample_factor=4,
            numtaps=1001, batch=batch, filter_type="lowpass",
            cutoff=11000.0, window_type="hamming", eq_enabled=False,
            agc_enabled=False, downsample_mode="decimate",
            dither_kind="tpdf", output_clip=None, conv_strategy="td_mxu",
            resample_quality="vhq",
        )
        pipe = Pipeline(cfg)
        rng = np.random.default_rng(1)
        base = rng.standard_normal((batch, cfg.blocksize),
                                   dtype=np.float32) * 0.3
        blocks = jnp.broadcast_to(jnp.asarray(base),
                                  (K, batch, cfg.blocksize)) + 0.0
        params = pipe.device_params(PipelineParams.design(pipe.cfg))
        ring0 = jnp.zeros((K, batch, cfg.blocksize), jnp.float32)
        modes = {
            # staged returns the outs array as `rg` so the checksum fetch
            # chains on the real result for every mode
            "staged": lambda st, rg: pipe.run(params, st, blocks),
            "ring": lambda st, rg: pipe.run_ring(params, st, blocks, None,
                                                 rg, K),
            "mega": lambda st, rg: pipe.run_ring_mega(params, st, blocks,
                                                      None, rg, K),
        }
        for name, dispatch in modes.items():
            try:
                st = pipe.init_state(seed=0)
                # fresh ring per mode: the ring/mega dispatches DONATE it,
                # so a shared buffer is deleted after the first mode
                rg = jnp.zeros_like(ring0)
                st, rg = dispatch(st, rg)  # compile + warm
                float(jnp.sum(rg))
                samples = []
                rejected = 0
                rtt_med = float(np.median(rtts))
                for _ in range(n_samp):
                    t0 = _time.perf_counter()
                    st, rg = dispatch(st, rg)
                    float(jnp.sum(rg))
                    dt = (_time.perf_counter() - t0) / K * 1e6
                    # stall rejection (VERDICT r4 #7): the dev tunnel
                    # stalls for whole seconds at a time, polluting p99
                    # with link weather (r4: ring p99 85–448 ms vs p50
                    # 1.4 ms).  A paired no-op fetch right after the
                    # sample sees the same stall — discard the sample
                    # when the probe blows past the link's median RTT,
                    # so the published tail measures the ENGINE.
                    t1 = _time.perf_counter()
                    float(jnp.sum(tiny + 1.0))
                    probe = _time.perf_counter() - t1
                    if probe > 3.0 * rtt_med:
                        rejected += 1
                        continue
                    samples.append(dt)
                if len(samples) < max(8, n_samp // 4):
                    print(f"bench: latency {name} b{batch}: only "
                          f"{len(samples)} clean samples "
                          f"({rejected} stall-rejected) — tail not "
                          "trustworthy this run", file=sys.stderr,
                          flush=True)
                out[f"latency_us_{name}_b{batch}_p50"] = round(
                    float(np.percentile(samples, 50)), 1)
                out[f"latency_us_{name}_b{batch}_p99"] = round(
                    float(np.percentile(samples, 99)), 1)
                # Link-retry tails (r5 measurement note): the ring/mega
                # cells' raw p99 events land at 3–4× the link RTT with a
                # CLEAN paired probe immediately after — transport
                # retries, not device or engine time (staged dodges them
                # only by chance).  Publish the tail separated: p99 over
                # samples under 10× the cell p50 (the engine's own tail)
                # plus the count of link-retry events.
                p50 = float(np.percentile(samples, 50))
                clean = [s for s in samples if s < 10 * p50]
                tails = len(samples) - len(clean)
                if clean:
                    out[f"latency_us_{name}_b{batch}_p99_clean"] = round(
                        float(np.percentile(clean, 99)), 1)
                if tails:
                    out[f"latency_us_{name}_b{batch}_tail_events"] = tails
                if rejected:
                    out[f"latency_us_{name}_b{batch}_stall_rejected"] = (
                        rejected)
            except Exception as e:  # noqa: BLE001
                print(f"bench: latency {name} b{batch} failed ({e})",
                      file=sys.stderr, flush=True)
    return out


def h2d_bound_report(batch: int) -> dict:
    """Measured host→device link bandwidth and the engine-surface bound it
    implies (VERDICT r3 #6): `engine_pair_xrt` is H2D-BOUND at
    ``BW / (4 B · samplerate)`` aggregate xRT — publishing the measured
    bandwidth makes that number read as "at the link bound" rather than an
    unexplained small xRT.  (On this dev tunnel BW is ~25 MB/s; a
    production PCIe v5e host moves the same bound to the 50k–100k× range.)
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    # measure at the engine leg's actual transfer size (256 MB): burst
    # numbers on small buffers overstate the sustained tunneled rate by
    # ~2× (r4 probe: 64 MB burst 37.5 MB/s vs the engine's effective
    # ~21 MB/s on the same link)
    nbytes = 256 << 20
    host = np.random.default_rng(0).standard_normal(
        nbytes // 4).astype(np.float32)
    d = jax.device_put(host[: (64 << 20) // 4])  # warm the path
    float(jnp.sum(d[:8]))
    times = []
    for _ in range(2):
        t0 = _time.perf_counter()
        d = jax.device_put(host)
        float(jnp.sum(d[:8]))  # force completion
        times.append(_time.perf_counter() - t0)
    bw = nbytes / min(times)
    return {
        "h2d_mbps": round(bw / 1e6, 1),
        # aggregate-xRT ceiling for any host-staged f32 engine surface
        "engine_h2d_bound_xrt": round(bw / (4 * 44100), 1),
    }


def _device_contact_watchdog(seconds: int):
    """Hard watchdog around the FIRST device contact.

    A wedged/unreachable tunnel blocks jax's backend init inside a C++
    call — the GIL is released (measured), but the main thread never
    returns to the bytecode loop, so Python-level SIGALRM handlers
    (:func:`_alarm`) can never run.  A daemon thread still gets scheduled:
    it prints the bench-contract JSON error line and hard-exits so the
    driver records a failure instead of hanging."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "aggregate_xrt_1001tap_4x_44k1", "value": 0.0,
            "unit": "x_realtime_per_chip", "vs_baseline": 0.0,
            "error": f"device contact timed out after {seconds}s "
                     "(tunnel unreachable)"}), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main() -> None:
    batch = int(os.environ.get("AFP_BENCH_BATCH", "4096"))
    nblocks = int(os.environ.get("AFP_BENCH_BLOCKS", "64"))
    reps = int(os.environ.get("AFP_BENCH_REPS", "5"))
    strategy = os.environ.get("AFP_BENCH_STRATEGY", "td_mxu")
    precision = os.environ.get("AFP_TD_PRECISION", "B3")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/afp_jax_cache")

    wd = _device_contact_watchdog(
        int(os.environ.get("AFP_BENCH_CONTACT_TIMEOUT", "600")))
    import jax

    jax.devices()  # first tunnel contact — the only unalarmable stage
    wd.cancel()

    # primary attempt ladder, alarm-guarded (the Pallas compile through a
    # tunneled device can be slow): td_mxu/B3 → td_mxu/HIGHEST → fft.
    attempts = [(strategy, precision)]
    if strategy == "td_mxu" and precision != "HIGHEST":
        attempts.append(("td_mxu", "HIGHEST"))
    attempts.append(("fft", "HIGHEST"))
    result = None
    for strat, prec in attempts:
        try:
            # td_mxu budget covers the primary + sustained + pair + ring +
            # mega + the 2048-step asymptote legs + the four f32-conv-ring
            # legs + the four pcm16-ring legs (each a fresh trace); a
            # mid-section BenchTimeout is caught by that section's except
            # and only skips its remaining metrics
            _alarm(2400 if strat == "td_mxu" else 600)
            result = run_config(batch, nblocks, reps, strat, prec)
            signal.alarm(0)
            break
        except (BenchTimeout, Exception) as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"bench: {strat}/{prec} failed ({e}); falling back",
                  file=sys.stderr, flush=True)
    if result is None:
        print(json.dumps({"metric": "aggregate_xrt_1001tap_4x_44k1",
                          "value": 0.0, "unit": "x_realtime_per_chip",
                          "vs_baseline": 0.0, "error": "all strategies failed"}))
        return

    # C8 AGC engine benchmarks (the reference's hardest op — VERDICT r1 #1)
    agc_nblocks = min(nblocks, 32)
    agc_strategy = result["strategy"]
    for mode in ("parallel", "exact", "fast"):
        key = f"agc_{mode}_xrt"
        try:
            _alarm(600)
            r = run_agc_config(batch, agc_nblocks, max(2, reps - 2),
                               agc_strategy, mode)
            signal.alarm(0)
            # headline per mode = sustained (the serving number) when it was
            # measured; the chained value is kept under its own key so the
            # two methodologies never mix silently
            result[key] = (r["sustained"] if r["sustained"] is not None
                           else r["chained"])
            result[f"agc_{mode}_chained_xrt"] = r["chained"]
            if r.get("ring") is not None:
                result[f"agc_{mode}_ring_xrt"] = r["ring"]
            if r.get("ring_asym") is not None:
                result[f"agc_{mode}_ring_asym2048_xrt"] = r["ring_asym"]
            if r.get("ring_pcm16") is not None:
                result[f"agc_{mode}_ring_pcm16_xrt"] = r["ring_pcm16"]
            if r.get("ring_pcm16_asym") is not None:
                result[f"agc_{mode}_ring_pcm16_asym2048_xrt"] = (
                    r["ring_pcm16_asym"])
            if r.get("ring_i16io_asym") is not None:
                result[f"agc_{mode}_ring_i16io_asym2048_xrt"] = (
                    r["ring_i16io_asym"])
            if r.get("ring_hbm_frac") is not None:
                result[f"agc_{mode}_ring_hbm_frac"] = r["ring_hbm_frac"]
        except (BenchTimeout, Exception) as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"bench: agc {mode} failed ({e})", file=sys.stderr, flush=True)
            result[key] = None
    try:
        _alarm(300)
        result["agc_parallel_vs_exact_db"] = agc_parallel_vs_exact_db(agc_strategy)
        signal.alarm(0)
    except (BenchTimeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        print(f"bench: agc consistency check failed ({e})",
              file=sys.stderr, flush=True)
        result["agc_parallel_vs_exact_db"] = None

    # resampler quality-tier error report (the ops/resample.py promise)
    try:
        _alarm(300)
        result.update(resample_tier_report())
        signal.alarm(0)
    except (BenchTimeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        print(f"bench: resample tier report failed ({e})",
              file=sys.stderr, flush=True)

    # cross-kernel imaging oracle: chain error vs the ideal-interpolation
    # float64 gold (kernel-independent — catches anti-imaging leakage the
    # same-kernel error_db_vs_oracle is blind to)
    try:
        _alarm(300)
        result.update(chain_imaging_report())
        signal.alarm(0)
    except (BenchTimeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        print(f"bench: chain imaging report failed ({e})",
              file=sys.stderr, flush=True)

    # pair ingest through the full StreamEngine surface (ladder + metrics)
    if result.get("strategy") == "td_mxu" and str(
            result.get("precision", "")).startswith("B3"):
        try:
            # 4 blocks (256 MB at the headline shape): the stage certifies
            # the host-facing engine surface at scale — it is dominated by
            # host↔device staging over the dev tunnel (~25 MB/s), so a
            # bigger signal measures the same thing slower (the 16-block
            # form blew the stage alarm when the tunnel ran slow)
            _alarm(900)
            result["engine_pair_xrt"] = run_engine_pair_xrt(
                batch, min(nblocks, 4), reps)
            signal.alarm(0)
        except (BenchTimeout, Exception) as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"bench: engine pair path failed ({e})",
                  file=sys.stderr, flush=True)
            result["engine_pair_xrt"] = None

    # single-stream offline fold (batch 1, the CLI case)
    if result.get("strategy") == "td_mxu":
        try:
            _alarm(900)
            result.update(run_offline_fold_xrt(max(2, reps - 2)))
            signal.alarm(0)
        except (BenchTimeout, Exception) as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"bench: offline fold failed ({e})",
                  file=sys.stderr, flush=True)

    # per-stream filter banks on the serving ring (VERDICT r3 #3)
    if result.get("strategy") == "td_mxu" and str(
            result.get("precision", "")).startswith("B3"):
        try:
            _alarm(900)
            result.update(run_per_stream_ring_xrt(batch, reps))
            signal.alarm(0)
        except (BenchTimeout, Exception) as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"bench: per-stream ring failed ({e})",
                  file=sys.stderr, flush=True)

    # live-reconfig-on-the-rings latency (VERDICT r4 #1)
    if result.get("strategy") == "td_mxu":
        try:
            _alarm(600)
            result.update(run_reconfig_latency(reps))
            signal.alarm(0)
        except (BenchTimeout, Exception) as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"bench: reconfig latency failed ({e})",
                  file=sys.stderr, flush=True)

    # latency SLA table (VERDICT r3 #7)
    if result.get("strategy") == "td_mxu":
        try:
            _alarm(900)
            result.update(latency_sla_report(reps))
            signal.alarm(0)
        except (BenchTimeout, Exception) as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"bench: latency SLA failed ({e})",
                  file=sys.stderr, flush=True)

    # measured H2D link bandwidth + the engine-surface bound (VERDICT r3 #6)
    try:
        _alarm(300)
        result.update(h2d_bound_report(batch))
        signal.alarm(0)
    except (BenchTimeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        print(f"bench: h2d bound report failed ({e})",
              file=sys.stderr, flush=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
