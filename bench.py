#!/usr/bin/env python
"""Benchmark harness: aggregate real-time factor on the headline config.

Headline metric (BASELINE.md north star): aggregate xRT — audio-seconds
processed per wall-second per chip — for the reference's baseline chain
(`/root/reference/stream_process.py:19-30` scaled up): 1001-tap lowpass FIR,
4× polyphase upsample @ 44.1 kHz, blocksize 4096, TPDF dither, batched over
concurrent streams on one chip.  The reference achieves xRT = 1.0 by
construction (one real-time mono stream on a pinned RPi5 core), so
``vs_baseline`` is the raw xRT number.

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


def _alarm(seconds: int):
    def handler(signum, frame):
        raise BenchTimeout(f"stage exceeded {seconds}s")

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def run_config(batch: int, nblocks: int, reps: int, strategy: str) -> dict:
    import jax
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

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
    )
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))

    key = jax.random.PRNGKey(0)
    blocks = jax.random.normal(
        key, (nblocks, batch, cfg.blocksize), dtype=jnp.float32
    ) * 0.3

    print(f"bench: strategy={strategy} batch={batch} compiling...",
          file=sys.stderr, flush=True)
    # warmup / compile
    state = pipe.init_state(seed=0)
    state, out = pipe.run(params, state, blocks)
    float(jnp.sum(out))  # force full completion (remote-device safe)
    print("bench: warmup done", file=sys.stderr, flush=True)

    # timed steady-state runs (state donated each run); a scalar fetch inside
    # the timed region guarantees the device really finished (on tunneled
    # devices block_until_ready alone can return early)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, out = pipe.run(params, state, blocks)
        checksum = float(jnp.sum(out))
        times.append(time.perf_counter() - t0)
    best = min(times)
    assert np.isfinite(checksum)

    audio_seconds = batch * nblocks * cfg.blocksize / cfg.samplerate
    xrt = audio_seconds / best

    # on-hardware accuracy: one stream, dither off, vs the float64 host
    # oracle of the causal chain (upfirdn cascade, phase-0 decimation)
    err_db = None
    if os.environ.get("AFP_BENCH_CHECK", "1") != "0":
        import dataclasses

        import scipy.signal as sps

        from afp_tpu.engine import PipelineParams as PP

        ccfg = dataclasses.replace(cfg, batch=1, dither_kind="off")
        cpipe = __import__("afp_tpu.engine", fromlist=["Pipeline"]).Pipeline(ccfg)
        cparams = cpipe.device_params(PP.design(cpipe.cfg))
        rngx = np.random.default_rng(0)
        sig = (rngx.standard_normal((1, cfg.blocksize * 4)) * 0.3).astype(np.float32)
        _, out = cpipe.process_signal(cparams, cpipe.init_state(), sig)
        out = np.asarray(out)[0]
        from afp_tpu.ops.resample import streaming_kernel

        design = PP.design(cpipe.cfg)
        h_up = streaming_kernel(cfg.upsample_factor, 1)
        y = sps.upfirdn(h_up, sig[0].astype(np.float64), cfg.upsample_factor, 1)
        y = y[: sig.shape[1] * cfg.upsample_factor]
        y = np.convolve(y, design.main_taps.astype(np.float64))[: len(y)]
        gold = y[:: cfg.upsample_factor]
        err = np.max(np.abs(out - gold)) / (np.max(np.abs(gold)) + 1e-300)
        err_db = round(20 * np.log10(err + 1e-300), 1)

    return {
        "metric": "aggregate_xrt_1001tap_4x_44k1",
        "value": round(xrt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt, 1),
        "batch": batch,
        "blocksize": cfg.blocksize,
        "nblocks_per_run": nblocks,
        "strategy": strategy,
        "best_run_s": round(best, 4),
        "error_db_vs_oracle": err_db,
        "device": str(jax.devices()[0]),
    }


def main() -> None:
    batch = int(os.environ.get("AFP_BENCH_BATCH", "4096"))
    nblocks = int(os.environ.get("AFP_BENCH_BLOCKS", "64"))
    reps = int(os.environ.get("AFP_BENCH_REPS", "5"))
    strategy = os.environ.get("AFP_BENCH_STRATEGY", "td_mxu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/afp_jax_cache")

    # primary attempt, alarm-guarded (the Pallas compile through a tunneled
    # device can be slow); fall back to the FFT strategy on timeout/error.
    try:
        _alarm(780)
        result = run_config(batch, nblocks, reps, strategy)
        signal.alarm(0)
    except (BenchTimeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        print(f"bench: {strategy} failed ({e}); falling back to fft",
              file=sys.stderr, flush=True)
        _alarm(420)
        result = run_config(batch, nblocks, reps, "fft")
        signal.alarm(0)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
