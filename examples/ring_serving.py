#!/usr/bin/env python
"""Zero-copy serving rings — the throughput-first production loop (r3).

The headline operating point (1001-tap lowpass, 4x upsample folded to one
base-rate cascade, tpdf dither) served through `RingServer`: blocks land
in donated HBM input-ring slots, each device dispatch advances a chunk of
blocks with the conv kernel reading/writing ring slots in place
(`Pipeline.run_ring`), and outputs drain in order while later chunks are
already queued.  On a TPU v5e this mode measures 924k× realtime
(docs/BENCHMARKS.md "Zero-copy serving rings").

Run: python examples/ring_serving.py [--streams 64] [--blocks 32] [--mega]

`--mega` dispatches each chunk through the one-launch serving megakernel
(`Pipeline.run_ring_mega`): the whole chunk runs inside a single Pallas
kernel — bit-identical output, fewer launches.  (Off-TPU the fused dither
epilogue has no interpret lowering, so `--mega` switches dither off.)

`--pcm16` serves raw int16 PCM blocks (``ingest='pcm16'`` — the source
format of WAV files and sound-card DMA): the input ring holds int16, the
kernel converts (n/32768, exact) and splits in VMEM, and the ingest
bytes halve.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if _os.environ.get("AFP_FORCE_CPU"):  # the axon plugin ignores JAX_PLATFORMS
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
import argparse
import time

import numpy as np

from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
from afp_tpu.runtime import RingServer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--mega", action="store_true",
                    help="one-launch megakernel dispatch (run_ring_mega)")
    ap.add_argument("--pcm16", action="store_true",
                    help="serve raw int16 PCM blocks (ingest='pcm16')")
    ap.add_argument("--retune", action="store_true",
                    help="swap the filter design mid-serve — glitch-free "
                         "live reconfiguration ON the rings (r5): the new "
                         "bank is designed on this thread and takes effect "
                         "atomically at the next chunk dispatch")
    args = ap.parse_args()
    dither = "tpdf"
    if args.mega:
        import jax

        if jax.default_backend() != "tpu":
            # gate on the ACTUAL backend, not the AFP_FORCE_CPU env var:
            # the fused dither epilogue has no interpret lowering, so
            # mega off-TPU requires dither off (RingServer enforces it)
            dither = "off"

    cfg = StreamConfig(
        samplerate=44100,
        blocksize=4096,
        upsample_factor=4,
        numtaps=1001,
        batch=args.streams,
        filter_type="lowpass",
        cutoff=11000.0,
        window_type="hamming",
        eq_enabled=False,
        agc_enabled=False,
        downsample_mode="decimate",
        dither_kind=dither,
        output_clip=None,
        conv_strategy="td_mxu",
        ingest="pcm16" if args.pcm16 else "pair",
    )
    pipe = Pipeline(cfg)
    srv = RingServer(pipe, slots=4 * args.chunk, chunk=args.chunk,
                     mega=args.mega)

    rng = np.random.default_rng(0)
    blocks = (rng.standard_normal(
        (args.blocks, args.streams, cfg.blocksize)) * 0.3).astype(np.float32)
    if args.pcm16:
        # the pcm16 contract: the source data IS 16-bit PCM
        blocks = np.clip(np.round(blocks * 32768.0), -32768, 32767
                         ).astype(np.int16)

    # warm-up dispatch (compile), then the timed serve
    _ = list(srv.stream(iter(blocks[: args.chunk])))
    source = iter(blocks)
    if args.retune:
        import dataclasses

        half = args.blocks // 2

        def source():
            for i, b in enumerate(blocks):
                if i == half:
                    srv.retune(dataclasses.replace(cfg, cutoff=6000.0))
                    print(f"retuned to 6 kHz at block {i} "
                          "(effective next chunk)")
                yield b
        source = source()
    peak = [0.0]
    t0 = time.time()
    m = srv.serve(source, lambda out: peak.__setitem__(
        0, max(peak[0], float(np.max(np.abs(out))))))
    print(f"served {m['blocks']} blocks x {args.streams} streams "
          f"in {m['wall_s']:.3f}s -> {m['xrt']:.0f}x realtime "
          f"(peak out {peak[0]:.3f})")
    assert m["blocks"] == args.blocks
    print(f"total wall (incl. warmup): {time.time() - t0:.3f}s")


if __name__ == "__main__":
    main()
