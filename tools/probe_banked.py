#!/usr/bin/env python
"""Decompose the per-step banked ring gap (VERDICT r4 #3, r5 follow-up).

r5 measured the resident-bank fix at 0.999x of the per-tile form — band
DMA is NOT the gap.  This probe separates the remaining candidates by
timing the per-step f32 serving ring at the headline shape:

  shared     — the plain shared-band kernel (baseline ~1.13M-class)
  banked D=1 — banked machinery, ONE design (selection overhead alone)
  banked D=4 — the shipping leg (selection + multi-design)
  noband     — banked D=1 with the in-loop band REBUILD hoisted out
               (isolates `_banked_operands` recomputation inside the scan)

Run on the TPU: python tools/probe_banked.py
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
    from afp_tpu.engine.batch import with_per_stream_filters

    batch = int(os.environ.get("AFP_BENCH_BATCH", "4096"))
    n_sust = int(os.environ.get("AFP_BENCH_SUSTAIN", "512"))
    K = 16
    cfg = StreamConfig(
        samplerate=44100, blocksize=4096, upsample_factor=4, numtaps=1001,
        batch=batch, filter_type="lowpass", cutoff=11000.0,
        window_type="hamming", eq_enabled=False, agc_enabled=False,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=None,
        conv_strategy="td_mxu", resample_quality="vhq",
    )
    rng = np.random.default_rng(2)
    base = rng.standard_normal((batch, cfg.blocksize), dtype=np.float32) * 0.3
    ring = jnp.broadcast_to(jnp.asarray(base),
                            (K, batch, cfg.blocksize)) + 0.0

    def timeit(label, pipe, params):
        st = pipe.init_state(seed=0)
        rg = jnp.zeros((K, batch, cfg.blocksize), jnp.float32)
        st, rg = pipe.run_ring(params, st, ring, None, rg, n_sust)
        float(jnp.sum(rg))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            st, rg = pipe.run_ring(params, st, ring, None, rg, n_sust)
            float(jnp.sum(rg))
            best = min(best, time.perf_counter() - t0)
        xrt = n_sust * batch * cfg.blocksize / cfg.samplerate / best
        print(f"{label:>28}: best={best:.4f}s xrt={xrt:,.0f}", flush=True)
        return xrt

    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    timeit("shared", pipe, params)

    for mode in ("1", "0"):
        os.environ["AFP_BANKED_RESIDENT"] = mode
        p1 = Pipeline(cfg)
        b1 = with_per_stream_filters(p1, [dict()] * batch)  # ONE design
        assert b1.casc_bank.shape[0] == 1
        timeit(f"banked D=1 resident={mode}", p1, b1)
        p4 = Pipeline(cfg)
        cuts = [8000.0, 10000.0, 11000.0, 12000.0]
        b4 = with_per_stream_filters(
            p4, [dict(cutoff=cuts[4 * i // batch]) for i in range(batch)])
        timeit(f"banked D=4 resident={mode}", p4, b4)
    os.environ.pop("AFP_BANKED_RESIDENT", None)


if __name__ == "__main__":
    main()


def bt_sweep():
    """Part 2: banked D=4 at smaller batch tiles — if the gap is VMEM
    pressure killing double-buffering at the picked tile, a smaller bt
    restores it."""
    import jax.numpy as jnp

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
    from afp_tpu.engine.batch import with_per_stream_filters

    batch = int(os.environ.get("AFP_BENCH_BATCH", "4096"))
    n_sust = int(os.environ.get("AFP_BENCH_SUSTAIN", "512"))
    K = 16
    cfg = StreamConfig(
        samplerate=44100, blocksize=4096, upsample_factor=4, numtaps=1001,
        batch=batch, filter_type="lowpass", cutoff=11000.0,
        window_type="hamming", eq_enabled=False, agc_enabled=False,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=None,
        conv_strategy="td_mxu", resample_quality="vhq",
    )
    rng = np.random.default_rng(2)
    base = rng.standard_normal((batch, cfg.blocksize), dtype=np.float32) * 0.3
    ring = jnp.broadcast_to(jnp.asarray(base),
                            (K, batch, cfg.blocksize)) + 0.0
    import time as _t

    cuts = [8000.0, 10000.0, 11000.0, 12000.0]
    for mode in ("1", "0"):
        os.environ["AFP_BANKED_RESIDENT"] = mode
        for bt in (128, 64, 32):
            p = Pipeline(cfg)
            try:
                b = with_per_stream_filters(
                    p, [dict(cutoff=cuts[4 * i // batch])
                        for i in range(batch)], bt=bt)
            except ValueError as e:
                print(f"bt={bt}: {e}", flush=True)
                continue
            st = p.init_state(seed=0)
            rg = jnp.zeros((K, batch, cfg.blocksize), jnp.float32)
            st, rg = p.run_ring(b, st, ring, None, rg, n_sust)
            float(jnp.sum(rg))
            best = np.inf
            for _ in range(3):
                t0 = _t.perf_counter()
                st, rg = p.run_ring(b, st, ring, None, rg, n_sust)
                float(jnp.sum(rg))
                best = min(best, _t.perf_counter() - t0)
            xrt = n_sust * batch * cfg.blocksize / cfg.samplerate / best
            print(f"banked D=4 resident={mode} bt={bt}: best={best:.4f}s "
                  f"xrt={xrt:,.0f}", flush=True)
    os.environ.pop("AFP_BANKED_RESIDENT", None)


if __name__ == "__main__":
    if os.environ.get("AFP_PROBE_BT"):
        bt_sweep()
