"""One-off hardware probe: the int16-output (emit='pcm16') serving rings
vs their f32-output forms, at the conv headline point ([4096, 4096],
1001-tap 4× folded chain) and the C8 AGC point ([4096, 2048], w=512).

Run from the repo root on the TPU box:

    python tools/probe_emit16.py

Reuses bench.py's timing discipline.  Prints one JSON line.
"""
import dataclasses
import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    wd = bench._device_contact_watchdog(int(os.environ.get(
        "AFP_BENCH_CONTACT_TIMEOUT", "120")))
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    assert dev.platform == "tpu", dev
    wd.cancel()

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    out = {"device": str(dev)}
    reps = 4

    # --- conv headline point: pcm16 ingest, f32 vs int16 output ---
    batch, K = 4096, 16
    ccfg = StreamConfig(
        samplerate=44100, blocksize=4096, upsample_factor=4, numtaps=1001,
        batch=batch, filter_type="lowpass", cutoff=11000.0,
        window_type="hamming", eq_enabled=False, agc_enabled=False,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=None,
        conv_strategy="td_mxu", ingest="pcm16",
    )
    blocks = jax.random.normal(
        jax.random.PRNGKey(0), (K, batch, ccfg.blocksize), dtype=jnp.float32
    ) * 0.3
    iring = (jnp.clip(jnp.round(blocks * 32768.0), -32768, 32767
                      ).astype(jnp.int16), None)
    del blocks
    for name, emit in (("f32out", "f32"), ("i16out", "pcm16")):
        cfg = dataclasses.replace(ccfg, emit=emit).validate()
        pipe = Pipeline(cfg)
        params = pipe.device_params(PipelineParams.design(pipe.cfg))
        for n_sust in (512, 2048):
            bench._alarm(900)
            if n_sust == 2048:
                xrt = bench._sustained_ring_mega_xrt(pipe, params, iring,
                                                     reps, n_sust=n_sust)
            else:
                xrt = bench._sustained_ring_xrt(pipe, params, iring, reps,
                                                n_sust=n_sust)
            signal.alarm(0)
            kind = "mega" if n_sust == 2048 else "ring"
            out[f"conv_pcm16in_{name}_{kind}{n_sust}"] = xrt

    # --- C8 AGC point: pcm16 ingest, f32 vs int16 output ---
    acfg = StreamConfig(
        samplerate=44100, blocksize=2048, upsample_factor=2, numtaps=129,
        batch=batch, cutoff=14000.0, eq_enabled=True, agc_enabled=True,
        agc_mode="exact", agc_window_size=512, agc_carry=True,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=0.99,
        conv_strategy="td_mxu", ingest="pcm16",
    )
    ablocks = jax.random.normal(
        jax.random.PRNGKey(1), (K, batch, acfg.blocksize), dtype=jnp.float32
    ) * 0.1
    airing = jnp.clip(jnp.round(ablocks * 32768.0), -32768, 32767
                      ).astype(jnp.int16)
    del ablocks
    for name, emit in (("f32out", "f32"), ("i16out", "pcm16")):
        cfg = dataclasses.replace(acfg, emit=emit).validate()
        pipe = Pipeline(cfg)
        params = pipe.device_params(PipelineParams.design(pipe.cfg))
        bench._alarm(900)
        xrt = bench._sustained_agc_ring_xrt(pipe, params, airing, reps,
                                            n_sust=2048)
        signal.alarm(0)
        out[f"agc_pcm16in_{name}_ring2048"] = xrt

    # --- host↔device transport: the bytes-halving claim, measured.
    # One engine block [4096, 4096] is 64 MiB in f32, 32 MiB in int16;
    # time host→device ingest (device_put + a scalar fetch to force it)
    # and device→host drain (np.asarray) for both dtypes. ---
    import time

    import numpy as np

    x32 = np.asarray(jax.random.normal(
        jax.random.PRNGKey(2), (4096, 4096), jnp.float32) * 0.3)
    x16 = np.clip(np.round(x32 * 32768.0), -32768, 32767).astype(np.int16)
    for name, host in (("f32", x32), ("i16", x16)):
        mb = host.nbytes / 1e6
        # warm the transfer path once
        float(jnp.sum(jax.device_put(host).astype(jnp.float32)[0, :8]))
        ts = []
        for _ in range(3):
            bench._alarm(600)
            t0 = time.perf_counter()
            d = jax.device_put(host)
            float(jnp.sum(d.astype(jnp.float32)[0, :8]))  # force arrival
            ts.append(time.perf_counter() - t0)
            signal.alarm(0)
        out[f"ingest_{name}_mb_s"] = round(mb / min(ts), 2)
        dts = []
        for _ in range(3):
            bench._alarm(600)
            t0 = time.perf_counter()
            h = np.asarray(d)
            dts.append(time.perf_counter() - t0)
            signal.alarm(0)
        assert h.nbytes == host.nbytes
        out[f"drain_{name}_mb_s"] = round(mb / min(dts), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
