"""One-off hardware probe: the C8 fused-AGC serving ring with raw int16
PCM ingest vs the f32 ring, at the bench operating point ([4096, 2048],
w=512, 9-band EQ + 129-tap FIR, 2× upsample folded).

Run from the repo root on the TPU box:

    python tools/probe_pcm16_agc.py [n_sust ...]

Reuses bench.py's timing discipline (chained scalar-checksum fetches,
device-contact watchdog, SIGALRM stage guards).  Prints one JSON line.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (timing helpers + watchdog)


def main() -> None:
    n_susts = [int(a) for a in sys.argv[1:]] or [512, 2048]
    wd = bench._device_contact_watchdog(int(os.environ.get(
        "AFP_BENCH_CONTACT_TIMEOUT", "120")))
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    assert dev.platform == "tpu", dev
    wd.cancel()  # first contact succeeded

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    batch, K, reps = 4096, 16, 4
    cfg = StreamConfig(
        samplerate=44100, blocksize=2048, upsample_factor=2, numtaps=129,
        batch=batch, cutoff=14000.0, eq_enabled=True, agc_enabled=True,
        agc_mode="exact", agc_window_size=512, agc_carry=True,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=0.99,
        conv_strategy="td_mxu",
    )
    blocks = jax.random.normal(
        jax.random.PRNGKey(1), (K, batch, cfg.blocksize), dtype=jnp.float32
    ) * 0.1
    iblocks = jnp.clip(jnp.round(blocks * 32768.0), -32768, 32767
                       ).astype(jnp.int16)
    out = {"device": str(dev)}
    for name, icfg, blk in (("f32", cfg,
                             blocks),
                            ("pcm16", dataclasses.replace(cfg,
                                                          ingest="pcm16"),
                             iblocks)):
        pipe = Pipeline(icfg)
        assert pipe.supports_ring_step, name
        params = pipe.device_params(PipelineParams.design(pipe.cfg))
        for n_sust in n_susts:
            bench._alarm(900)
            xrt = bench._sustained_agc_ring_xrt(pipe, params, blk, reps,
                                                n_sust=n_sust)
            import signal

            signal.alarm(0)
            out[f"agc_ring_{name}_{n_sust}"] = xrt
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
