import dataclasses
import numpy as np, jax, jax.numpy as jnp
from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
from afp_tpu.engine.batch import with_per_stream_gains

base = StreamConfig(
    samplerate=44100, blocksize=2048, upsample_factor=2, numtaps=129,
    batch=256, eq_enabled=True, agc_enabled=False,
    downsample_mode="decimate", dither_kind="off", output_clip=0.99,
    conv_strategy="td_mxu",
)
gains = np.tile(np.linspace(0.5, 2.0, 9, dtype=np.float32), (256, 1))
x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (256, 2048), jnp.float32) * 0.3)

outs = {}
for strat in ("td_mxu", "fft"):
    cfg = dataclasses.replace(base, conv_strategy=strat)
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    psp = with_per_stream_gains(pipe, params, gains)
    _, y = pipe.step(psp, pipe.init_state(), x)
    outs[strat] = np.asarray(y)
    casc = np.asarray(params.casc_bands) if params.casc_bands is not None else None

# oracle for stream 135 from the td cascades (both strategies share p.eq_taps)
cfg = dataclasses.replace(base, conv_strategy="td_mxu")
pipe = Pipeline(cfg)
params = pipe.device_params(PipelineParams.design(pipe.cfg))
casc = np.asarray(params.casc_bands)
b = 135
N = casc.shape[1]
ext = np.concatenate([np.zeros(N - 1), x[b].astype(np.float64)])
acc = np.zeros(2048)
for k in range(9):
    acc += gains[b, k] * np.convolve(ext, casc[k].astype(np.float64), "valid")
gold = np.clip(acc, -0.99, 0.99)
for strat, y in outs.items():
    e = np.max(np.abs(y[b] - gold)) / np.max(np.abs(gold))
    print(f"{strat} vs float64 oracle (stream {b}): {20*np.log10(e+1e-300):.1f} dB")
