import os
os.environ["AFP_AGC_FUSED_FORCE"] = "1"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

cfg = StreamConfig(samplerate=44100, blocksize=512, upsample_factor=2, numtaps=33,
    batch=1024, eq_enabled=True, agc_enabled=True, agc_mode="exact",
    agc_window_size=256, agc_carry=True, dither_kind="tpdf",
    output_clip=0.99, conv_strategy="td_mxu", ingest="pcm16").validate()
rng = np.random.default_rng(4242)
p = Pipeline(cfg)
pp = p.device_params(PipelineParams.design(cfg))
K, n_steps, start = 4, 6, 2
ring_np = rng.integers(-32768, 32768, size=(K, 1024, 512), dtype=np.int16)
ring = jnp.asarray(ring_np)
st, ref = p.init_state(seed=7), []
for i in range(n_steps):
    st, y = p._step_impl(pp, st, jnp.asarray(ring_np[(start + i) % K]))
    ref.append(np.asarray(y))
st2 = p.init_state(seed=7)
out = jnp.zeros((K, 1024, 512), jnp.float32)
for i in range(n_steps):
    st2, out = p._ring_step_impl(pp, st2, ring, None, (start + i) % K, out)
    a = np.asarray(out)[(start + i) % K]
    d = np.abs(a - ref[i])
    print(i, "max", d.max(), "frac", (d > 1e-7).mean(),
          "first bad col", np.argwhere(d.max(0) > 1e-7)[:3].ravel() if d.max() > 1e-7 else None)
