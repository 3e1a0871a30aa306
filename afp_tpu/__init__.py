"""afp_tpu — a TPU-native audio DSP framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MrEstefano/Audio-Filtering-Pipeline: FIR design (windowed-sinc, Remez,
minimum-phase), and a fused streaming pipeline (polyphase resample → multiband
EQ → FIR → AGC → dither) running over HBM-resident batches of audio streams.

Layers (see SURVEY.md §1):
  design/    L1 filter design (host float64, scipy-free)
  ops/       L2 device DSP kernels (jnp + Pallas)
  engine/    L3 streaming runtime (scan pipelines, batching, presets)
  parallel/  device-mesh sharding (stream DP, time-axis halo exchange)
  runtime/   host dispatcher (native ring buffers), device enumeration
  viz/       response plots, spectra, waterfall
  ui/        headless controller mirroring the reference GUIs
"""

__version__ = "0.1.0"

from . import design

__all__ = ["design", "__version__"]
