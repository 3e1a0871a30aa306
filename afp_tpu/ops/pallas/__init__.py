"""Hand-written Pallas TPU kernels (alternative execution strategies for the
hot ops; each has an XLA-path equivalence test)."""
from .fir_td import band_matrix, fir_conv_xla, fir_td_mxu

__all__ = ["band_matrix", "fir_td_mxu", "fir_conv_xla"]
