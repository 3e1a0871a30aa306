"""Hand-written Pallas TPU kernels (alternative execution strategies for the
hot ops; each has an XLA-path equivalence test)."""
from .fir_td import (PRECISION_MODE, band_matrix, fir_conv_xla, fir_td_mxu,
                     fir_td_mxu_per_stream, wide_band_matrix)

__all__ = ["band_matrix", "wide_band_matrix", "fir_td_mxu",
           "fir_td_mxu_per_stream", "fir_conv_xla", "PRECISION_MODE"]
