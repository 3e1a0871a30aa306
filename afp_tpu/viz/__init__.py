"""L4 visualization: response plots, waterfall rendering."""
from .plot_filter import plot_filter_response
from .waterfall import plot_waterfall

__all__ = ["plot_filter_response", "plot_waterfall"]
