"""Parallelism layer: stream-axis DP, time-axis halo exchange, mesh helpers."""
from .dp import ShardedPipeline
from .halo import halo_convolve, halo_convolve_sharded
from .mesh import Mesh, NamedSharding, P, make_mesh

__all__ = [
    "ShardedPipeline",
    "halo_convolve",
    "halo_convolve_sharded",
    "make_mesh",
    "Mesh",
    "NamedSharding",
    "P",
]
