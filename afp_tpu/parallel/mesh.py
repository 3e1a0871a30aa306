"""Device-mesh construction helpers (SURVEY.md §2.4, §5.8).

The scaling model: concurrent audio streams are embarrassingly parallel →
**stream-axis data parallelism** over ICI is the primary mesh axis
(`'streams'`); an optional `'time'` axis supports halo-exchange context
parallelism over a single long signal (§5.7).  No NCCL/MPI — XLA's native
TPU collectives via `shard_map`/`pjit`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_multislice_mesh", "P", "NamedSharding", "Mesh"]


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("streams",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first `n_devices` devices.

    1-D by default (pure stream DP).  Pass ``axis_names=('streams', 'time')``
    and a `shape` for a 2-D stream×time mesh.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.array(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def make_multislice_mesh(n_slices: Optional[int] = None,
                         devices_per_slice: Optional[int] = None) -> Mesh:
    """2-D ``('slice', 'streams')`` mesh spanning TPU slices (SURVEY.md
    §5.8 — DCN scaling).

    Streams are independent, so scaling past one ICI domain is PURE data
    parallelism: the batch axis shards over BOTH mesh axes
    (``P(('slice', 'streams'))``) and the hot path contains ZERO
    collectives on either — in particular nothing crosses the
    slice/DCN boundary (`ShardedPipeline` with this mesh; asserted
    against the compiled HLO in tests/test_parallel.py).  The reference
    analog is its inter-thread queue transport
    (`/root/reference/stream_process_EQ_GUI.py:47-48`) — here the
    "queues" are disjoint device shards that never talk at all.

    Device layout: on real multi-slice jobs (devices expose
    ``slice_index``) each mesh ROW is one slice, so the 'streams' axis
    rides ICI and the 'slice' axis is the DCN boundary.  Elsewhere
    (single slice, CPU harness) the flat device list is partitioned into
    `n_slices` contiguous groups — the same mesh topology, used by the
    multichip dryrun and the CPU test harness.
    """
    devs = jax.devices()
    groups: list = []
    if getattr(devs[0], "slice_index", None) is not None and len(
            {d.slice_index for d in devs}) > 1:
        by_slice: dict = {}
        for d in devs:
            by_slice.setdefault(d.slice_index, []).append(d)
        groups = [by_slice[k] for k in sorted(by_slice)]
        if n_slices is not None:
            if n_slices > len(groups):
                # silently returning fewer slices than asked would skew
                # every downstream batch-divisibility computation
                raise ValueError(
                    f"n_slices={n_slices} but only {len(groups)} slices "
                    "are attached")
            groups = groups[:n_slices]
        if devices_per_slice is not None:
            # trim FIRST: unequal physical slices can still form a valid
            # mesh at the trimmed width
            short = [len(g) for g in groups if len(g) < devices_per_slice]
            if short:
                raise ValueError(
                    f"devices_per_slice={devices_per_slice} exceeds the "
                    f"smallest attached slice ({min(short)})")
            groups = [g[:devices_per_slice] for g in groups]
        if len({len(g) for g in groups}) != 1:
            raise ValueError(
                f"unequal slice sizes {[len(g) for g in groups]} — pass "
                "devices_per_slice to trim to a common width")
    else:
        if n_slices is None:
            raise ValueError(
                "n_slices required when devices carry no slice_index "
                "(single-slice platform / CPU harness)")
        per = devices_per_slice or len(devs) // n_slices
        if per < 1 or n_slices * per > len(devs):
            raise ValueError(
                f"{n_slices}×{per} mesh needs {n_slices * per} devices, "
                f"have {len(devs)}")
        groups = [devs[i * per:(i + 1) * per] for i in range(n_slices)]
    return Mesh(np.array(groups), ("slice", "streams"))
