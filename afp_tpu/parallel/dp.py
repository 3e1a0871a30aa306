"""Stream-axis data parallelism (SURVEY.md §2.4 "batch/channel DP").

The reference processes ONE mono stream on one pinned CPU core
(`/root/reference/stream_process.py:17, 22`).  Here the batch of concurrent
streams is sharded over the device mesh with `shard_map`; the pipeline step
runs unchanged per shard (it is batch-size-agnostic), and — streams being
independent — no collectives appear in the hot path.  The only cross-device
touch is folding the mesh position into the dither key so streams on
different devices draw decorrelated noise.

Multi-slice scaling (DCN) is the same picture: pure DP over streams needs
zero cross-slice communication (§5.8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.config import PipelineParams, StreamConfig
from ..engine.pipeline import DeviceParams, Pipeline, StreamState

__all__ = ["ShardedPipeline"]


def _state_spec(state: StreamState, batch: int) -> StreamState:
    """PartitionSpec pytree for a StreamState: leaves with a leading batch
    axis shard on 'streams'; the RNG key replicates."""

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == batch:
            return P("streams", *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map(spec, state)


class ShardedPipeline:
    """A Pipeline whose batch axis is sharded over a 1-D 'streams' mesh.

    ``cfg.batch`` is the GLOBAL stream count and must divide evenly over the
    mesh.  Params are replicated; state and blocks are sharded.  Usage::

        mesh = make_mesh(8)
        sp = ShardedPipeline(cfg, mesh)
        params = sp.device_params(PipelineParams.design(sp.cfg))
        state = sp.init_state()
        state, out = sp.step(params, state, blocks)   # blocks: [B_global, L]
    """

    def __init__(self, cfg: StreamConfig, mesh: Mesh):
        cfg = cfg.validate()
        if "streams" not in mesh.axis_names:
            raise ValueError("mesh must have a 'streams' axis")
        n_shards = mesh.shape["streams"]
        if cfg.batch % n_shards:
            raise ValueError(
                f"global batch {cfg.batch} must divide over {n_shards} devices"
            )
        self.mesh = mesh
        self.n_shards = n_shards
        # the inner pipeline is built at per-shard batch (shapes inside
        # shard_map are the local shard shapes)
        import dataclasses

        self.local_cfg = dataclasses.replace(cfg, batch=cfg.batch // n_shards)
        self.cfg = cfg
        self.pipeline = Pipeline(self.local_cfg)

        state_example = self.pipeline.init_state()
        sspec = _state_spec(state_example, self.local_cfg.batch)
        bspec = P("streams", None)

        def param_spec(leaf):
            # per-stream parameter banks (e.g. eq_gains [B_global, n_bands])
            # shard on 'streams'; everything else replicates
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cfg.batch:
                return P("streams", *([None] * (leaf.ndim - 1)))
            return P()

        self._param_spec = param_spec

        self._sspec = sspec
        self._bspec = bspec
        self._exec_cache = {}

    def _get_exec(self, params: DeviceParams):
        """Build (lazily, cached) the shard_map'd step/run for this params
        structure — per-stream banks ([B_global, …] leaves) shard on
        'streams', shared banks replicate."""
        pspec = jax.tree_util.tree_map(self._param_spec, params)
        key = tuple(
            getattr(l, "shape", None) for l in jax.tree_util.tree_leaves(params)
        )
        if key in self._exec_cache:
            return self._exec_cache[key]
        mesh, sspec, bspec = self.mesh, self._sspec, self._bspec

        def local_step(params, state, block):
            # decorrelate dither across shards: fold the mesh position in
            idx = jax.lax.axis_index("streams")
            state = state._replace(key=jax.random.fold_in(state.key, idx))
            return self.pipeline._step_impl(params, state, block)

        step = jax.jit(
            jax.shard_map(
                local_step,
                mesh=mesh,
                in_specs=(pspec, sspec, bspec),
                out_specs=(sspec, bspec),
                check_vma=False,
            ),
            donate_argnums=(1,),
        )

        def local_run(params, state, blocks):
            idx = jax.lax.axis_index("streams")
            state = state._replace(key=jax.random.fold_in(state.key, idx))

            def body(carry, blk):
                return self.pipeline._step_impl(params, carry, blk)

            return jax.lax.scan(body, state, blocks)

        run = jax.jit(
            jax.shard_map(
                local_run,
                mesh=mesh,
                in_specs=(pspec, sspec, P(None, "streams", None)),
                out_specs=(sspec, P(None, "streams", None)),
                check_vma=False,
            ),
            donate_argnums=(1,),
        )
        self._exec_cache[key] = (step, run)
        return step, run

    # ---- public surface (global shapes) ----

    def device_params(self, p: PipelineParams) -> DeviceParams:
        return self.pipeline.device_params(p)

    def init_state(self, seed: int = 0) -> StreamState:
        """Global state: per-shard states concatenated on the batch axis."""
        local = self.pipeline.init_state(seed=seed)

        def widen(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == self.local_cfg.batch:
                reps = (self.n_shards,) + (1,) * (leaf.ndim - 1)
                return jnp.tile(leaf, reps)
            return leaf

        wide = jax.tree_util.tree_map(widen, local)
        return self._place_state(wide)

    def _place_state(self, state: StreamState) -> StreamState:
        sspec = _state_spec(state, self.cfg.batch)

        def place(leaf, spec):
            return jax.device_put(leaf, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map(place, state, sspec)

    def step(self, params: DeviceParams, state: StreamState, blocks: jnp.ndarray):
        """[B_global, L] in → ([B_global, L] out, state)."""
        step, _ = self._get_exec(params)
        return step(params, state, blocks)

    def run(self, params: DeviceParams, state: StreamState, blocks: jnp.ndarray):
        """[T, B_global, L] in → ([T, B_global, L] out, state)."""
        _, run = self._get_exec(params)
        return run(params, state, blocks)
