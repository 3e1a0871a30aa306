"""RingServer (zero-copy serving-ring host pump) tests: ordered,
bit-exact equivalence with the classic scan path, tail handling, and
constructor validation."""
import numpy as np
import pytest

from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
from afp_tpu.runtime import RingServer

#: heavy suite — excluded from the fast pass (docs/TESTING.md tiering);
#: run the FULL suite before committing kernel/engine changes
pytestmark = pytest.mark.slow



def make_cfg(**kw):
    base = dict(
        resample_quality="fast",  # tier mechanics tested elsewhere; keep CPU CI fast
        samplerate=44100, blocksize=512, upsample_factor=1, numtaps=65,
        batch=2, filter_type="lowpass", cutoff=11000.0,
        window_type="hamming", eq_enabled=False, agc_enabled=False,
        downsample_mode="decimate", dither_kind="tpdf", output_clip=None,
        conv_strategy="td_mxu", ingest="pair",
    )
    base.update(kw)
    return StreamConfig(**base)


def test_ring_server_matches_run(rng):
    """Streaming N blocks (N not a multiple of chunk → short final
    dispatch) through RingServer must be bit-identical to Pipeline.run
    over the same blocks — same outputs, same dither key schedule, same
    carried tail."""
    import jax.numpy as jnp

    cfg = make_cfg()
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    n = 7  # 2 full chunks of 2 + one 1-block tail at slots=8, chunk=2
    blocks = (rng.normal(size=(n, cfg.batch, cfg.blocksize)) * 0.4
              ).astype(np.float32)

    from afp_tpu.ops.pallas.fir_td import split_bf16

    st, gold = pipe.run(params, pipe.init_state(seed=5),
                        split_bf16(jnp.asarray(blocks)))

    srv = RingServer(pipe, params, slots=8, chunk=2, max_inflight=2, seed=5)
    outs = list(srv.stream(iter(blocks)))
    assert len(outs) == n and srv.blocks_served == n
    np.testing.assert_array_equal(np.stack(outs), np.asarray(gold))
    # carried state matches the classic path bit-for-bit
    np.testing.assert_array_equal(np.asarray(st.conv_tail[0]),
                                  np.asarray(srv.state.conv_tail[0]))
    np.testing.assert_array_equal(np.asarray(st.key),
                                  np.asarray(srv.state.key))


def test_ring_server_mega_matches_run(rng):
    """RingServer(mega=True) dispatches through the one-launch serving
    megakernel — outputs and carried tail must stay bit-identical to
    Pipeline.run (dither off: the fused epilogue is TPU-only).  mega with
    the f32 AGC ring form or interpret+dither must be rejected."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import split_bf16

    cfg = make_cfg(dither_kind="off", eq_enabled=True, output_clip=0.9)
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    n = 7
    blocks = (rng.normal(size=(n, cfg.batch, cfg.blocksize)) * 0.4
              ).astype(np.float32)
    st, gold = pipe.run(params, pipe.init_state(seed=5),
                        split_bf16(jnp.asarray(blocks)))
    srv = RingServer(pipe, params, slots=8, chunk=2, max_inflight=2, seed=5,
                     mega=True)
    outs = list(srv.stream(iter(blocks)))
    assert len(outs) == n and srv.blocks_served == n
    np.testing.assert_array_equal(np.stack(outs), np.asarray(gold))
    np.testing.assert_array_equal(np.asarray(st.conv_tail[0]),
                                  np.asarray(srv.state.conv_tail[0]))

    with pytest.raises(ValueError, match="dither"):
        RingServer(Pipeline(make_cfg()), slots=8, chunk=2, mega=True)


def test_ring_server_pair_source_and_serve_metrics(rng):
    """A source yielding pre-split (hi, lo) pairs is accepted; serve()
    reports block count and a finite xRT."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import split_bf16

    cfg = make_cfg(dither_kind="off")
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    n = 4
    blocks = (rng.normal(size=(n, cfg.batch, cfg.blocksize)) * 0.4
              ).astype(np.float32)
    _, gold = pipe.run(params, pipe.init_state(),
                       split_bf16(jnp.asarray(blocks)))

    srv = RingServer(pipe, params, slots=8, chunk=2, max_inflight=1)
    pair_src = (split_bf16(jnp.asarray(b)) for b in blocks)
    got = []
    m = srv.serve(pair_src, got.append)
    assert m["blocks"] == n and np.isfinite(m["xrt"]) and m["xrt"] > 0
    np.testing.assert_array_equal(np.stack(got), np.asarray(gold))
    lat = m["latency"]
    assert lat["n"] == n and 0 < lat["p50_ms"] <= lat["max_ms"]
    assert lat["p50_ms"] <= lat["p95_ms"] <= lat["max_ms"]


def test_ring_server_f32_conv_ring_matches_run(rng):
    """RingServer over the f32 conv ring (single f32 ring, no AGC — the
    reference's f32 input contract with zero-copy dispatch) must be
    bit-identical to Pipeline.run, in both dispatch modes (run_ring and
    the serving megakernel)."""
    import jax.numpy as jnp

    cfg = make_cfg(ingest="f32", upsample_factor=2, numtaps=65,
                   eq_enabled=True, output_clip=0.9, dither_kind="off")
    pipe = Pipeline(cfg)
    assert pipe.supports_ring_step
    assert not pipe._pair_ingest and not pipe._conv_pair
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    n = 7
    blocks = (rng.normal(size=(n, cfg.batch, cfg.blocksize)) * 0.4
              ).astype(np.float32)
    st, gold = pipe.run(params, pipe.init_state(seed=3),
                        jnp.asarray(blocks))
    for mega in (False, True):
        srv = RingServer(pipe, params, slots=8, chunk=2, max_inflight=2,
                         seed=3, mega=mega)
        assert not srv.pair
        outs = list(srv.stream(iter(blocks)))
        assert len(outs) == n
        np.testing.assert_array_equal(np.stack(outs), np.asarray(gold))
        n_tail = st.conv_tail.shape[-1]
        np.testing.assert_array_equal(
            np.asarray(srv.state.conv_tail)[:, -n_tail:],
            np.asarray(st.conv_tail))


def test_ring_server_agc_chain_matches_run(rng, monkeypatch):
    """RingServer over the fused AGC chain (single f32 ring) must be
    bit-identical to Pipeline.run — the C8 serving mode."""
    import jax.numpy as jnp

    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    cfg = make_cfg(
        ingest="f32", blocksize=256, upsample_factor=2, numtaps=33,
        batch=1024, eq_enabled=True, agc_enabled=True, agc_mode="exact",
        agc_window_size=64, agc_carry=True, dither_kind="tpdf",
        output_clip=0.99,
    )
    pipe = Pipeline(cfg)
    assert pipe._conv_pair and pipe.supports_ring_step
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    n = 5
    blocks = (rng.normal(size=(n, cfg.batch, cfg.blocksize)) * 0.1
              ).astype(np.float32)
    st, gold = pipe.run(params, pipe.init_state(seed=4),
                        jnp.asarray(blocks))

    srv = RingServer(pipe, params, slots=8, chunk=2, max_inflight=2, seed=4)
    assert not srv.pair
    outs = list(srv.stream(iter(blocks)))
    np.testing.assert_array_equal(np.stack(outs), np.asarray(gold))
    np.testing.assert_array_equal(np.asarray(st.agc_gain),
                                  np.asarray(srv.state.agc_gain))


def test_ring_server_sharded_pipeline(rng):
    """RingServer drives a ShardedPipeline unchanged (the multi-chip
    serving surface): rings placed with the published ring_sharding,
    outputs and carried tail bit-identical to ShardedPipeline.run —
    including the per-shard dither key folds — in both dispatch modes."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import split_bf16
    from afp_tpu.parallel import ShardedPipeline, make_mesh

    cfg = make_cfg(batch=4)
    sp = ShardedPipeline(cfg, make_mesh(2, axis_names=("streams",)))
    params = sp.device_params(PipelineParams.design(sp.cfg))
    n = 5
    blocks = (rng.normal(size=(n, cfg.batch, cfg.blocksize)) * 0.4
              ).astype(np.float32)
    st, gold = sp.run(params, sp.init_state(seed=5),
                      split_bf16(jnp.asarray(blocks)))
    srv = RingServer(sp, params, slots=8, chunk=2, max_inflight=2, seed=5)
    outs = list(srv.stream(iter(blocks)))
    assert len(outs) == n
    np.testing.assert_array_equal(np.stack(outs), np.asarray(gold))
    np.testing.assert_array_equal(np.asarray(st.conv_tail[0]),
                                  np.asarray(srv.state.conv_tail[0]))

    # megakernel dispatch over the mesh (dither off: fused epilogue is
    # TPU-only)
    mcfg = make_cfg(batch=4, dither_kind="off")
    spm = ShardedPipeline(mcfg, make_mesh(2, axis_names=("streams",)))
    mparams = spm.device_params(PipelineParams.design(spm.cfg))
    _, mgold = spm.run(mparams, spm.init_state(seed=5),
                       split_bf16(jnp.asarray(blocks)))
    msrv = RingServer(spm, mparams, slots=8, chunk=2, seed=5, mega=True)
    mouts = list(msrv.stream(iter(blocks)))
    np.testing.assert_array_equal(np.stack(mouts), np.asarray(mgold))


def test_ring_server_validation():
    cfg = make_cfg()
    pipe = Pipeline(cfg)
    with pytest.raises(ValueError, match="divide"):
        RingServer(pipe, slots=8, chunk=3)
    with pytest.raises(ValueError, match="undrained"):
        RingServer(pipe, slots=8, chunk=4, max_inflight=2)
    f32 = Pipeline(make_cfg(ingest="f32", dither_kind="off",
                            conv_strategy="fft"))
    with pytest.raises(ValueError, match="ring-capable"):
        RingServer(f32)
