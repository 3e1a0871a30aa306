"""Single-kernel AGC (ops/pallas/agc_fused.py): kernel-level equivalence to
the composite reference chain, the float64 oracle bound, and the pipeline
integration (staged step ≡ serving ring, one- vs two-kernel accuracy)."""
import numpy as np
import pytest

import jax.numpy as jnp

from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
from afp_tpu.ops.agc import desired_gain, moving_rms, smooth_gain_scan
from afp_tpu.ops.pallas.agc_fused import (agc_rms_apply_pallas,
                                          fused_rms_supported,
                                          pick_sub_fused)
from afp_tpu.ops.pallas.fir_td import merge_bf16

#: heavy suite — excluded from the fast pass (docs/TESTING.md tiering);
#: run the FULL suite before committing kernel/engine changes
pytestmark = pytest.mark.slow



@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def composite(x, w, a_att, a_rel, target, max_gain, init, oc):
    """The exact chain the kernel fuses (reference semantics,
    `stream_process_AGC.py:43-89` + the engine's clip/apply)."""
    rms = moving_rms(x, w)
    d = desired_gain(rms, target, max_gain)
    g = smooth_gain_scan(d, a_att, a_rel, init=init)
    g = jnp.clip(g, 0.1, max_gain)
    return jnp.clip(x * g, -oc, oc), g[..., -1]


def f64_oracle(x, w, a_att, a_rel, target, max_gain, init, oc):
    x = np.asarray(x, np.float64)
    B, T = x.shape
    sq = x * x
    box = np.ones(w) / w
    ss = np.stack([np.convolve(r, box, "same") for r in sq])
    rms = np.sqrt(np.maximum(ss, 0))
    d = np.clip(target / (rms + 1e-10), 0, max_gain)
    g = np.empty_like(d)
    g[:, 0] = d[:, 0] if init is None else (
        np.where(d[:, 0] > init, a_att, a_rel) * d[:, 0]
        + (1 - np.where(d[:, 0] > init, a_att, a_rel)) * init)
    for t in range(1, T):
        a = np.where(d[:, t] > g[:, t - 1], a_att, a_rel)
        g[:, t] = a * d[:, t] + (1 - a) * g[:, t - 1]
    g = np.clip(g, 0.1, max_gain)
    return np.clip(x * g, -oc, oc), g[:, -1]


def test_gate_shapes():
    assert fused_rms_supported(4096, 2048, 512, 256)
    assert fused_rms_supported(1024, 256, 256, 128)
    assert not fused_rms_supported(1024, 256, 128, 64)   # w < 2·TC
    assert not fused_rms_supported(1024, 256, 384, 192)  # w % 256 != 0
    assert not fused_rms_supported(1024, 250, 256, 128)  # T % 128 != 0
    assert not fused_rms_supported(1000, 256, 256, 128)  # B untileable
    assert not fused_rms_supported(1024, 256, 256, 127)  # centering
    # C8 point: three input views cap the tile at 16 sublanes
    assert pick_sub_fused(4096, 512) == 16


@pytest.mark.parametrize("B,T,w,use_init", [
    (1024, 256, 256, False),
    (1024, 512, 512, True),
    (2048, 1024, 512, False),
    (1024, 384, 256, True),
    (1024, 256, 512, False),   # window wider than the block
])
def test_fused_matches_composite(rng, B, T, w, use_init):
    x = jnp.asarray((rng.normal(size=(B, T)) * 0.2).astype(np.float32))
    # adversarial loud-then-quiet row: stresses window-locality of the
    # chunk-prefix sums (a block-long running cumsum would fail here)
    x = x.at[0, : T // 2].set(0.95).at[0, T // 2:].set(1e-4)
    init = (jnp.asarray(rng.uniform(0.2, 5.0, size=B).astype(np.float32))
            if use_init else None)
    y_ref, gl_ref = composite(x, w, 0.02, 0.002, 0.1, 10.0, init, 0.99)
    y, gl = agc_rms_apply_pallas(x, w, 0.02, 0.002, 0.1, 10.0, init=init,
                                 out_clip=0.99, interpret=True)
    # both sides are f32 chains differing only in boxcar summation order;
    # the fft path's own error dominates the diff
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_ref),
                               rtol=2e-4, atol=2e-5)

    # pair emit: merge(hi, lo) == split_bf16 semantics of the f32 output
    (yh, yl), gl2 = agc_rms_apply_pallas(x, w, 0.02, 0.002, 0.1, 10.0,
                                         init=init, out_clip=0.99,
                                         emit_split=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(gl2), np.asarray(gl))
    merged = np.asarray(merge_bf16(yh, yl))
    err = np.max(np.abs(merged - np.asarray(y)))
    assert err <= np.max(np.abs(np.asarray(y))) * 2 ** -16


def test_fused_vs_f64_oracle(rng):
    """The fused window sums are window-local f32 (≈2⁻²⁴) — the whole
    chain must sit at the −100 dB class against a float64 replica,
    including the loud-then-quiet adversarial row."""
    B, T, w = 1024, 512, 512
    x = (rng.normal(size=(B, T)) * 0.2).astype(np.float32)
    x[0, : T // 2] = 0.95
    x[0, T // 2:] = 1e-4
    y64, gl64 = f64_oracle(x, w, 0.02, 0.002, 0.1, 10.0, None, 0.99)
    y, gl = agc_rms_apply_pallas(jnp.asarray(x), w, 0.02, 0.002, 0.1, 10.0,
                                 init=None, out_clip=0.99, interpret=True)
    err = np.max(np.abs(np.asarray(y, np.float64) - y64)) / np.max(np.abs(y64))
    assert 20 * np.log10(max(err, 1e-300)) < -100, err
    gerr = np.max(np.abs(np.asarray(gl, np.float64) - gl64))
    assert gerr < 1e-4, gerr


def test_fused_streaming_carry_matches_one_shot_gain_walk(rng):
    """Block-streamed fused AGC with the clipped-gain carry must equal the
    same blocks pushed through the composite with the same carry rule
    (the per-block RMS restart is the reference semantic — RMS state
    never crosses blocks, only the gain does)."""
    B, T, w = 1024, 256, 256
    sig = (rng.normal(size=(4, B, T)) * 0.3).astype(np.float32)
    gl = None
    gl_ref = None
    for b in sig:
        xb = jnp.asarray(b)
        y, gl = agc_rms_apply_pallas(xb, w, 0.02, 0.002, 0.1, 10.0,
                                     init=gl, out_clip=0.99, interpret=True)
        y_ref, gl_ref = composite(xb, w, 0.02, 0.002, 0.1, 10.0, gl_ref,
                                  0.99)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_ref),
                                   rtol=2e-4, atol=2e-5)


def _c8_cfg(**kw):
    base = dict(
        resample_quality="fast",  # tier mechanics tested elsewhere; keep CPU CI fast
        samplerate=44100, blocksize=512, upsample_factor=2, numtaps=33,
        batch=1024, eq_enabled=True, agc_enabled=True, agc_mode="exact",
        agc_window_size=256, agc_carry=True, dither_kind="tpdf",
        output_clip=0.99, conv_strategy="td_mxu",
    )
    base.update(kw)
    return StreamConfig(**base)


def test_pipeline_gate(monkeypatch):
    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    monkeypatch.setenv("AFP_AGC_ONE_KERNEL", "1")
    assert Pipeline(_c8_cfg())._agc_one_kernel
    # window clamped to blocksize//2=128 < 2·TC → off
    assert not Pipeline(_c8_cfg(blocksize=256))._agc_one_kernel
    assert not Pipeline(_c8_cfg(agc_window_size=64))._agc_one_kernel


def test_pipeline_one_vs_two_kernel(rng, monkeypatch):
    """The one-kernel AGC path against the two-kernel path it replaces:
    the diff is the two-kernel boxcar's bf16-split error (≈2⁻¹⁷,
    window-local on both sides) — assert the −95 dB class on the chain
    output (measured −102 dB)."""
    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    monkeypatch.setenv("AFP_AGC_ONE_KERNEL", "1")
    cfg = _c8_cfg()
    sig = (rng.normal(size=(3, 1024, 512)) * 0.1).astype(np.float32)

    p = Pipeline(cfg)
    assert p._agc_one_kernel and p._conv_pair
    pp = p.device_params(PipelineParams.design(p.cfg))
    st = p.init_state(seed=9)
    ref = []
    for b in sig:
        st, y = p._step_impl(pp, st, jnp.asarray(b))
        ref.append(np.asarray(y))

    p2 = Pipeline(cfg)
    p2._agc_one_kernel = False  # force the legacy two-kernel path
    pp2 = p2.device_params(PipelineParams.design(p2.cfg))
    st2 = p2.init_state(seed=9)
    for i, b in enumerate(sig):
        st2, y2 = p2._step_impl(pp2, st2, jnp.asarray(b))
        diff = np.max(np.abs(np.asarray(y2) - ref[i]))
        peak = np.max(np.abs(ref[i]))
        assert diff <= peak * 10 ** (-95 / 20), (i, diff, peak)


def test_pipeline_one_kernel_ring_matches_step(rng, monkeypatch):
    """Serving-ring form of the one-kernel AGC ≡ the staged step,
    bit-exact (same kernel, slot-select BlockSpec only), including the
    gain carry, pair conv tail, and key walk — and run_ring over the same
    ring reproduces it in one dispatch."""
    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    monkeypatch.setenv("AFP_AGC_ONE_KERNEL", "1")
    cfg = _c8_cfg()
    sig = (rng.normal(size=(3, 1024, 512)) * 0.1).astype(np.float32)

    p = Pipeline(cfg)
    assert p._agc_one_kernel and p.supports_ring_step
    pp = p.device_params(PipelineParams.design(p.cfg))
    st = p.init_state(seed=9)
    ref = []
    for b in sig:
        st, y = p._step_impl(pp, st, jnp.asarray(b))
        ref.append(np.asarray(y))

    ring = jnp.asarray(sig)
    out_ring = jnp.zeros(sig.shape, jnp.float32)
    st2 = p.init_state(seed=9)
    for i in range(3):
        st2, out_ring = p._ring_step_impl(pp, st2, ring, None, i, out_ring)
        np.testing.assert_array_equal(np.asarray(out_ring)[i], ref[i])
    np.testing.assert_array_equal(np.asarray(st.agc_gain),
                                  np.asarray(st2.agc_gain))
    np.testing.assert_array_equal(np.asarray(st.conv_tail[0]),
                                  np.asarray(st2.conv_tail[0]))
    np.testing.assert_array_equal(np.asarray(st.key), np.asarray(st2.key))

    st3 = p.init_state(seed=9)
    out2 = jnp.zeros(sig.shape, jnp.float32)
    st3, out2 = p.run_ring(pp, st3, ring, None, out2, 3)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(out2)[i], ref[i])
    np.testing.assert_array_equal(np.asarray(st.agc_gain),
                                  np.asarray(st3.agc_gain))


def test_sharded_one_kernel_agc(rng, monkeypatch):
    """One-kernel AGC under shard_map (2-device stream-DP): sharded run
    and sharded serving ring both match, bit-exact to each other."""
    import jax
    from jax.sharding import Mesh

    from afp_tpu.parallel.dp import ShardedPipeline

    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    monkeypatch.setenv("AFP_AGC_ONE_KERNEL", "1")
    devs = jax.devices()[:2]
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.asarray(devs), ("streams",))
    cfg = _c8_cfg(batch=2048)
    sp = ShardedPipeline(cfg, mesh)
    assert sp.pipeline._agc_one_kernel and sp.pipeline.supports_ring_step
    params = sp.device_params(PipelineParams.design(sp.cfg))
    K = 3
    blocks = (rng.normal(size=(K, cfg.batch, cfg.blocksize)) * 0.1
              ).astype(np.float32)
    st, gold = sp.run(params, sp.init_state(seed=5), jnp.asarray(blocks))

    out_ring = jnp.zeros((K, cfg.batch, cfg.blocksize), jnp.float32)
    st2, out_ring = sp.run_ring(params, sp.init_state(seed=5),
                                jnp.asarray(blocks), None, out_ring, K)
    np.testing.assert_array_equal(np.asarray(out_ring), np.asarray(gold))
    np.testing.assert_array_equal(np.asarray(st.agc_gain),
                                  np.asarray(st2.agc_gain))


# ---------------- fused blockwise ('fast') mode ----------------

def _xla_fast(d, a_att, a_rel, init, max_gain, x, oc):
    """The unfused agc_mode='fast' back half (smooth_gain_blockwise +
    clip + apply) — what the fused blockwise kernel must reproduce."""
    from afp_tpu.ops.agc import smooth_gain_blockwise

    g = smooth_gain_blockwise(d, jnp.float32(a_att), jnp.float32(a_rel),
                              init=init)
    g = jnp.clip(g, 0.1, max_gain)
    return jnp.clip(x * g, -oc, oc), g[..., -1]


@pytest.mark.parametrize("use_init", [False, True])
def test_blockwise_fused_matches_xla(rng, use_init):
    """smooth_gain_apply_pallas(blockwise=32) ≡ smooth_gain_blockwise +
    clip + apply (interpret mode): same chunk means, same compound α,
    same within-chunk interpolation, same init=None restart at the first
    chunk mean.  Tolerance covers the chunk-mean reassociation only."""
    from afp_tpu.ops.pallas.agc_scan import smooth_gain_apply_pallas

    B, T, w = 1024, 512, 128
    a_att, a_rel = 0.05, 0.008
    x = (rng.normal(size=(B, T)) * 0.2).astype(np.float32)
    rms = moving_rms(x, w)
    d = desired_gain(rms, 0.1, 10.0)
    init = ((0.5 + rng.random(B)).astype(np.float32) if use_init else None)
    y_ref, gl_ref = _xla_fast(d, a_att, a_rel, init, 10.0, x, 0.99)
    y, gl = smooth_gain_apply_pallas(
        jnp.asarray(d).T, x, jnp.float32(a_att), jnp.float32(a_rel), 10.0,
        init=init, out_clip=0.99, interpret=True, blockwise=32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_ref), atol=2e-6)


def test_pipeline_fast_fused_matches_xla(rng, monkeypatch):
    """agc_mode='fast' through the pipeline: the fused blockwise chain
    (forced, interpret) matches the unfused XLA blockwise path in the
    documented bf16-class (the conv consumes the pair in the fused chain,
    exactly like exact mode's fused-vs-staged relation)."""
    cfg = _c8_cfg(agc_mode="fast")
    sig = (rng.normal(size=(3, 1024, 512)) * 0.1).astype(np.float32)

    p_ref = Pipeline(cfg)  # CPU: unfused XLA blockwise
    assert not p_ref._agc_chain_pair
    pp = p_ref.device_params(PipelineParams.design(p_ref.cfg))
    st = p_ref.init_state(seed=9)
    ref = []
    for b in sig:
        st, y = p_ref._step_impl(pp, st, jnp.asarray(b))
        ref.append(np.asarray(y))

    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    p = Pipeline(cfg)
    assert p._agc_blockwise == 32 and p._agc_chain_pair and p._conv_pair
    pp2 = p.device_params(PipelineParams.design(p.cfg))
    st2 = p.init_state(seed=9)
    for i, b in enumerate(sig):
        st2, y2 = p._step_impl(pp2, st2, jnp.asarray(b))
        diff = np.max(np.abs(np.asarray(y2) - ref[i]))
        peak = np.max(np.abs(ref[i]))
        assert diff <= peak * 10 ** (-88 / 20), (i, diff, peak)


def test_pipeline_fast_ring_matches_step(rng, monkeypatch):
    """agc_mode='fast' serving ring ≡ the staged fused step, bit-exact
    (same blockwise kernel, slot-select BlockSpec only) — the ring legs
    bench.py measures for the fast mode run this exact path."""
    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    cfg = _c8_cfg(agc_mode="fast")
    sig = (rng.normal(size=(3, 1024, 512)) * 0.1).astype(np.float32)

    p = Pipeline(cfg)
    assert p.supports_ring_step and p._agc_blockwise == 32
    pp = p.device_params(PipelineParams.design(p.cfg))
    st = p.init_state(seed=9)
    ref = []
    for b in sig:
        st, y = p._step_impl(pp, st, jnp.asarray(b))
        ref.append(np.asarray(y))

    ring = jnp.asarray(sig)
    out_ring = jnp.zeros(sig.shape, jnp.float32)
    st2 = p.init_state(seed=9)
    for i in range(3):
        st2, out_ring = p._ring_step_impl(pp, st2, ring, None, i, out_ring)
        np.testing.assert_array_equal(np.asarray(out_ring)[i], ref[i])
    np.testing.assert_array_equal(np.asarray(st.agc_gain),
                                  np.asarray(st2.agc_gain))


# ---------------- chunk-mean d emission (fast-mode HBM cut) ----------------

@pytest.mark.parametrize("w", [64, 256])
def test_rms_mean_chunk_matches_full(rng, w):
    """rms_desired_pallas(mean_chunk=32) ≡ the chunk means of the full
    per-sample d (reassociation-only delta) — on both boxcar kernels
    (direct w=64, two-level w=256)."""
    from afp_tpu.ops.pallas.agc_rms import rms_desired_pallas
    from afp_tpu.ops.pallas.fir_td import band_matrix

    B, T = 256, 512
    x = (rng.normal(size=(B, T)) * 0.3).astype(np.float32)
    band = band_matrix(np.full(w, 1.0 / w, dtype=np.float32))
    lp, rp = w // 2, w - 1 - w // 2
    args = (jnp.asarray(x), jnp.asarray(band), lp, rp, 0.1, 10.0)
    kw = dict(exact_band=False, interpret=True, transposed=True)
    d = rms_desired_pallas(*args, **kw)
    dm = rms_desired_pallas(*args, mean_chunk=32, **kw)
    assert dm.shape == (T // 32, B)
    ref = np.asarray(d).reshape(T // 32, 32, B).mean(axis=1)
    np.testing.assert_allclose(np.asarray(dm), ref, rtol=2e-6, atol=1e-7)

    with pytest.raises(ValueError, match="mean_chunk"):
        rms_desired_pallas(*args, exact_band=False, interpret=True,
                           transposed=False, mean_chunk=32)


def test_apply_d_means_matches_blockwise(rng):
    """smooth_gain_apply_pallas(d_is_means=True) with precomputed means is
    bit-identical to blockwise mode fed the equivalent per-sample d
    (chunkwise-constant with dyadic values, so the in-kernel mean is
    exact)."""
    from afp_tpu.ops.pallas.agc_scan import smooth_gain_apply_pallas

    B, T = 1024, 512
    d_c = (rng.integers(1, 200, size=(T // 32, B)) / 64.0).astype(np.float32)
    d_full = np.repeat(d_c, 32, axis=0)  # [T, B] time-major
    x = (rng.normal(size=(B, T)) * 0.2).astype(np.float32)
    for init in (None, (0.5 + rng.random(B)).astype(np.float32)):
        y1, g1 = smooth_gain_apply_pallas(
            jnp.asarray(d_full), x, jnp.float32(0.05), jnp.float32(0.008),
            10.0, init=init, out_clip=0.99, interpret=True, blockwise=32)
        y2, g2 = smooth_gain_apply_pallas(
            jnp.asarray(d_c), x, jnp.float32(0.05), jnp.float32(0.008),
            10.0, init=init, out_clip=0.99, interpret=True, blockwise=32,
            d_is_means=True)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    with pytest.raises(ValueError, match="blockwise"):
        smooth_gain_apply_pallas(
            jnp.asarray(d_c), x, jnp.float32(0.05), jnp.float32(0.008),
            10.0, interpret=True, d_is_means=True)
