"""Golden-waveform integration tests: the fused device pipeline vs a
numpy/scipy oracle replicating the reference chain semantics
(SURVEY.md §4 item 2)."""
import numpy as np
import pytest
import scipy.signal as sps

from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
from afp_tpu.ops.resample import PolyResampler, design_resample_kernel

#: heavy suite — excluded from the fast pass (docs/TESTING.md tiering);
#: run the FULL suite before committing kernel/engine changes
pytestmark = pytest.mark.slow



def err_db(a, b):
    return 20 * np.log10(np.max(np.abs(np.asarray(a) - b)) / (np.max(np.abs(b)) + 1e-300) + 1e-300)


def make_cfg(**kw):
    base = dict(
        resample_quality="fast",  # tier mechanics tested elsewhere; keep CPU CI fast
        samplerate=44100, blocksize=1024, upsample_factor=4, numtaps=129,
        batch=2, filter_type="lowpass", cutoff=11000.0, window_type="hamming",
        eq_enabled=True, agc_enabled=False, downsample_mode="decimate",
        dither_kind="off", output_clip=None,
    )
    base.update(kw)
    return StreamConfig(**base)


def oracle_chain(x, cfg, params):
    """Full-signal float64 oracle of the causal streamed pipeline:
    upsample (causal upfirdn) → fused EQ+main conv (zero-primed) → decimate."""
    upf = cfg.upsample_factor
    T = len(x)
    if upf > 1:
        st = PolyResampler.init(upf, 1, block=cfg.blocksize,
                                quality=cfg.resample_quality)
        h_up = np.asarray(st.h, dtype=np.float64)
        y = sps.upfirdn(h_up, x.astype(np.float64), upf, 1)[: T * upf]
    else:
        y = x.astype(np.float64)
    h_eq = np.tensordot(params.eq_gains.astype(np.float64), params.eq_taps.astype(np.float64), 1)
    h_fused = np.convolve(h_eq, params.main_taps.astype(np.float64))
    y = np.convolve(y, h_fused)[: len(y)]
    if upf > 1:
        y = y[::upf]
    return y


@pytest.mark.parametrize("upf", [1, 2, 4])
def test_pipeline_matches_oracle(rng, upf):
    cfg = make_cfg(upsample_factor=upf)
    pipe = Pipeline(cfg)
    design = PipelineParams.design(pipe.cfg)
    params = pipe.device_params(design)
    state = pipe.init_state(seed=0)

    T = cfg.blocksize * 6
    sig = rng.normal(size=(cfg.batch, T)).astype(np.float32) * 0.3
    state, out = pipe.process_signal(params, state, sig)
    out = np.asarray(out)
    assert out.shape == (cfg.batch, T)
    for b in range(cfg.batch):
        gold = oracle_chain(sig[b], pipe.cfg, design)
        assert err_db(out[b], gold) < -90


def test_pipeline_matches_oracle_default_tier(rng):
    """One oracle pass at the SHIPPED default tier — every other suite pins
    'fast' for CPU runtime (the tiers' own stopbands are pinned in
    test_resample and gated in bench.py's chain_imaging_report); this
    keeps the default config covered end-to-end against the float64
    oracle."""
    default_q = StreamConfig().resample_quality
    assert default_q != "fast", "the shipped default must beat −90 dB imaging"
    cfg = make_cfg(upsample_factor=2, resample_quality=default_q)
    pipe = Pipeline(cfg)
    design = PipelineParams.design(pipe.cfg)
    params = pipe.device_params(design)
    sig = rng.normal(size=(cfg.batch, cfg.blocksize * 3)).astype(np.float32) * 0.3
    _, out = pipe.process_signal(params, pipe.init_state(seed=0), sig)
    out = np.asarray(out)
    for b in range(cfg.batch):
        gold = oracle_chain(sig[b], pipe.cfg, design)
        assert err_db(out[b], gold) < -90


def test_pipeline_step_equals_run(rng):
    cfg = make_cfg()
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    sig = rng.normal(size=(cfg.batch, cfg.blocksize * 4)).astype(np.float32)

    st1 = pipe.init_state(seed=0)
    outs = []
    for i in range(4):
        st1, y = pipe.step(params, st1, sig[:, i * cfg.blocksize : (i + 1) * cfg.blocksize])
        outs.append(np.asarray(y))
    stepped = np.concatenate(outs, axis=-1)

    st2 = pipe.init_state(seed=0)
    _, scanned = pipe.process_signal(params, st2, sig)
    np.testing.assert_allclose(stepped, np.asarray(scanned), atol=1e-6)


def test_eq_gain_change_no_recompile(rng):
    """Gain updates are runtime data — the jit cache must not grow."""
    cfg = make_cfg()
    pipe = Pipeline(cfg)
    design = PipelineParams.design(pipe.cfg)
    params = pipe.device_params(design)
    state = pipe.init_state()
    block = rng.normal(size=(cfg.batch, cfg.blocksize)).astype(np.float32)
    state, _ = pipe.step(params, state, block)
    n0 = pipe._step._cache_size()
    import jax.numpy as jnp

    g = np.linspace(0.5, 2.0, len(cfg.eq_bands)).astype(np.float32)
    params2 = params._replace(eq_gains=jnp.asarray(g))
    state, _ = pipe.step(params2, state, block)
    assert pipe._step._cache_size() == n0


def test_eq_gains_affect_output(rng):
    cfg = make_cfg(upsample_factor=1)
    pipe = Pipeline(cfg)
    design = PipelineParams.design(pipe.cfg)
    params = pipe.device_params(design)
    block = rng.normal(size=(cfg.batch, cfg.blocksize)).astype(np.float32)
    _, y1 = pipe.step(params, pipe.init_state(), block)
    params2 = params._replace(eq_gains=params.eq_gains * 2.0)
    _, y2 = pipe.step(params2, pipe.init_state(), block)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_agc_pipeline_runs(rng):
    cfg = make_cfg(agc_enabled=True, upsample_factor=2, output_clip=0.99,
                   agc_window_size=256)
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    state = pipe.init_state()
    sig = (rng.normal(size=(cfg.batch, cfg.blocksize * 3)) * 0.01).astype(np.float32)
    state, out = pipe.process_signal(params, state, sig)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    assert np.max(np.abs(out)) <= 0.99 + 1e-6
    # AGC should have amplified the quiet signal
    assert np.std(out[:, cfg.blocksize :]) > np.std(sig) * 2


def test_dither_pipeline(rng):
    cfg = make_cfg(dither_kind="tpdf", upsample_factor=1, eq_enabled=False)
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    sig = np.zeros((cfg.batch, cfg.blocksize * 2), dtype=np.float32)
    _, out = pipe.process_signal(params, pipe.init_state(seed=7), sig)
    out = np.asarray(out)
    lsb = 2 / 2**24
    assert 0 < np.max(np.abs(out)) <= lsb
    # deterministic under the same seed
    _, out2 = pipe.process_signal(params, pipe.init_state(seed=7), sig)
    np.testing.assert_array_equal(out, np.asarray(out2))


def test_asrc_pipeline(rng):
    cfg = make_cfg(source_samplerate=48000, upsample_factor=1,
                   eq_enabled=False, asrc_mode="compat")
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    sig = rng.normal(size=(cfg.batch, cfg.blocksize * 2)).astype(np.float32)
    _, out = pipe.process_signal(params, pipe.init_state(), sig)
    assert np.asarray(out).shape == sig.shape  # pad/trim-to-blocksize compat
    assert np.all(np.isfinite(np.asarray(out)))


def test_upsampled_rate_output(rng):
    """output_rate='upsampled' emits blocksize*upf samples at the high rate,
    equal to the literal chain's pre-decimation stream."""
    base = dict(
        resample_quality="fast",  # tier mechanics tested elsewhere; keep CPU CI fast
        samplerate=44100, blocksize=1024, upsample_factor=4, numtaps=101,
        batch=1, cutoff=11000.0, eq_enabled=False, agc_enabled=False,
        dither_kind="off", output_clip=None,
    )
    hi = Pipeline(StreamConfig(output_rate="upsampled",
                               downsample_mode="decimate", **base))
    params = hi.device_params(PipelineParams.design(hi.cfg))
    sig = (rng.normal(size=(1, 1024 * 3)) * 0.3).astype(np.float32)
    _, out_hi = hi.process_signal(params, hi.init_state(), sig)
    out_hi = np.asarray(out_hi)
    assert out_hi.shape == (1, 1024 * 3 * 4)

    # decimating the high-rate output must equal the base-rate literal chain
    lo = Pipeline(StreamConfig(output_rate="base", downsample_mode="decimate",
                               fuse_rate_conversion=False, **base))
    lparams = lo.device_params(PipelineParams.design(lo.cfg))
    _, out_lo = lo.process_signal(lparams, lo.init_state(), sig)
    np.testing.assert_allclose(out_hi[:, ::4], np.asarray(out_lo), atol=1e-6)


def test_fused_output_clip_matches_staged(rng):
    """cfg.output_clip through td_mxu (clip fused into the Pallas store,
    `pipeline.py` clip_done path) must be bit-exact against clipping an
    unclipped run — no double clip, no skipped clip."""
    import dataclasses

    base = make_cfg(
        blocksize=512, upsample_factor=1, numtaps=129, batch=4,
        eq_enabled=False, conv_strategy="td_mxu", output_clip=0.2,
    )
    sig = (rng.normal(size=(4, 512 * 4)) * 0.6).astype(np.float32)

    def run(cfg):
        pipe = Pipeline(cfg)
        params = pipe.device_params(PipelineParams.design(pipe.cfg))
        _, out = pipe.process_signal(params, pipe.init_state(), sig)
        return np.asarray(out)

    clipped = run(base)
    unclipped = run(dataclasses.replace(base, output_clip=None))
    assert np.max(np.abs(unclipped)) > 0.2  # the clip must actually bite
    np.testing.assert_array_equal(clipped, np.clip(unclipped, -0.2, 0.2))

    # and the fft strategy (XLA jnp.clip path) agrees on the same scale
    fft_clipped = run(dataclasses.replace(base, conv_strategy="fft"))
    assert err_db(clipped, fft_clipped) < -84  # clipped-scale denominator


def test_pair_ingest_matches_f32(rng):
    """cfg.ingest='pair' (blocks arrive as the bf16 hi/lo split, no on-device
    staging) must be BIT-identical to the f32 path across carried blocks —
    same argument as the AGC conv-pair path: the split is elementwise."""
    import dataclasses

    from afp_tpu.ops.pallas.fir_td import split_bf16

    base = make_cfg(
        blocksize=512, upsample_factor=2, numtaps=65, batch=4,
        eq_enabled=True, conv_strategy="td_mxu", output_clip=0.5,
    )
    sig = (rng.normal(size=(3, 4, 512)) * 0.4).astype(np.float32)

    p_ref = Pipeline(base)
    pr = p_ref.device_params(PipelineParams.design(p_ref.cfg))
    st = p_ref.init_state()
    ref = []
    for b in sig:
        st, y = p_ref._step_impl(pr, st, b)
        ref.append(np.asarray(y))

    cfgp = dataclasses.replace(base, ingest="pair")
    p = Pipeline(cfgp)
    assert p._pair_ingest and p._conv_pair
    pp = p.device_params(PipelineParams.design(p.cfg))
    sp = p.init_state()
    assert isinstance(sp.conv_tail, tuple)
    import jax.numpy as jnp

    for i, b in enumerate(sig):
        sp, y = p._step_impl(pp, sp, split_bf16(jnp.asarray(b)))
        np.testing.assert_array_equal(np.asarray(y), ref[i])


def test_ring_step_matches_pair_step(rng):
    """Pipeline.ring_step (zero-copy serving ring) must produce the exact
    per-block outputs of the classic pair-ingest step loop — same carried
    tail, same dither key schedule — while leaving the other output-ring
    slots untouched."""
    import dataclasses

    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import split_bf16

    base = make_cfg(
        blocksize=512, upsample_factor=2, numtaps=65, batch=4,
        eq_enabled=True, conv_strategy="td_mxu", output_clip=0.5,
        ingest="pair",
    )
    sig = (rng.normal(size=(3, 4, 512)) * 0.4).astype(np.float32)

    p = Pipeline(base)
    assert p.supports_ring_step
    pp = p.device_params(PipelineParams.design(p.cfg))

    # reference: classic pair-ingest step loop
    st = p.init_state(seed=3)
    ref = []
    for b in sig:
        st, y = p._step_impl(pp, st, split_bf16(jnp.asarray(b)))
        ref.append(np.asarray(y))

    # ring mode: same blocks resident as a ring, processed slot by slot
    rh, rl = split_bf16(jnp.asarray(sig))
    out_ring = jnp.full(sig.shape, 9.0, jnp.float32)
    st2 = p.init_state(seed=3)
    for i in range(sig.shape[0]):
        st2, out_ring = p._ring_step_impl(pp, st2, rh, rl, i, out_ring)
        got = np.asarray(out_ring)
        np.testing.assert_array_equal(got[i], ref[i])
        # later slots still hold the sentinel
        assert np.all(got[i + 1:] == 9.0)
    # carried tails agree bit-for-bit after the full pass
    np.testing.assert_array_equal(np.asarray(st.conv_tail[0]),
                                  np.asarray(st2.conv_tail[0]))
    np.testing.assert_array_equal(np.asarray(st.conv_tail[1]),
                                  np.asarray(st2.conv_tail[1]))

    # dither on: the ring path must reproduce the classic key schedule
    cfgd = dataclasses.replace(base, dither_kind="tpdf", output_clip=None)
    pd = Pipeline(cfgd)
    std = pd.init_state(seed=7)
    refd = []
    for b in sig:
        std, y = pd._step_impl(
            pd.device_params(PipelineParams.design(pd.cfg)), std,
            split_bf16(jnp.asarray(b)))
        refd.append(np.asarray(y))
    ppd = pd.device_params(PipelineParams.design(pd.cfg))
    std2 = pd.init_state(seed=7)
    ringd = jnp.zeros(sig.shape, jnp.float32)
    for i in range(sig.shape[0]):
        std2, ringd = pd._ring_step_impl(ppd, std2, rh, rl, i, ringd)
    np.testing.assert_array_equal(np.asarray(ringd), np.stack(refd))


def test_agc_ring_step_matches_step(rng, monkeypatch):
    """The fused-AGC serving-ring form (single f32 input ring, ring-input
    RMS/apply kernels, ring-output conv) must be bit-identical to the
    classic fused AGC step across carried blocks — the C8 chain with zero
    staging copies."""
    import jax.numpy as jnp

    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    cfg = make_cfg(
        blocksize=256, upsample_factor=2, numtaps=33, batch=1024,
        eq_enabled=True, agc_enabled=True, agc_mode="exact",
        agc_window_size=64, agc_carry=True, dither_kind="tpdf",
        output_clip=0.99, conv_strategy="td_mxu",
    )
    sig = (rng.normal(size=(3, 1024, 256)) * 0.1).astype(np.float32)

    p = Pipeline(cfg)
    assert p._conv_pair and not p._pair_ingest
    assert p.supports_ring_step
    pp = p.device_params(PipelineParams.design(p.cfg))
    st = p.init_state(seed=9)
    ref = []
    for b in sig:
        st, y = p._step_impl(pp, st, b)
        ref.append(np.asarray(y))

    ring = jnp.asarray(sig)  # [S, B, T] f32 serving ring
    out_ring = jnp.full(sig.shape, 3.0, jnp.float32)
    st2 = p.init_state(seed=9)
    for i in range(sig.shape[0]):
        st2, out_ring = p._ring_step_impl(pp, st2, ring, None, i, out_ring)
        got = np.asarray(out_ring)
        np.testing.assert_array_equal(got[i], ref[i])
        assert np.all(got[i + 1:] == 3.0)
    np.testing.assert_array_equal(np.asarray(st.agc_gain),
                                  np.asarray(st2.agc_gain))
    np.testing.assert_array_equal(np.asarray(st.conv_tail[0]),
                                  np.asarray(st2.conv_tail[0]))
    np.testing.assert_array_equal(np.asarray(st.key), np.asarray(st2.key))

    # and through the one-dispatch serving scan (wraparound included)
    st3 = p.init_state(seed=9)
    ring_out2 = jnp.zeros(sig.shape, jnp.float32)
    st3, ring_out2 = p.run_ring(pp, st3, ring, None, ring_out2, 3)
    np.testing.assert_array_equal(np.asarray(ring_out2), np.stack(ref))


def test_run_ring_matches_step_loop_with_wraparound(rng):
    """Pipeline.run_ring (one-dispatch serving scan) must equal the
    per-step pair loop for n_steps > K (ring wraparound) and honor a
    nonzero start offset."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import split_bf16

    cfg = make_cfg(
        blocksize=512, upsample_factor=1, numtaps=65, batch=4,
        conv_strategy="td_mxu", ingest="pair", dither_kind="off",
    )
    K, n_steps, start = 3, 5, 2
    sig = (rng.normal(size=(K, 4, 512)) * 0.4).astype(np.float32)
    p = Pipeline(cfg)
    pp = p.device_params(PipelineParams.design(p.cfg))
    rh, rl = split_bf16(jnp.asarray(sig))

    # reference: classic pair step loop in ring order (start..start+n-1 mod K)
    st = p.init_state(seed=1)
    last = {}
    for i in range(n_steps):
        s = (start + i) % K
        st, y = p._step_impl(pp, st, (rh[s], rl[s]))
        last[s] = np.asarray(y)  # out_ring keeps the LAST write per slot

    st2 = p.init_state(seed=1)
    out_ring = jnp.full(sig.shape, 5.0, jnp.float32)
    st2, out_ring = p.run_ring(pp, st2, rh, rl, out_ring, n_steps,
                               start=start)
    got = np.asarray(out_ring)
    for s, y in last.items():
        np.testing.assert_array_equal(got[s], y)
    np.testing.assert_array_equal(np.asarray(st.conv_tail[0]),
                                  np.asarray(st2.conv_tail[0]))


def test_f32_ring_matches_staged(rng):
    """The f32 conv serving ring (kernel splits in VMEM — the reference's
    f32 input contract with zero-copy dispatch) must be bit-identical to
    the staged step loop IN INTERPRET MODE (where the dot is not
    chunked; on hardware the ring kernel's k_pad-padded band regroups
    the fp32 accumulation vs the unpadded staged f32 kernel — a ≤ −110 dB
    bound asserted by tools/hw_check.py, which also asserts hardware
    bit-equality against the staged PAIR path, the ring's true geometry
    twin): per-step, one-dispatch scan with wraparound, the megakernel
    form, and a staged step resumed from ring-carried state (the
    k_pad-wide tail)."""
    import jax.numpy as jnp

    cfg = make_cfg(blocksize=512, upsample_factor=2, numtaps=65, batch=4,
                   conv_strategy="td_mxu", dither_kind="off",
                   eq_enabled=True, output_clip=0.8)  # ingest stays 'f32'
    K, n_steps, start = 3, 5, 2
    sig = (rng.normal(size=(K, 4, 512)) * 0.4).astype(np.float32)
    p = Pipeline(cfg)
    assert p.supports_ring_step and not p._pair_ingest and not p._conv_pair
    pp = p.device_params(PipelineParams.design(p.cfg))

    # gold: classic staged f32 step loop in ring order
    st = p.init_state(seed=1)
    last = {}
    for i in range(n_steps):
        s = (start + i) % K
        st, y = p._step_impl(pp, st, jnp.asarray(sig[s]))
        last[s] = np.asarray(y)

    ring = jnp.asarray(sig)
    n_tail = st.conv_tail.shape[-1]

    # per-step ring form
    st1 = p.init_state(seed=1)
    out1 = jnp.full(sig.shape, 5.0, jnp.float32)
    for i in range(n_steps):
        st1, out1 = p._ring_step_impl(pp, st1, ring, None,
                                      (start + i) % K, out1)
    for s, y in last.items():
        np.testing.assert_array_equal(np.asarray(out1)[s], y)
    np.testing.assert_array_equal(
        np.asarray(st1.conv_tail)[:, -n_tail:], np.asarray(st.conv_tail))

    # one-dispatch serving scan
    st2 = p.init_state(seed=1)
    out2 = jnp.full(sig.shape, 5.0, jnp.float32)
    st2, out2 = p.run_ring(pp, st2, ring, None, out2, n_steps, start=start)
    for s, y in last.items():
        np.testing.assert_array_equal(np.asarray(out2)[s], y)
    np.testing.assert_array_equal(
        np.asarray(st2.conv_tail)[:, -n_tail:], np.asarray(st.conv_tail))

    # megakernel form (incl. chunk-crossing launches)
    import afp_tpu.engine.pipeline as plmod
    orig = plmod.MEGA_CHUNK_STEPS
    for chunk in (orig, 2):
        plmod.MEGA_CHUNK_STEPS = chunk
        try:
            pm = Pipeline(cfg)
            st3 = pm.init_state(seed=1)
            out3 = jnp.full(sig.shape, 5.0, jnp.float32)
            st3, out3 = pm.run_ring_mega(pp, st3, ring, None, out3, n_steps,
                                         start=start)
        finally:
            plmod.MEGA_CHUNK_STEPS = orig
        for s, y in last.items():
            np.testing.assert_array_equal(np.asarray(out3)[s], y)
        np.testing.assert_array_equal(
            np.asarray(st3.conv_tail)[:, -n_tail:], np.asarray(st.conv_tail))

    # staged step resumed from the ring's k_pad-wide tail state: the
    # defensive tail slice must make it equal the all-staged continuation
    nxt = (rng.normal(size=(4, 512)) * 0.4).astype(np.float32)
    _, y_gold = p._step_impl(pp, st, jnp.asarray(nxt))
    _, y_ring = p._step_impl(pp, st2, jnp.asarray(nxt))
    np.testing.assert_array_equal(np.asarray(y_ring), np.asarray(y_gold))

    # dithered form (interpret-mode post-kernel dither shares the staged
    # path's key walk → still bit-identical)
    import dataclasses
    dcfg = dataclasses.replace(cfg, dither_kind="tpdf")
    pd = Pipeline(dcfg)
    ppd = pd.device_params(PipelineParams.design(pd.cfg))
    std = pd.init_state(seed=4)
    lastd = {}
    for i in range(n_steps):
        s = (start + i) % K
        std, y = pd._step_impl(ppd, std, jnp.asarray(sig[s]))
        lastd[s] = np.asarray(y)
    std2 = pd.init_state(seed=4)
    outd = jnp.zeros(sig.shape, jnp.float32)
    std2, outd = pd.run_ring(ppd, std2, ring, None, outd, n_steps,
                             start=start)
    for s, y in lastd.items():
        np.testing.assert_array_equal(np.asarray(outd)[s], y)
    np.testing.assert_array_equal(np.asarray(std2.key), np.asarray(std.key))


def test_run_ring_mega_matches_run_ring(rng):
    """The one-launch serving megakernel (`run_ring_mega`) must equal the
    scan-of-ring-steps path — final ring, tail carry, slot wraparound, and
    nonzero start offset — in interpret mode with dither off (the fused
    dither epilogue is TPU-only; hw_check covers the dithered form)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from afp_tpu.ops.pallas.fir_td import split_bf16

    cfg = make_cfg(
        blocksize=512, upsample_factor=1, numtaps=65, batch=4,
        conv_strategy="td_mxu", ingest="pair", dither_kind="off",
        eq_enabled=True, output_clip=0.8,
    )
    K = 3
    sig = (rng.normal(size=(K, 4, 512)) * 0.4).astype(np.float32)
    p = Pipeline(cfg)
    pp = p.device_params(PipelineParams.design(p.cfg))
    rh, rl = split_bf16(jnp.asarray(sig))
    for n_steps, start in ((3, 0), (5, 2)):  # exact cover + wraparound
        st = p.init_state(seed=1)
        ring = jnp.full(sig.shape, 5.0, jnp.float32)
        st, ring = p.run_ring(pp, st, rh, rl, ring, n_steps, start=start)
        st2 = p.init_state(seed=1)
        ring2 = jnp.full(sig.shape, 5.0, jnp.float32)
        st2, ring2 = p.run_ring_mega(pp, st2, rh, rl, ring2, n_steps,
                                     start=start)
        np.testing.assert_array_equal(np.asarray(ring2), np.asarray(ring))
        np.testing.assert_array_equal(np.asarray(st.conv_tail[0]),
                                      np.asarray(st2.conv_tail[0]))
        np.testing.assert_array_equal(np.asarray(st.conv_tail[1]),
                                      np.asarray(st2.conv_tail[1]))

    # k_pad > T regime: tail wider than the block — the in-kernel carry
    # stitches old-tail and block columns across steps
    wcfg = make_cfg(blocksize=128, upsample_factor=1, numtaps=385, batch=4,
                    conv_strategy="td_mxu", ingest="pair", dither_kind="off",
                    eq_enabled=False)
    pw = Pipeline(wcfg)
    assert pw._k_pad > pw.block
    ppw = pw.device_params(PipelineParams.design(pw.cfg))
    sigw = (rng.normal(size=(K, 4, 128)) * 0.4).astype(np.float32)
    rhw, rlw = split_bf16(jnp.asarray(sigw))
    stw = pw.init_state(seed=2)
    ringw = jnp.zeros(sigw.shape, jnp.float32)
    stw, ringw = pw.run_ring(ppw, stw, rhw, rlw, ringw, 5, start=0)
    ringw2 = jnp.zeros(sigw.shape, jnp.float32)
    stw2, ringw2 = pw.run_ring_mega(ppw, pw.init_state(seed=2), rhw, rlw,
                                    ringw2, 5, start=0)
    np.testing.assert_array_equal(np.asarray(ringw2), np.asarray(ringw))
    np.testing.assert_array_equal(np.asarray(stw.conv_tail[0]),
                                  np.asarray(stw2.conv_tail[0]))

    # interpret mode + dither on → clean rejection (no silent numerics gap)
    dcfg = make_cfg(blocksize=512, upsample_factor=1, numtaps=65, batch=4,
                    conv_strategy="td_mxu", ingest="pair",
                    dither_kind="tpdf")
    pd = Pipeline(dcfg)
    ppd = pd.device_params(PipelineParams.design(pd.cfg))
    with _pytest.raises(ValueError, match="fused dither"):
        pd.run_ring_mega(ppd, pd.init_state(seed=0), rh, rl,
                         jnp.zeros(sig.shape, jnp.float32), K)


def test_run_ring_mega_chunked_launches(rng, monkeypatch):
    """n_steps > MEGA_CHUNK_STEPS chains multiple mega launches, carrying
    the VMEM tail between them — output and tail must stay bit-identical
    to the per-step ring scan (the SMEM-cap workaround: Mosaic's fixed
    footprint leaves no room for a long scalar-prefetch seed array)."""
    import jax.numpy as jnp

    import afp_tpu.engine.pipeline as plmod
    from afp_tpu.ops.pallas.fir_td import split_bf16

    monkeypatch.setattr(plmod, "MEGA_CHUNK_STEPS", 2)
    cfg = make_cfg(blocksize=512, upsample_factor=1, numtaps=65, batch=4,
                   conv_strategy="td_mxu", ingest="pair", dither_kind="off",
                   eq_enabled=True, output_clip=0.8)
    K = 3
    sig = (rng.normal(size=(K, 4, 512)) * 0.4).astype(np.float32)
    p = Pipeline(cfg)
    pp = p.device_params(PipelineParams.design(p.cfg))
    rh, rl = split_bf16(jnp.asarray(sig))
    # 5 steps at chunk 2 → 3 launches (2+2+1), with slot wraparound and a
    # nonzero start crossing chunk boundaries
    st = p.init_state(seed=1)
    ring = jnp.full(sig.shape, 5.0, jnp.float32)
    st, ring = p.run_ring(pp, st, rh, rl, ring, 5, start=2)
    st2 = p.init_state(seed=1)
    ring2 = jnp.full(sig.shape, 5.0, jnp.float32)
    st2, ring2 = p.run_ring_mega(pp, st2, rh, rl, ring2, 5, start=2)
    np.testing.assert_array_equal(np.asarray(ring2), np.asarray(ring))
    np.testing.assert_array_equal(np.asarray(st.conv_tail[0]),
                                  np.asarray(st2.conv_tail[0]))
    np.testing.assert_array_equal(np.asarray(st.conv_tail[1]),
                                  np.asarray(st2.conv_tail[1]))


def test_pair_ingest_engine_accepts_and_bad_configs_reject():
    """StreamEngine accepts ingest='pair' since the engine-level pair
    ladder landed (r3); the config-level incompatibilities still raise."""
    import dataclasses

    import pytest as _pytest

    from afp_tpu.engine import StreamEngine

    cfg = make_cfg(conv_strategy="td_mxu", ingest="pair",
                   blocksize=512, upsample_factor=1, batch=4)
    eng = StreamEngine(cfg)  # no longer rejected — full ladder on pair
    assert eng.cfg.ingest == "pair"
    with _pytest.raises(ValueError, match="conv_strategy"):
        dataclasses.replace(cfg, conv_strategy="fft").validate()
    with _pytest.raises(ValueError, match="agc"):
        dataclasses.replace(cfg, agc_enabled=True).validate()


def test_pair_ingest_upsampled_output_rejected():
    import dataclasses

    import pytest as _pytest

    cfg = make_cfg(conv_strategy="td_mxu", ingest="pair", blocksize=512,
                   upsample_factor=2, batch=4)
    with _pytest.raises(ValueError, match="output_rate"):
        dataclasses.replace(cfg, output_rate="upsampled").validate()


def test_f32_ring_kpad_wider_than_block(rng):
    """f32 conv ring in the k_pad > T regime (tail wider than the block):
    the in-kernel f32 tail carry stitches old-tail and block columns
    across steps — per-step ring, scan, and megakernel must all match the
    staged step loop (bit-exact in interpret mode)."""
    import jax.numpy as jnp

    cfg = make_cfg(blocksize=128, upsample_factor=1, numtaps=385, batch=4,
                   conv_strategy="td_mxu", dither_kind="off",
                   eq_enabled=False)  # ingest stays 'f32'
    p = Pipeline(cfg)
    assert p._k_pad > p.block and p.supports_ring_step
    pp = p.device_params(PipelineParams.design(p.cfg))
    K, n_steps = 3, 5
    sig = (rng.normal(size=(K, 4, 128)) * 0.4).astype(np.float32)

    st = p.init_state(seed=2)
    last = {}
    for i in range(n_steps):
        s = i % K
        st, y = p._step_impl(pp, st, jnp.asarray(sig[s]))
        last[s] = np.asarray(y)
    n_tail = st.conv_tail.shape[-1]

    ring = jnp.asarray(sig)
    st1 = p.init_state(seed=2)
    out1 = jnp.zeros(sig.shape, jnp.float32)
    st1, out1 = p.run_ring(pp, st1, ring, None, out1, n_steps)
    for s, y in last.items():
        np.testing.assert_array_equal(np.asarray(out1)[s], y)
    np.testing.assert_array_equal(
        np.asarray(st1.conv_tail)[:, -n_tail:], np.asarray(st.conv_tail))

    out2 = jnp.zeros(sig.shape, jnp.float32)
    st2, out2 = p.run_ring_mega(pp, p.init_state(seed=2), ring, None,
                                out2, n_steps)
    for s, y in last.items():
        np.testing.assert_array_equal(np.asarray(out2)[s], y)
    np.testing.assert_array_equal(
        np.asarray(st2.conv_tail)[:, -n_tail:], np.asarray(st.conv_tail))


def test_run_ring_misuse_raises_descriptive_errors():
    """Regression (r3 review): _run_ring_impl's f32-tail pad branch used to
    run before any form validation, turning the intended ValueErrors into
    AttributeErrors (tuple conv_tail / missing _k_pad)."""
    import jax.numpy as jnp

    ring = jnp.zeros((3, 4, 256), jnp.float32)
    out = jnp.zeros((3, 4, 256), jnp.float32)

    cfg = make_cfg(blocksize=256, upsample_factor=1, batch=4,
                   conv_strategy="td_mxu", eq_enabled=False, ingest="pair")
    p = Pipeline(cfg)
    pp = p.device_params(PipelineParams.design(p.cfg))
    with pytest.raises(ValueError, match="ring form mismatch"):
        p.run_ring(pp, p.init_state(seed=0), ring, None, out, 2)

    cfg2 = make_cfg(blocksize=256, upsample_factor=1, batch=4,
                    conv_strategy="fft", eq_enabled=False)
    p2 = Pipeline(cfg2)
    pp2 = p2.device_params(PipelineParams.design(p2.cfg))
    with pytest.raises(ValueError, match="ring_step requires"):
        p2.run_ring(pp2, p2.init_state(seed=0), ring, None, out, 2)
