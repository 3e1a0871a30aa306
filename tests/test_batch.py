"""Per-stream parameter bank tests."""
import numpy as np
import pytest

from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
from afp_tpu.engine.batch import broadcast_gains, with_per_stream_gains


def make(batch, **kw):
    base = dict(
        resample_quality="fast",  # tier mechanics tested elsewhere; keep CPU CI fast
        samplerate=44100, blocksize=512, upsample_factor=2, numtaps=65,
        batch=batch, cutoff=11000.0, eq_enabled=True, agc_enabled=False,
        downsample_mode="decimate", dither_kind="off", output_clip=None,
    )
    base.update(kw)
    cfg = StreamConfig(**base)
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    return pipe, params


def test_per_stream_gains_match_individual_runs(rng):
    pipe, params = make(batch=3)
    gains = np.array([
        [1.0] * 9,
        [2.0] * 9,
        np.linspace(0.5, 1.5, 9),
    ], dtype=np.float32)
    sig = (rng.normal(size=(3, 512 * 3)) * 0.3).astype(np.float32)
    psp = with_per_stream_gains(pipe, params, gains)
    _, batched = pipe.process_signal(psp, pipe.init_state(0), sig)
    batched = np.asarray(batched)

    for b in range(3):
        pipe1, params1 = make(batch=1)
        p1 = params1._replace(eq_gains=np.asarray(gains[b]))
        import jax.numpy as jnp

        p1 = params1._replace(eq_gains=jnp.asarray(gains[b]))
        _, single = pipe1.process_signal(p1, pipe1.init_state(0), sig[b : b + 1])
        np.testing.assert_allclose(batched[b], np.asarray(single)[0], atol=1e-6)


def test_broadcast_gains_shapes():
    g = broadcast_gains(1.5, 4, 9)
    assert g.shape == (4, 9)
    g = broadcast_gains([1.0] * 9, 4, 9)
    assert g.shape == (4, 9)
    with pytest.raises(ValueError):
        broadcast_gains([1.0] * 5, 4, 9)
    with pytest.raises(ValueError):
        broadcast_gains(np.ones((3, 9)), 4, 9)


def test_per_stream_on_td_matches_fft(rng):
    """Per-stream gain banks on the MXU strategy ≡ the FFT strategy
    (VERDICT r1 #8 — was a NotImplementedError in round 1)."""
    gains = np.array([
        [1.0] * 9,
        np.linspace(0.5, 2.0, 9),
    ], dtype=np.float32)
    sig = (rng.normal(size=(2, 256 * 3)) * 0.3).astype(np.float32)
    outs = {}
    for strat in ("fft", "td_mxu"):
        pipe, params = make(batch=2, blocksize=256, conv_strategy=strat)
        psp = with_per_stream_gains(pipe, params, gains)
        _, out = pipe.process_signal(psp, pipe.init_state(0), sig)
        outs[strat] = np.asarray(out)
    scale = np.max(np.abs(outs["fft"])) + 1e-12
    err = np.max(np.abs(outs["fft"] - outs["td_mxu"])) / scale
    assert 20 * np.log10(err + 1e-300) < -100


def test_per_stream_td_b3_meets_contract(rng):
    """Per-stream MXU path in bf16×3 precision stays under −90 dB."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas import fir_td_mxu_per_stream

    N, T, B, K = 65, 256, 4, 3
    kernels = (rng.normal(size=(K, N)) * 0.1).astype(np.float32)
    gains = rng.uniform(0.5, 2.0, size=(B, K)).astype(np.float32)
    x = (rng.normal(size=(B, T + N - 1)) * 0.5).astype(np.float32)
    out = np.asarray(fir_td_mxu_per_stream(
        jnp.asarray(x), jnp.asarray(kernels), jnp.asarray(gains),
        interpret=True, precision="B3"))
    gold = np.zeros((B, T))
    for b in range(B):
        for k in range(K):
            gold[b] += gains[b, k] * np.convolve(
                x[b].astype(np.float64), kernels[k].astype(np.float64), "valid")
    err = np.max(np.abs(out - gold)) / np.max(np.abs(gold))
    assert 20 * np.log10(err + 1e-300) < -90


def test_per_stream_filter_banks_match_individual_runs(rng):
    """SURVEY §7 step 5 'each stream can have its own kernel': a [B, F]
    main-filter bank equals B independent single-stream pipelines."""
    variants = [
        dict(cutoff=6000.0),
        dict(cutoff=15000.0, window_type="hann"),
        dict(cutoff=(500.0, 8000.0), filter_type="bandpass"),
    ]
    from afp_tpu.engine.batch import with_per_stream_filters

    pipe, _ = make(batch=3, eq_enabled=False)
    bank = with_per_stream_filters(pipe, variants)
    sig = (rng.normal(size=(3, 512 * 3)) * 0.3).astype(np.float32)
    _, batched = pipe.process_signal(bank, pipe.init_state(0), sig)
    batched = np.asarray(batched)
    import dataclasses

    for b, ov in enumerate(variants):
        pipe1, params1 = make(batch=1, eq_enabled=False, **ov)
        _, single = pipe1.process_signal(params1, pipe1.init_state(0),
                                         sig[b : b + 1])
        np.testing.assert_allclose(batched[b], np.asarray(single)[0], atol=1e-6)


def test_per_stream_filter_banks_unfused_path(rng):
    from afp_tpu.engine.batch import with_per_stream_filters

    variants = [dict(cutoff=4000.0), dict(cutoff=12000.0)]
    pipe, _ = make(batch=2, eq_enabled=False, fuse_rate_conversion=False)
    bank = with_per_stream_filters(pipe, variants)
    sig = (rng.normal(size=(2, 512 * 2)) * 0.3).astype(np.float32)
    _, out = pipe.process_signal(bank, pipe.init_state(0), sig)
    import dataclasses

    for b, ov in enumerate(variants):
        pipe1, params1 = make(batch=1, eq_enabled=False,
                              fuse_rate_conversion=False, **ov)
        _, single = pipe1.process_signal(params1, pipe1.init_state(0),
                                         sig[b : b + 1])
        np.testing.assert_allclose(np.asarray(out)[b], np.asarray(single)[0],
                                   atol=1e-6)


def test_per_stream_filter_banks_guards():
    from afp_tpu.engine.batch import with_per_stream_filters

    pipe, _ = make(batch=2, eq_enabled=False)
    with pytest.raises(ValueError, match="variants"):
        with_per_stream_filters(pipe, [dict(cutoff=5000.0)])
    with pytest.raises(ValueError, match="static"):
        with_per_stream_filters(pipe, [dict(numtaps=33), dict(cutoff=1.0)])
    pipe_eq, _ = make(batch=2, eq_enabled=True)
    with pytest.raises(NotImplementedError, match="eq_enabled"):
        with_per_stream_filters(pipe_eq, [dict(), dict()])
    # td_mxu is SUPPORTED since r4 (banked kernels) — uniform designs on a
    # tiny batch build a 1-design bank instead of raising
    pipe_td, _ = make(batch=2, eq_enabled=False, conv_strategy="td_mxu")
    bank = with_per_stream_filters(pipe_td, [dict(), dict()])
    assert bank.casc_bank.shape[0] == 1 and bank.casc_assign.shape == (1,)


def test_per_stream_filter_banks_numtaps_bump_rejected():
    """validate() bumps even numtaps to odd for highpass/bandstop (type-II
    Nyquist zero) — a per-variant bump changes the kernel length, which
    used to crash np.stack (mixed variants) or silently truncate the bank
    (all bumped).  Review fix: rejected with guidance."""
    from afp_tpu.engine.batch import with_per_stream_filters

    pipe, _ = make(batch=2, eq_enabled=False, numtaps=64)
    with pytest.raises(ValueError, match="odd base numtaps"):
        with_per_stream_filters(
            pipe, [dict(filter_type="highpass", cutoff=1000.0),
                   dict(cutoff=5000.0)])
    # odd base numtaps: the same variants design fine
    pipe_odd, _ = make(batch=2, eq_enabled=False, numtaps=65)
    params = with_per_stream_filters(
        pipe_odd, [dict(filter_type="highpass", cutoff=1000.0),
                   dict(cutoff=5000.0)])
    assert params.H_main.shape[0] == 2


def test_per_stream_gains_require_eq():
    """with_per_stream_gains on an EQ-disabled pipeline used to silently
    no-op (combined_response statically ignores eq_gains then) — review
    fix: rejected."""
    pipe, params = make(batch=2, eq_enabled=False)
    with pytest.raises(ValueError, match="eq_enabled"):
        with_per_stream_gains(pipe, params, 2.0)


def test_per_stream_td_rejects_untileable_batch(rng):
    """Code-review r2 finding: a batch not divisible by the picked tile must
    raise, not silently leave trailing streams unwritten."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas import fir_td_mxu_per_stream

    kernels = rng.normal(size=(3, 33)).astype(np.float32) * 0.1
    gains = np.ones((12, 3), dtype=np.float32)
    x = rng.normal(size=(12, 256 + 32)).astype(np.float32)
    with pytest.raises(ValueError, match="batch"):
        fir_td_mxu_per_stream(jnp.asarray(x), jnp.asarray(kernels),
                              jnp.asarray(gains), interpret=True)


# ------- per-stream filter banks on td_mxu (banked kernels, VERDICT r3 #3) --


def _td_cfg(**kw):
    from afp_tpu.engine import StreamConfig

    base = dict(
        samplerate=44100, blocksize=512, upsample_factor=2, numtaps=33,
        batch=16, eq_enabled=False, agc_enabled=False,
        downsample_mode="decimate", dither_kind="off", output_clip=None,
        conv_strategy="td_mxu", resample_quality="fast",
    )
    base.update(kw)
    return StreamConfig(**base)


def test_td_banked_matches_single_design_pipelines(rng):
    """with_per_stream_filters under conv_strategy='td_mxu': every stream
    is convolved with ITS design's cascade — asserted against per-design
    shared-kernel pipelines row-for-row (same seed, same state walk)."""
    import dataclasses

    from afp_tpu.engine.batch import with_per_stream_filters

    cfg = _td_cfg()
    pipe = Pipeline(cfg)
    variants = [dict(cutoff=4000.0 if i < 8 else 12000.0) for i in range(16)]
    bank = with_per_stream_filters(pipe, variants)
    assert bank.casc_bank.shape[0] == 2  # deduplicated designs
    blocks = (rng.normal(size=(3, 16, cfg.blocksize)) * 0.3
              ).astype(np.float32)
    st = pipe.init_state(seed=1)
    out = []
    for b in blocks:
        st, y = pipe.step(bank, st, b)
        out.append(np.asarray(y))
    out = np.stack(out)
    for cut, rows in ((4000.0, slice(0, 8)), (12000.0, slice(8, 16))):
        p2 = Pipeline(dataclasses.replace(cfg, cutoff=cut))
        pp2 = p2.device_params(PipelineParams.design(p2.cfg))
        st2 = p2.init_state(seed=1)
        for i, b in enumerate(blocks):
            st2, g = p2.step(pp2, st2, b)
            np.testing.assert_allclose(out[i][rows], np.asarray(g)[rows],
                                       atol=1e-6)


def test_td_banked_ring_and_mega_match_step(rng):
    """The banked f32 serving ring matches the staged banked step within
    the padded-band accumulation class (≤ −110 dB; the same bound as the
    shared f32 ring vs staged step), and the megakernel matches the
    per-step ring bitwise."""
    import jax.numpy as jnp

    from afp_tpu.engine.batch import with_per_stream_filters

    cfg = _td_cfg()
    pipe = Pipeline(cfg)
    assert pipe.supports_ring_step
    variants = [dict(cutoff=4000.0 if i < 8 else 12000.0) for i in range(16)]
    bank = with_per_stream_filters(pipe, variants)
    blocks = (rng.normal(size=(2, 16, cfg.blocksize)) * 0.3
              ).astype(np.float32)
    st = pipe.init_state(seed=1)
    ref = []
    for b in blocks:
        st, y = pipe.step(bank, st, b)
        ref.append(np.asarray(y))
    ring = jnp.asarray(blocks)
    orng = jnp.zeros(blocks.shape, jnp.float32)
    st2 = pipe.init_state(seed=1)
    for i in range(2):
        st2, orng = pipe._ring_step_impl(bank, st2, ring, None, i, orng)
        np.testing.assert_allclose(np.asarray(orng)[i], ref[i], atol=1e-6)
    st3 = pipe.init_state(seed=1)
    om = jnp.zeros(blocks.shape, jnp.float32)
    st3, om = pipe._run_ring_mega_impl(bank, st3, ring, None, om, 2, 0)
    np.testing.assert_array_equal(np.asarray(om), np.asarray(orng))


def test_td_banked_guards(rng):
    """Granularity, ingest, and fold guards for the td banked mode."""
    from afp_tpu.engine.batch import with_per_stream_filters

    pipe = Pipeline(_td_cfg())
    # row-level designs cannot tile (16 distinct designs in 16 rows)
    with pytest.raises(ValueError, match="constant within aligned"):
        with_per_stream_filters(
            pipe, [dict(cutoff=1000.0 + 500 * i) for i in range(16)])
    # an explicit bt must sit on the ladder, divide the batch, and hold
    # the assignment constant
    with pytest.raises(ValueError, match="ladder tile"):
        with_per_stream_filters(pipe, [dict(cutoff=4000.0)] * 16, bt=12)
    with pytest.raises(ValueError, match="not constant"):
        with_per_stream_filters(
            pipe, [dict(cutoff=4000.0 if i < 8 else 12000.0)
                   for i in range(16)], bt=16)
    # fold=True is refused; 'prefer' silently keeps the scan
    bank = with_per_stream_filters(
        pipe, [dict(cutoff=4000.0 if i < 8 else 12000.0) for i in range(16)])
    sig = (rng.normal(size=(16, 2 * 512)) * 0.3).astype(np.float32)
    with pytest.raises(ValueError, match="per-stream filter banks"):
        pipe.process_signal(bank, pipe.init_state(seed=0), sig, fold=True)
    _, y = pipe.process_signal(bank, pipe.init_state(seed=1), sig,
                               fold="prefer")
    st = pipe.init_state(seed=1)
    ref = []
    for i in range(2):
        st, o = pipe.step(bank, st, sig[:, i * 512:(i + 1) * 512])
        ref.append(np.asarray(o))
    np.testing.assert_array_equal(np.asarray(y),
                                  np.concatenate(ref, axis=-1))


def test_td_banked_with_dither_and_clip(rng):
    """The banked kernel's fused clip epilogue runs in interpret mode
    (clip has no PRNG); dither-on configs stay deterministic per seed and
    within the clip bound."""
    from afp_tpu.engine.batch import with_per_stream_filters

    cfg = _td_cfg(dither_kind="tpdf", output_clip=0.5)
    pipe = Pipeline(cfg)
    bank = with_per_stream_filters(
        pipe, [dict(cutoff=4000.0 if i < 8 else 12000.0) for i in range(16)])
    x = (rng.normal(size=(16, 512)) * 2.0).astype(np.float32)  # drives clip
    _, y1 = pipe.step(bank, pipe.init_state(seed=3), x)
    _, y2 = pipe.step(bank, pipe.init_state(seed=3), x)
    y1 = np.asarray(y1)
    np.testing.assert_array_equal(y1, np.asarray(y2))
    lsb = 2.0 / 2 ** 24
    assert np.max(np.abs(y1)) <= 0.5 + lsb


def test_td_banked_default_tile_is_shardable(rng):
    """The default assignment tile caps at max(8, B//8): a bank built with
    UNIFORM designs at global batch still shards (the largest-tile pick
    used to produce a 1-entry casc_assign that no mesh could split —
    r4 review finding)."""
    import jax

    from afp_tpu.engine.batch import with_per_stream_filters
    from afp_tpu.parallel import ShardedPipeline, make_mesh

    cfg = _td_cfg()
    pipe = Pipeline(cfg)
    bank = with_per_stream_filters(pipe, [dict(cutoff=5000.0)] * 16)
    assert bank.casc_assign.shape[0] >= 2  # ≥2 tiles at batch 16
    blocks = (rng.normal(size=(16, cfg.blocksize)) * 0.3).astype(np.float32)
    _, gold = pipe.step(bank, pipe.init_state(seed=1), blocks)
    sp = ShardedPipeline(cfg, make_mesh(2, axis_names=("streams",)))
    _, out = sp.step(bank, sp.init_state(seed=1), blocks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold), atol=1e-6)


def test_td_banked_pcm16(rng):
    """pcm16 ingest through the banked path: the staged step reconstructs
    the f32 window from the split int16 (EXACT — 16-bit data splits
    losslessly) and the raw int16 serving ring feeds the banked kernel
    natively; both match the f32 banked pipeline fed n/32768 floats."""
    import jax.numpy as jnp

    from afp_tpu.engine.batch import with_per_stream_filters

    variants = [dict(cutoff=4000.0 if i < 8 else 12000.0) for i in range(16)]
    cfg16 = _td_cfg(ingest="pcm16")
    p16 = Pipeline(cfg16)
    bank16 = with_per_stream_filters(p16, variants)
    pf = Pipeline(_td_cfg())
    bankf = with_per_stream_filters(pf, variants)

    qi = (rng.integers(-32768, 32768, size=(2, 16, cfg16.blocksize))
          .astype(np.int16))
    qf = qi.astype(np.float32) / np.float32(32768.0)
    st16, stf = p16.init_state(seed=2), pf.init_state(seed=2)
    for i in range(2):
        st16, y16 = p16.step(bank16, st16, qi[i])
        stf, yf = pf.step(bankf, stf, qf[i])
        np.testing.assert_allclose(np.asarray(y16), np.asarray(yf),
                                   atol=1e-6)

    # raw int16 serving ring, banked
    assert p16.supports_ring_step
    ring = jnp.asarray(qi)
    orng = jnp.zeros(qi.shape, jnp.float32)
    st3 = p16.init_state(seed=2)
    for i in range(2):
        st3, orng = p16._ring_step_impl(bank16, st3, ring, None, i, orng)
    st16b = p16.init_state(seed=2)
    for i in range(2):
        st16b, yref = p16.step(bank16, st16b, qi[i])
        np.testing.assert_allclose(np.asarray(orng)[i], np.asarray(yref),
                                   atol=1e-6)


def test_td_banked_with_agc(rng):
    """Banked filters compose with the AGC stage on the STAGED step (the
    AGC pair-emit is gated off under banked params, so the conv consumes
    the gain-applied f32 block); the serving ring refuses the combination
    loudly (its AGC chain consumes the shared band)."""
    import jax.numpy as jnp

    from afp_tpu.engine.batch import with_per_stream_filters

    variants = [dict(cutoff=4000.0 if i < 8 else 12000.0) for i in range(16)]
    cfg = _td_cfg(agc_enabled=True, agc_window_size=128, output_clip=0.99)
    pipe = Pipeline(cfg)
    bank = with_per_stream_filters(pipe, variants)
    x = (rng.normal(size=(16, cfg.blocksize)) * 0.01).astype(np.float32)
    st, y = pipe.step(bank, pipe.init_state(seed=1), x)
    y = np.asarray(y)
    assert np.all(np.isfinite(y)) and np.max(np.abs(y)) <= 0.99 + 1e-6

    # per-design equivalence under AGC (same gain math, own kernel)
    import dataclasses

    for cut, rows in ((4000.0, slice(0, 8)), (12000.0, slice(8, 16))):
        p2 = Pipeline(dataclasses.replace(cfg, cutoff=cut))
        pp2 = p2.device_params(PipelineParams.design(p2.cfg))
        _, g = p2.step(pp2, p2.init_state(seed=1), x)
        np.testing.assert_allclose(y[rows], np.asarray(g)[rows], atol=1e-6)

    # the AGC serving-ring chain rejects banked params at call time
    # (force the fused chain on — off-TPU it is gated off and the ring
    # form is unsupported before the banked check is even reached)
    import os

    os.environ["AFP_AGC_FUSED_FORCE"] = "1"
    try:
        # the fused AGC ring chain tiles at ≥ 8·128 streams — build the
        # refusal case at batch 1024 (the raise precedes any kernel work)
        cfgr = _td_cfg(agc_enabled=True, agc_window_size=256,
                       output_clip=0.99, batch=1024)
        pf = Pipeline(cfgr)
        assert pf.supports_ring_step
        bankr = with_per_stream_filters(
            pf, [dict(cutoff=4000.0 if i < 512 else 12000.0)
                 for i in range(1024)])
        ring = jnp.zeros((1, 1024, cfgr.blocksize), jnp.float32)
        out = jnp.zeros((1, 1024, cfgr.blocksize), jnp.float32)
        with pytest.raises(ValueError, match="per-stream filter banks"):
            pf._ring_step_impl(bankr, pf.init_state(seed=1), ring, None, 0,
                               out)
    finally:
        del os.environ["AFP_AGC_FUSED_FORCE"]


# ------- stream→tile design packing (VERDICT r4 #4) --


def test_design_sort_perm_link_groups():
    """Whole agc_link_group blocks move together; mixed-design groups are
    rejected."""
    from afp_tpu.engine.batch import _design_sort_perm

    assign = np.array([1, 1, 0, 0, 1, 1, 0, 0], dtype=np.int32)
    perm = _design_sort_perm(assign, link=2)
    np.testing.assert_array_equal(assign[perm],
                                  np.array([0, 0, 0, 0, 1, 1, 1, 1]))
    # pairs stay adjacent and intact
    np.testing.assert_array_equal(perm, np.array([2, 3, 6, 7, 0, 1, 4, 5]))
    with pytest.raises(ValueError, match="agc_link_group"):
        _design_sort_perm(np.array([0, 1, 0, 1], dtype=np.int32), link=2)


def test_td_banked_packed_interleaved(rng):
    """pack=True (VERDICT r4 #4): a strictly INTERLEAVED design ordering —
    un-tileable as given — serves through the banked MXU kernels via the
    stream→tile permutation, with unpacked outputs row-for-row equal to
    per-design shared-kernel pipelines."""
    import dataclasses

    from afp_tpu.engine.batch import with_per_stream_filters

    cfg = _td_cfg()
    pipe = Pipeline(cfg)
    cuts = [4000.0, 12000.0]
    variants = [dict(cutoff=cuts[i % 2]) for i in range(16)]
    # the raw ordering is rejected (this is exactly what pack lifts)
    with pytest.raises(ValueError, match="constant within aligned"):
        with_per_stream_filters(pipe, variants)
    bank, pk = with_per_stream_filters(pipe, variants, pack=True)
    assert not pk.identity and bank.casc_bank.shape[0] == 2
    # pack/unpack round-trips the caller order
    probe = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    np.testing.assert_array_equal(pk.unpack(pk.pack(probe)), probe)

    blocks = (rng.normal(size=(3, 16, cfg.blocksize)) * 0.3
              ).astype(np.float32)
    st = pipe.init_state(seed=1)
    out = []
    for b in blocks:
        st, y = pipe.step(bank, st, pk.pack(b))
        out.append(pk.unpack(np.asarray(y)))
    for ci, cut in enumerate(cuts):
        rows = [i for i in range(16) if i % 2 == ci]
        p2 = Pipeline(dataclasses.replace(cfg, cutoff=cut))
        pp2 = p2.device_params(PipelineParams.design(p2.cfg))
        st2 = p2.init_state(seed=1)
        for i, b in enumerate(blocks):
            st2, g = p2.step(pp2, st2, b)
            np.testing.assert_allclose(out[i][rows], np.asarray(g)[rows],
                                       atol=1e-6)


def test_ring_server_packed_banked(rng):
    """RingServer(packing=...): interleaved per-stream designs serve on
    the banked f32 conv ring with caller order preserved end-to-end —
    outputs match the staged banked step with manual pack/unpack."""
    from afp_tpu.engine.batch import with_per_stream_filters
    from afp_tpu.runtime import RingServer

    cfg = _td_cfg()
    pipe = Pipeline(cfg)
    assert pipe.supports_ring_step
    variants = [dict(cutoff=4000.0 if i % 2 == 0 else 12000.0)
                for i in range(16)]
    bank, pk = with_per_stream_filters(pipe, variants, pack=True)
    blocks = (rng.normal(size=(5, 16, cfg.blocksize)) * 0.3
              ).astype(np.float32)
    st = pipe.init_state(seed=2)
    gold = []
    for b in blocks:
        st, y = pipe.step(bank, st, pk.pack(b))
        gold.append(pk.unpack(np.asarray(y)))
    srv = RingServer(pipe, bank, slots=8, chunk=2, max_inflight=2, seed=2,
                     packing=pk)
    outs = list(srv.stream(iter(blocks)))
    assert len(outs) == 5
    for i in range(5):
        np.testing.assert_allclose(outs[i], gold[i], atol=1e-6)


def test_packed_fft_identity(rng):
    """pack=True on the fft strategy returns an identity packing (row-level
    banks never need sorting)."""
    from afp_tpu.engine.batch import with_per_stream_filters

    pipe = Pipeline(_td_cfg(conv_strategy="fft"))
    bank, pk = with_per_stream_filters(
        pipe, [dict(cutoff=1000.0 + 500 * i) for i in range(16)], pack=True)
    assert pk.identity and bank.H_main.shape[0] == 16


# ------- per-stream AGC parameter banks (VERDICT r4 #6) --


def _agc_vec_cfg(mode="exact"):
    from afp_tpu.engine import StreamConfig

    return StreamConfig(
        samplerate=44100, blocksize=256, upsample_factor=1, numtaps=33,
        batch=1024, eq_enabled=False, agc_enabled=True, agc_mode=mode,
        agc_window_size=64, agc_carry=True, dither_kind="off",
        output_clip=0.99, conv_strategy="td_mxu", resample_quality="fast")


_AGC_POLICIES = (dict(target=0.1, mg=10.0, att=0.01, rel=0.1),
                 dict(target=0.3, mg=4.0, att=0.05, rel=0.2))


def _agc_vec_params(pipe):
    from afp_tpu.engine.batch import with_per_stream_agc

    B = pipe.batch
    h = B // 2

    def halves(key):
        return np.r_[np.full(h, _AGC_POLICIES[0][key]),
                     np.full(h, _AGC_POLICIES[1][key])].astype(np.float32)

    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    return with_per_stream_agc(
        pipe, params, target_level=halves("target"), max_gain=halves("mg"),
        attack=halves("att"), release=halves("rel"))


@pytest.mark.slow
@pytest.mark.parametrize("mode,force", [
    ("exact", True), ("fast", True), ("exact", False), ("parallel", False)])
def test_per_stream_agc_matches_scalar_runs(rng, mode, force, monkeypatch):
    """[B]-vector AGC policy banks ≡ N scalar-policy runs, row for row —
    on the fused TPU chain (forced interpret) and the XLA fallbacks,
    across exact/fast/parallel modes."""
    import dataclasses

    if force:
        monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    cfg = _agc_vec_cfg(mode)
    pipe = Pipeline(cfg)
    vparams = _agc_vec_params(pipe)
    blocks = (rng.normal(size=(3, cfg.batch, cfg.blocksize)) * 0.1
              ).astype(np.float32)
    st = pipe.init_state(seed=3)
    out = []
    for b in blocks:
        st, y = pipe.step(vparams, st, b)
        out.append(np.asarray(y))

    h = cfg.batch // 2
    for k, pol in enumerate(_AGC_POLICIES):
        rows = slice(0, h) if k == 0 else slice(h, cfg.batch)
        cfg_k = dataclasses.replace(
            cfg, agc_target_level=pol["target"], agc_max_gain=pol["mg"],
            agc_attack=pol["att"], agc_release=pol["rel"]).validate()
        p2 = Pipeline(cfg_k)
        pp2 = p2.device_params(PipelineParams.design(p2.cfg))
        st2 = p2.init_state(seed=3)
        for i, b in enumerate(blocks):
            st2, g = p2.step(pp2, st2, b)
            if mode == "fast":
                # the chunk-mean reduction order shifts under tensor-vs-
                # scalar clip operands (~5e-6 through the gain) — the
                # documented f32-reassociation class of the approximation
                # mode; exact/parallel stay bit-identical
                np.testing.assert_allclose(out[i][rows],
                                           np.asarray(g)[rows], atol=2e-5)
            else:
                np.testing.assert_array_equal(out[i][rows],
                                              np.asarray(g)[rows])


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_per_stream_agc_ring_matches_step(rng, mode, monkeypatch):
    """Vector AGC params through the serving-ring chain ≡ the staged fused
    step, bit-exact (same kernels, slot-select BlockSpec only)."""
    import jax.numpy as jnp

    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    cfg = _agc_vec_cfg(mode)
    pipe = Pipeline(cfg)
    assert pipe.supports_ring_step
    vparams = _agc_vec_params(pipe)
    blocks = (rng.normal(size=(3, cfg.batch, cfg.blocksize)) * 0.1
              ).astype(np.float32)
    st = pipe.init_state(seed=4)
    ref = []
    for b in blocks:
        st, y = pipe.step(vparams, st, b)
        ref.append(np.asarray(y))
    ring = jnp.asarray(blocks)
    orng = jnp.zeros(blocks.shape, jnp.float32)
    st2 = pipe.init_state(seed=4)
    for i in range(3):
        st2, orng = pipe._ring_step_impl(vparams, st2, ring, None, i, orng)
        np.testing.assert_array_equal(np.asarray(orng)[i], ref[i])
    np.testing.assert_array_equal(np.asarray(st.agc_gain),
                                  np.asarray(st2.agc_gain))


def test_per_stream_agc_validation():
    from afp_tpu.engine.batch import with_per_stream_agc

    pipe = Pipeline(_td_cfg())  # agc disabled
    pp = pipe.device_params(PipelineParams.design(pipe.cfg))
    with pytest.raises(ValueError, match="agc_enabled"):
        with_per_stream_agc(pipe, pp, target_level=0.2)
    p2 = Pipeline(_agc_vec_cfg())
    pp2 = p2.device_params(PipelineParams.design(p2.cfg))
    with pytest.raises(ValueError, match="vector"):
        with_per_stream_agc(p2, pp2, target_level=np.ones(3, np.float32))
    # scalar knobs stay scalars (no silent promotion)
    out = with_per_stream_agc(p2, pp2, target_level=0.25, attack=0.02)
    assert out.agc_target.ndim == 0 and out.agc_a_att.ndim == 0


def test_td_banked_ring_resident_bank_matches(rng, monkeypatch):
    """The resident-bank banked ring form (whole [D, rows, LANE] stack
    fetched once per launch, in-kernel design select — the r5 fix for the
    per-step banked ring's per-tile band re-DMA) is bit-identical to the
    per-tile-selection form, on both the f32 and pcm16 rings."""
    import jax.numpy as jnp

    from afp_tpu.engine.batch import with_per_stream_filters

    cfg = _td_cfg()
    variants = [dict(cutoff=4000.0 if i < 8 else 12000.0) for i in range(16)]
    blocks = (rng.normal(size=(2, 16, cfg.blocksize)) * 0.3
              ).astype(np.float32)
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("AFP_BANKED_RESIDENT", mode)
        pipe = Pipeline(cfg)
        bank = with_per_stream_filters(pipe, variants)
        ring = jnp.asarray(blocks)
        orng = jnp.zeros(blocks.shape, jnp.float32)
        st = pipe.init_state(seed=1)
        for i in range(2):
            st, orng = pipe._ring_step_impl(bank, st, ring, None, i, orng)
        outs[mode] = np.asarray(orng)
    np.testing.assert_array_equal(outs["0"], outs["1"])

    icfg = _td_cfg(ingest="pcm16")
    iblocks = np.clip(np.round(blocks * 32768.0), -32768, 32767
                      ).astype(np.int16)
    iouts = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("AFP_BANKED_RESIDENT", mode)
        pipe = Pipeline(icfg)
        bank = with_per_stream_filters(pipe, variants)
        ring = jnp.asarray(iblocks)
        orng = jnp.zeros(blocks.shape, jnp.float32)
        st = pipe.init_state(seed=1)
        for i in range(2):
            st, orng = pipe._ring_step_impl(bank, st, ring, None, i, orng)
        iouts[mode] = np.asarray(orng)
    np.testing.assert_array_equal(iouts["0"], iouts["1"])
