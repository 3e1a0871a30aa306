"""Golden tests for AGC (vs a numpy replica of the reference's apply_agc) and
dither statistics."""
import numpy as np
import jax
import pytest

from afp_tpu.ops import AGCParams, apply_agc, dither, moving_rms
from afp_tpu.ops.agc import smooth_gain_scan

#: heavy suite — excluded from the fast pass (docs/TESTING.md tiering);
#: run the FULL suite before committing kernel/engine changes
pytestmark = pytest.mark.slow



def oracle_agc(signal, target_level=0.1, window_size=512, max_gain=10.0,
               attack=0.01, release=0.1):
    """numpy float64 replica of /root/reference/stream_process_AGC.py:43-89
    (1-D in, 1-D out)."""
    attack_samples = int(attack * window_size)
    release_samples = int(release * window_size)
    squared = np.square(signal.astype(np.float64))
    window = np.ones(window_size) / window_size
    rms = np.sqrt(np.convolve(squared, window, mode="same"))
    desired = np.clip(target_level / (rms + 1e-10), 0, max_gain)
    sm = np.zeros_like(desired)
    sm[0] = desired[0]
    for i in range(1, len(desired)):
        if desired[i] > sm[i - 1]:
            a = 1 - np.exp(-1.0 / attack_samples) if attack_samples else 1.0
        else:
            a = 1 - np.exp(-1.0 / release_samples) if release_samples else 1.0
        sm[i] = a * desired[i] + (1 - a) * sm[i - 1]
    sm = np.clip(sm, 0.1, max_gain)
    return signal * sm, sm


@pytest.mark.parametrize("window_size", [512, 256, 64])
def test_agc_matches_reference_oracle(rng, window_size):
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(2048) / 44100)
         * (1 + 0.5 * np.sin(2 * np.pi * 2 * np.arange(2048) / 44100))).astype(np.float32)
    params = AGCParams(target_level=0.1, window_size=window_size)
    ours, _ = apply_agc(x, params)
    gold, _ = oracle_agc(x.astype(np.float64), window_size=window_size)
    np.testing.assert_allclose(np.asarray(ours), gold, rtol=2e-4, atol=2e-5)


def test_agc_batched(rng):
    x = rng.normal(size=(4, 1024)).astype(np.float32) * 0.2
    params = AGCParams(window_size=128)
    ours, last = apply_agc(x, params)
    assert ours.shape == x.shape and last.shape == (4,)
    for i in range(4):
        gold, sm = oracle_agc(x[i].astype(np.float64), window_size=128)
        np.testing.assert_allclose(np.asarray(ours[i]), gold, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(last[i]), sm[-1], rtol=2e-3)


def test_agc_carry_continuity(rng):
    """With the cross-block carry, splitting a signal into blocks matches the
    carried recurrence run over the concatenation."""
    x = rng.normal(size=1024).astype(np.float32) * 0.3
    params = AGCParams(window_size=64)
    # full-signal smoothed gain with carry started at desired[0]
    full_out, _ = apply_agc(x, params)

    # NOTE: RMS uses 'same' zero-padded windows, so exact block equality holds
    # only for the recurrence part; verify the recurrence carry itself:
    from afp_tpu.ops.agc import desired_gain

    d = desired_gain(moving_rms(x, 64), params.target_level, params.max_gain)
    g_full = smooth_gain_scan(d, params.a_att, params.a_rel)
    g1 = smooth_gain_scan(d[:512], params.a_att, params.a_rel)
    g2 = smooth_gain_scan(d[512:], params.a_att, params.a_rel, init=g1[-1])
    np.testing.assert_allclose(
        np.concatenate([np.asarray(g1), np.asarray(g2)]), np.asarray(g_full), rtol=1e-5
    )


class TestSmoothGainParallel:
    """smooth_gain_parallel must equal the sequential scan exactly (it is the
    TPU throughput answer to the per-sample recurrence, VERDICT r1 #1)."""

    def _check(self, d, a_att=0.3935, a_rel=0.0194, init=None, rtol=3e-5):
        from afp_tpu.ops.agc import smooth_gain_parallel

        g_seq = np.asarray(smooth_gain_scan(d, a_att, a_rel, init=init))
        g_par = np.asarray(smooth_gain_parallel(d, a_att, a_rel, init=init))
        np.testing.assert_allclose(g_par, g_seq, rtol=rtol, atol=1e-6)

    def test_realistic_rms_desired(self, rng):
        from afp_tpu.ops.agc import desired_gain

        x = (rng.normal(size=4096) * 0.2).astype(np.float32)
        x[1000:1500] *= 0.05  # quiet stretch
        x[2500:2600] *= 5.0  # burst
        d = desired_gain(moving_rms(x, 512), 0.1, 10.0)
        self._check(d)

    def test_alternating_extremes(self):
        d = np.tile(np.array([10.0, 0.0], dtype=np.float32), 512)
        self._check(d)

    def test_crossing_oscillation(self):
        # desired hovers around the smoothed gain — branch flips every few
        # samples, the hardest case for branch-consistent iteration
        t = np.arange(2048, dtype=np.float32)
        d = (1.0 + 0.01 * np.sin(2 * np.pi * t / 7) + 0.001 * np.sin(t)).astype(np.float32)
        self._check(d)

    def test_random_walk(self, rng):
        d = np.abs(np.cumsum(rng.normal(size=4096) * 0.05) + 1.0).astype(np.float32)
        self._check(d)

    def test_with_carry_and_batch(self, rng):
        d = np.abs(rng.normal(size=(3, 2048)) * 0.5 + 1.0).astype(np.float32)
        init = np.array([0.5, 1.0, 2.0], dtype=np.float32)
        self._check(d, init=init)

    def test_equal_alphas_degenerate(self, rng):
        d = np.abs(rng.normal(size=1024)).astype(np.float32)
        self._check(d, a_att=0.1, a_rel=0.1)

    def test_instant_attack(self, rng):
        # attack_samples == 0 → α = 1 (instant), matching the reference path
        d = np.abs(rng.normal(size=1024)).astype(np.float32)
        self._check(d, a_att=1.0, a_rel=0.05)


class TestAgcScanPallas:
    """The Pallas hardware-loop AGC kernel ≡ the lax.scan recurrence
    (interpret mode here; the engine selects it on the TPU backend)."""

    def _check(self, d, init=None, a_att=0.3935, a_rel=0.0194):
        from afp_tpu.ops.pallas.agc_scan import smooth_gain_scan_pallas

        g_seq = np.asarray(smooth_gain_scan(d, a_att, a_rel, init=init))
        g_pl = np.asarray(smooth_gain_scan_pallas(d, a_att, a_rel, init=init,
                                                  interpret=True))
        np.testing.assert_allclose(g_pl, g_seq, rtol=1e-6, atol=1e-7)

    def test_single_stream(self, rng):
        self._check(np.abs(rng.normal(size=96)).astype(np.float32))

    def test_batched_with_carry(self, rng):
        d = np.abs(rng.normal(size=(5, 64)) + 1.0).astype(np.float32)
        init = np.linspace(0.2, 2.0, 5).astype(np.float32)
        self._check(d, init=init)

    def test_batch_padding_regimes(self, rng):
        # batch not a multiple of the 256-stream tile: padding path
        for B in (1, 3, 257):
            d = np.abs(rng.normal(size=(B, 48)) + 1.0).astype(np.float32)
            self._check(d)

    def test_no_init_restart_semantics(self, rng):
        # g[0] == desired[0] (the reference's per-block restart)
        from afp_tpu.ops.pallas.agc_scan import smooth_gain_scan_pallas

        d = np.abs(rng.normal(size=(2, 32)) + 1.0).astype(np.float32)
        g = np.asarray(smooth_gain_scan_pallas(d, 0.2, 0.02, interpret=True))
        np.testing.assert_allclose(g[:, 0], d[:, 0])


def test_engine_agc_parallel_mode_matches_exact(rng):
    """Full pipeline with agc_mode='parallel' ≡ agc_mode='exact'."""
    import dataclasses

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    cfg = StreamConfig(
        samplerate=44100, blocksize=512, upsample_factor=2, numtaps=65,
        batch=2, eq_enabled=True, agc_enabled=True, agc_mode="exact",
        agc_window_size=128, dither_kind="off", downsample_mode="decimate",
        output_clip=0.99,
    )
    sig = (0.05 * rng.normal(size=(2, 512 * 4))).astype(np.float32)
    outs = {}
    for mode in ("exact", "parallel"):
        c = dataclasses.replace(cfg, agc_mode=mode)
        pipe = Pipeline(c)
        params = pipe.device_params(PipelineParams.design(pipe.cfg))
        _, out = pipe.process_signal(params, pipe.init_state(), sig)
        outs[mode] = np.asarray(out)
    np.testing.assert_allclose(outs["parallel"], outs["exact"], rtol=1e-4, atol=1e-6)


def test_moving_rms_matches_npconvolve(rng):
    x = rng.normal(size=777).astype(np.float32)
    for w in (512, 511, 64, 1):
        ours = np.asarray(moving_rms(x, w))
        gold = np.sqrt(np.convolve(np.square(x.astype(np.float64)), np.ones(w) / w, "same"))
        np.testing.assert_allclose(ours, gold, rtol=1e-4, atol=1e-5)


def test_dither_stats_and_determinism():
    key = jax.random.PRNGKey(42)
    x = np.zeros(200000, dtype=np.float32)
    lsb = 2 / 2**24
    rp = np.asarray(dither(key, x, 24, "rpdf"))
    tp = np.asarray(dither(key, x, 24, "tpdf"))
    off = np.asarray(dither(key, x, 24, "off"))
    np.testing.assert_array_equal(off, x)
    # amplitude bounds: RPDF ±lsb/2, TPDF ±lsb
    assert np.max(np.abs(rp)) <= lsb / 2 + 1e-12
    assert np.max(np.abs(tp)) <= lsb + 1e-12
    assert np.max(np.abs(tp)) > lsb / 2  # triangular really reaches further
    # determinism: same key → same noise
    rp2 = np.asarray(dither(key, x, 24, "rpdf"))
    np.testing.assert_array_equal(rp, rp2)
    # TPDF variance = 2 × RPDF variance
    assert np.var(tp) == pytest.approx(2 * np.var(rp), rel=0.05)


def test_dither_decorrelated_across_streams():
    key = jax.random.PRNGKey(0)
    x = np.zeros((2, 100000), dtype=np.float32)
    noise = np.asarray(dither(key, x, 24, "tpdf"))
    c = np.corrcoef(noise[0], noise[1])[0, 1]
    assert abs(c) < 0.02


def test_blockwise_agc_close_to_exact(rng):
    from afp_tpu.ops.agc import desired_gain, smooth_gain_blockwise

    x = (0.3 * np.sin(2 * np.pi * 3 * np.arange(4096) / 4096)).astype(np.float32) \
        * (0.2 + 0.8 * np.abs(np.sin(2 * np.pi * np.arange(4096) / 4096)))
    params = AGCParams(window_size=512)
    d = desired_gain(moving_rms(x, 512), params.target_level, params.max_gain)
    g_exact = np.asarray(smooth_gain_scan(d, params.a_att, params.a_rel))
    g_fast = np.asarray(smooth_gain_blockwise(d, params.a_att, params.a_rel, chunk=32))
    rel = np.max(np.abs(g_fast - g_exact) / (np.abs(g_exact) + 1e-6))
    assert rel < 0.15  # bounded deviation (τ_release = 51 samples vs chunk 32)


def test_blockwise_agc_exact_on_constant():
    from afp_tpu.ops.agc import smooth_gain_blockwise

    d = np.full(1024, 2.5, dtype=np.float32)
    g1 = np.asarray(smooth_gain_scan(d, 0.2, 0.02))
    g2 = np.asarray(smooth_gain_blockwise(d, 0.2, 0.02, chunk=32))
    np.testing.assert_allclose(g1, g2, rtol=1e-5)


def test_engine_agc_fast_mode(rng):
    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    cfg = StreamConfig(
        samplerate=44100, blocksize=512, upsample_factor=1, numtaps=33,
        batch=2, eq_enabled=False, agc_enabled=True, agc_mode="fast",
        agc_window_size=128, dither_kind="off", downsample_mode="decimate",
        output_clip=0.99,
    )
    pipe = Pipeline(cfg)
    params = pipe.device_params(PipelineParams.design(pipe.cfg))
    sig = (0.01 * rng.normal(size=(2, 512 * 4))).astype(np.float32)
    _, out = pipe.process_signal(params, pipe.init_state(), sig)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    assert np.std(out[:, 1024:]) > np.std(sig) * 2  # AGC boosts quiet input


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu PRNG primitives have no CPU interpret "
                           "lowering; covered by the on-hardware bench probe")
class TestDitherPallas:
    """The hardware-PRNG dither kernel: same distribution and determinism
    contract as the threefry path (runs on real TPU only)."""

    def test_determinism_and_bounds(self):
        from afp_tpu.ops.pallas.dither_pl import dither_pallas

        key = jax.random.PRNGKey(3)
        x = np.zeros((4, 512), dtype=np.float32)
        lsb = 2 / 2**24
        tp = np.asarray(dither_pallas(key, x, 24, "tpdf"))
        rp = np.asarray(dither_pallas(key, x, 24, "rpdf"))
        tp2 = np.asarray(dither_pallas(key, x, 24, "tpdf"))
        np.testing.assert_array_equal(tp, tp2)  # same key → same noise
        assert np.max(np.abs(rp)) <= lsb / 2 + 1e-12
        assert np.max(np.abs(tp)) <= lsb + 1e-12
        assert np.max(np.abs(tp)) > lsb / 2  # triangular reaches further
        # different key → different noise
        tp3 = np.asarray(dither_pallas(jax.random.PRNGKey(4), x, 24, "tpdf"))
        assert np.any(tp3 != tp)

    def test_statistics(self):
        from afp_tpu.ops.pallas.dither_pl import dither_pallas

        key = jax.random.PRNGKey(0)
        x = np.zeros((64, 2048), dtype=np.float32)
        tp = np.asarray(dither_pallas(key, x, 24, "tpdf"))
        rp = np.asarray(dither_pallas(key, x, 24, "rpdf"))
        assert np.var(tp) == pytest.approx(2 * np.var(rp), rel=0.05)
        assert abs(np.mean(tp)) < 2 / 2**24 / 50
        # streams decorrelated
        c = np.corrcoef(tp[0], tp[1])[0, 1]
        assert abs(c) < 0.05

    def test_off_passthrough_and_bad_kind(self):  # pragma: tpu-only
        from afp_tpu.ops.pallas.dither_pl import dither_pallas

        key = jax.random.PRNGKey(0)
        x = np.linspace(-1, 1, 256).astype(np.float32)[None]
        np.testing.assert_array_equal(
            np.asarray(dither_pallas(key, x, 24, "off")), x)
        with pytest.raises(ValueError):
            dither_pallas(key, x, 24, "gauss")


@pytest.mark.parametrize("w", [512, 511, 64])
def test_engine_mxu_rms_matches_fft_rms(rng, w):
    """The MXU band-matrix moving-RMS path ≡ the FFT moving_rms path through
    the full engine (guards the even-window 'same' centering — a 1-sample
    boxcar shift measured −48 dB on hardware, round 2)."""
    import dataclasses

    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    cfg = StreamConfig(
        samplerate=44100, blocksize=512, upsample_factor=1, numtaps=65,
        batch=2, eq_enabled=False, agc_enabled=True, agc_mode="exact",
        agc_window_size=w, dither_kind="off", downsample_mode="decimate",
        output_clip=0.99,
    )
    x = (rng.normal(size=(2, 512)) * 0.1).astype(np.float32)
    p1 = Pipeline(cfg)
    assert p1._rms_band is not None  # the MXU path must actually engage
    pr1 = p1.device_params(PipelineParams.design(p1.cfg))
    _, y1 = p1.step(pr1, p1.init_state(), x)
    p2 = Pipeline(cfg)
    p2._rms_band = None  # force the FFT path
    pr2 = p2.device_params(PipelineParams.design(p2.cfg))
    _, y2 = p2.step(pr2, p2.init_state(), x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-6)


def test_conv_pair_path_bitexact(rng, monkeypatch):
    """The zero-staging conv-pair path (fused AGC apply emits the bf16 hi/lo
    pair, `fir_td_mxu_pair` consumes it with the pair-carried tail) must match
    the staged path across carried blocks to within f32 accumulation order.

    The split itself is elementwise (slicing/concatenating pairs commutes with
    it), but the pair kernel's zero-padded band changes the dot's K extent, and
    the contraction order of an XLA dot is version/backend-dependent — on the
    MXU the measured bound is ~1 ulp (BENCHMARKS.md "Conv-pair path"), and
    jax 0.9's CPU dot emitter introduced the same ulp-scale reorder in
    interpret mode (bitwise equality held through jax 0.8).  Assert the
    documented ulp-scale bound (≤ −110 dB of the block's peak) instead."""
    from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

    cfg = StreamConfig(
        samplerate=44100, blocksize=256, upsample_factor=2, numtaps=33,
        batch=1024, eq_enabled=True, agc_enabled=True, agc_mode="exact",
        agc_window_size=64, agc_carry=True, dither_kind="off",
        downsample_mode="decimate", output_clip=0.99, conv_strategy="td_mxu",
    )
    sig = (rng.normal(size=(3, 1024, 256)) * 0.1).astype(np.float32)

    p_ref = Pipeline(cfg)
    assert not p_ref._conv_pair  # CPU default: staged path
    pr = p_ref.device_params(PipelineParams.design(p_ref.cfg))
    st = p_ref.init_state()
    ref = []
    for b in sig:
        st, y = p_ref._step_impl(pr, st, b)
        ref.append(np.asarray(y))

    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    p_pair = Pipeline(cfg)
    assert p_pair._conv_pair, "pair mode must engage under the force hook"
    pp = p_pair.device_params(PipelineParams.design(p_pair.cfg))
    sp = p_pair.init_state()
    assert isinstance(sp.conv_tail, tuple)  # pair-carried overlap tail
    for i, b in enumerate(sig):
        sp, y = p_pair._step_impl(pp, sp, b)
        diff = np.max(np.abs(np.asarray(y) - ref[i]))
        peak = np.max(np.abs(ref[i]))
        assert diff <= peak * 10 ** (-110 / 20), (
            f"block {i}: pair-path diff {diff:.3e} vs peak {peak:.3e} "
            f"exceeds the -110 dB ulp-scale bound")
