"""Per-stream parameter bank tests."""
import numpy as np
import pytest

from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig
from afp_tpu.engine.batch import broadcast_gains, with_per_stream_gains


def make(batch, **kw):
    base = dict(
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
    pipe_td, _ = make(batch=2, eq_enabled=False, conv_strategy="td_mxu")
    with pytest.raises(NotImplementedError, match="fft"):
        with_per_stream_filters(pipe_td, [dict(), dict()])


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
