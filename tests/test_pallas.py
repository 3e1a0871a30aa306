"""Equivalence tests for the Pallas MXU FIR kernel (interpret mode on CPU)."""
import numpy as np
import pytest

from afp_tpu.ops.pallas import band_matrix, fir_conv_xla, fir_td_mxu

#: heavy suite — excluded from the fast pass (docs/TESTING.md tiering);
#: run the FULL suite before committing kernel/engine changes
pytestmark = pytest.mark.slow



def err_db(a, b):
    return 20 * np.log10(np.max(np.abs(np.asarray(a) - b)) / (np.max(np.abs(b)) + 1e-300) + 1e-300)


@pytest.mark.parametrize("N,T,B", [(129, 512, 4), (271, 1024, 2), (64, 256, 8)])
def test_band_matrix_conv_equivalence(rng, N, T, B):
    h = rng.normal(size=N).astype(np.float32)
    x = rng.normal(size=(B, T + N - 1)).astype(np.float32)
    band = band_matrix(h)
    ours = np.asarray(fir_td_mxu(x, band, interpret=True))
    assert ours.shape == (B, T)
    for b in range(B):
        gold = np.convolve(x[b].astype(np.float64), h.astype(np.float64), "valid")
        assert err_db(ours[b], gold) < -90


def test_band_matrix_structure():
    h = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    T = band_matrix(h, tile=4)
    assert T.shape == (6, 4)
    # w @ T with w = [x0..x5] gives causal conv outputs y[2..5]
    x = np.arange(6, dtype=np.float32)
    y = x @ T
    gold = np.convolve(x, h, "valid")
    np.testing.assert_allclose(y, gold)


@pytest.mark.parametrize("N,T,B", [(129, 512, 4), (251, 1024, 2)])
def test_b3_precision_meets_contract(rng, N, T, B):
    """bf16×3 split (3 native MXU passes) must stay under the −90 dB bar for
    audio-range data — the Precision.HIGH algorithm Mosaic doesn't expose."""
    h = (rng.normal(size=N) * 0.1).astype(np.float32)
    x = (rng.normal(size=(B, T + N - 1)) * 0.5).astype(np.float32)
    band = band_matrix(h)
    ours = np.asarray(fir_td_mxu(x, band, interpret=True, precision="B3"))
    for b in range(B):
        gold = np.convolve(x[b].astype(np.float64), h.astype(np.float64), "valid")
        assert err_db(ours[b], gold) < -90


def test_b3_matches_highest_closely(rng):
    h = rng.normal(size=65).astype(np.float32)
    x = rng.normal(size=(2, 256 + 64)).astype(np.float32)
    band = band_matrix(h)
    hi = np.asarray(fir_td_mxu(x, band, interpret=True, precision="HIGHEST"))
    b3 = np.asarray(fir_td_mxu(x, band, interpret=True, precision="B3"))
    assert err_db(b3, hi.astype(np.float64)) < -85


def test_xla_conv_baseline_matches(rng):
    h = rng.normal(size=129).astype(np.float32)
    x = rng.normal(size=(3, 512 + 128)).astype(np.float32)
    ours = np.asarray(fir_conv_xla(x, h))
    for b in range(3):
        gold = np.convolve(x[b].astype(np.float64), h.astype(np.float64), "valid")
        assert err_db(ours[b], gold) < -90


@pytest.mark.parametrize("precision", ["B3F", "B3C"])
def test_alternative_layouts_match_oracle(rng, precision):
    """The in-kernel-split (B3F) and pair-chunk (B3C) layouts are measured
    slower than B3 at the headline shape (see docs/BENCHMARKS.md) but must
    stay numerically correct — chunk-edge stitching especially."""
    N, T, B = 251, 1024, 4
    h = (rng.normal(size=N) * 0.1).astype(np.float32)
    x = (rng.normal(size=(B, T + N - 1)) * 0.5).astype(np.float32)
    band = band_matrix(h)
    ours = np.asarray(fir_td_mxu(x, band, interpret=True, precision=precision))
    for b in range(B):
        gold = np.convolve(x[b].astype(np.float64), h.astype(np.float64), "valid")
        assert err_db(ours[b], gold) < -90


# ---------------- fused AGC kernels (round 2: RMS front half + scan+apply) --


@pytest.mark.parametrize("W,B,T", [(512, 16, 2048), (500, 16, 1024),
                                   (64, 8, 256), (511, 8, 512),
                                   (384, 8, 1024), (128, 8, 512)])
@pytest.mark.parametrize("transposed", [False, True])
def test_rms_desired_fused_matches_oracle(rng, W, B, T, transposed):
    """Fused square→pad→boxcar→sqrt→desired kernel ≡ the staged
    moving_rms + desired_gain path (reference AGC front half,
    `stream_process_AGC.py:60-65`), for exact-bf16 (power-of-two) and
    general window widths, both output layouts."""
    import jax.numpy as jnp

    from afp_tpu.ops.agc import desired_gain, moving_rms
    from afp_tpu.ops.pallas.agc_rms import band_is_exact_bf16, rms_desired_pallas

    x = (rng.normal(size=(B, T)) * 0.1).astype(np.float32)
    band = band_matrix(np.full(W, 1.0 / W, dtype=np.float32))
    exact = band_is_exact_bf16(band)
    assert exact == (W & (W - 1) == 0)  # powers of two are exactly bf16
    lp, rp = W // 2, W - 1 - W // 2
    d = np.asarray(rms_desired_pallas(
        jnp.asarray(x), jnp.asarray(band), lp, rp, 0.1, 10.0,
        exact_band=exact, interpret=True, transposed=transposed))
    if transposed:
        assert d.shape == (T, B)
        d = d.T
    gold = np.asarray(desired_gain(moving_rms(jnp.asarray(x), W), 0.1, 10.0))
    assert err_db(d, gold.astype(np.float64)) < -90


def test_rms_desired_untileable_batch_raises(rng):
    """A batch no candidate tile divides (e.g. B=12) must raise, not
    silently compute only the first floor(B/8)·8 rows (r2 advisor)."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.agc_rms import rms_desired_pallas

    W = 64
    x = (rng.normal(size=(12, 256)) * 0.1).astype(np.float32)
    band = band_matrix(np.full(W, 1.0 / W, dtype=np.float32))
    with pytest.raises(ValueError, match="batch 12"):
        rms_desired_pallas(jnp.asarray(x), jnp.asarray(band),
                           W // 2, W - 1 - W // 2, 0.1, 10.0,
                           exact_band=True, interpret=True)


@pytest.mark.parametrize("B,T", [(300, 1024), (128, 2048), (17, 256)])
@pytest.mark.parametrize("time_major", [False, True])
def test_scan_layout_variants_match(rng, B, T, time_major):
    """time-major input / batch-major output layouts of the Pallas scan are
    bit-compatible with the lax.scan recurrence (incl. padding shapes)."""
    import jax.numpy as jnp

    from afp_tpu.ops.agc import smooth_gain_scan
    from afp_tpu.ops.pallas.agc_scan import smooth_gain_scan_pallas

    d = rng.uniform(0.1, 4.0, size=(B, T)).astype(np.float32)
    din = jnp.asarray(d.T) if time_major else jnp.asarray(d)
    gold = np.asarray(smooth_gain_scan(jnp.asarray(d), 0.15, 0.013))
    y = np.asarray(smooth_gain_scan_pallas(
        din, 0.15, 0.013, interpret=True, time_major=time_major,
        out_batch_major=True))
    assert y.shape == (B, T)
    np.testing.assert_allclose(y, gold, atol=1e-6)
    init = rng.uniform(0.5, 2.0, size=(B,)).astype(np.float32)
    gold_i = np.asarray(smooth_gain_scan(jnp.asarray(d), 0.15, 0.013,
                                         init=jnp.asarray(init)))
    y_i = np.asarray(smooth_gain_scan_pallas(
        din, 0.15, 0.013, init=jnp.asarray(init), interpret=True,
        time_major=time_major, out_batch_major=True))
    np.testing.assert_allclose(y_i, gold_i, atol=1e-6)


@pytest.mark.parametrize("B,T", [(1024, 256), (2048, 512)])
def test_fused_scan_apply_matches_staged(rng, B, T):
    """smooth_gain_apply_pallas ≡ scan → clip(0.1, max_gain) → clip(x·g,
    ±0.99) → carry — the gain array never materializing must not change
    any output or the cross-block carry."""
    import jax.numpy as jnp

    from afp_tpu.ops.agc import smooth_gain_scan
    from afp_tpu.ops.pallas.agc_scan import smooth_gain_apply_pallas

    d = rng.uniform(0.05, 8.0, size=(B, T)).astype(np.float32)
    x = (rng.normal(size=(B, T)) * 0.5).astype(np.float32)
    for init in (None, rng.uniform(0.5, 2.0, size=(B,)).astype(np.float32)):
        ij = None if init is None else jnp.asarray(init)
        g = np.asarray(smooth_gain_scan(jnp.asarray(d), 0.15, 0.013, init=ij))
        g = np.clip(g, 0.1, 4.0)
        y_gold = np.clip(x * g, -0.99, 0.99)
        y, gl = smooth_gain_apply_pallas(
            jnp.asarray(d.T), jnp.asarray(x), 0.15, 0.013, 4.0, init=ij,
            interpret=True)
        np.testing.assert_allclose(np.asarray(y), y_gold, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gl), g[:, -1], atol=1e-6)


def test_fused_scan_apply_rejects_untileable():
    """Non-tileable shapes must raise (the pipeline gate falls back) rather
    than silently pad — padding would corrupt the final-gain carry."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.agc_scan import smooth_gain_apply_pallas

    d = jnp.ones((256, 100), dtype=jnp.float32)
    x = jnp.ones((100, 256), dtype=jnp.float32)
    with pytest.raises(ValueError, match="not tileable"):
        smooth_gain_apply_pallas(d, x, 0.1, 0.01, 4.0, interpret=True)


def test_fused_out_clip_matches_staged(rng):
    """fir_td_mxu(out_clip=c) ≡ clip(fir_td_mxu(...), ±c) — the fused output
    clamp (reference ±0.99, `stream_process_AGC.py:180`) must be a pure
    store-stage epilogue."""
    h = (rng.normal(size=129) * 0.2).astype(np.float32)
    x = (rng.normal(size=(4, 512 + 128)) * 2.0).astype(np.float32)
    band = band_matrix(h)
    plain = np.asarray(fir_td_mxu(x, band, interpret=True))
    assert np.max(np.abs(plain)) > 0.99  # the clip must actually bite
    fused = np.asarray(fir_td_mxu(x, band, interpret=True, out_clip=0.99))
    np.testing.assert_allclose(fused, np.clip(plain, -0.99, 0.99), atol=0)


def test_fir_td_pair_matches_b3(rng):
    """fir_td_mxu_pair on split inputs must be BIT-identical to the B3 path
    on the concatenated extended signal (the VMEM concat + same three bf16
    passes)."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import fir_td_mxu_pair, split_bf16

    for taps, T, B in ((129, 512, 8), (257, 256, 16)):
        h = (rng.normal(size=taps) * 0.1).astype(np.float32)
        x = (rng.normal(size=(B, T)) * 0.4).astype(np.float32)
        tail = (rng.normal(size=(B, taps - 1)) * 0.4).astype(np.float32)
        ext = np.concatenate([tail, x], axis=1)
        band = band_matrix(h)
        ref = np.asarray(fir_td_mxu(jnp.asarray(ext), jnp.asarray(band),
                                    interpret=True, precision="B3"))
        xh, xl = split_bf16(jnp.asarray(x))
        th, tl = split_bf16(jnp.asarray(tail))
        got = np.asarray(fir_td_mxu_pair(xh, xl, th, tl, jnp.asarray(band),
                                         interpret=True))
        np.testing.assert_array_equal(got, ref)
        # fused clip rides along
        got_c = np.asarray(fir_td_mxu_pair(xh, xl, th, tl, jnp.asarray(band),
                                           interpret=True, out_clip=0.05))
        np.testing.assert_array_equal(got_c, np.clip(ref, -0.05, 0.05))


def test_agc_apply_emit_split_matches_plain(rng):
    """emit_split=True must return exactly (split_bf16(y), carry) of the
    plain fused apply."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.agc_scan import smooth_gain_apply_pallas
    from afp_tpu.ops.pallas.fir_td import split_bf16

    B, T = 1024, 256
    d = rng.uniform(0.2, 4.0, size=(T, B)).astype(np.float32)
    x = (rng.normal(size=(B, T)) * 0.3).astype(np.float32)
    y, gl = smooth_gain_apply_pallas(jnp.asarray(d), jnp.asarray(x),
                                     0.2, 0.02, 4.0, interpret=True)
    (yh, yl), gl2 = smooth_gain_apply_pallas(
        jnp.asarray(d), jnp.asarray(x), 0.2, 0.02, 4.0, interpret=True,
        emit_split=True)
    rh, rl = split_bf16(y)
    assert yh.dtype == jnp.bfloat16 and yl.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(yh), np.asarray(rh))
    np.testing.assert_array_equal(np.asarray(yl), np.asarray(rl))
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(gl2))


def test_fir_td_ring_matches_pair(rng):
    """fir_td_mxu_ring on slot `idx` must be bit-identical to
    fir_td_mxu_pair on the sliced block, and every OTHER slot of the
    (aliased) output ring must come through untouched."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import (fir_td_mxu_pair, fir_td_mxu_ring,
                                           split_bf16)

    taps, T, B, S = 129, 512, 8, 3
    h = (rng.normal(size=taps) * 0.1).astype(np.float32)
    band = jnp.asarray(band_matrix(h))
    ring = (rng.normal(size=(S, B, T)) * 0.4).astype(np.float32)
    rh, rl = split_bf16(jnp.asarray(ring))
    tail = (rng.normal(size=(B, taps - 1)) * 0.4).astype(np.float32)
    th, tl = split_bf16(jnp.asarray(tail))
    sentinel = np.full((S, B, T), 7.0, np.float32)
    for idx in range(S):
        ref = np.asarray(fir_td_mxu_pair(rh[idx], rl[idx], th, tl, band,
                                         interpret=True))
        out = np.asarray(fir_td_mxu_ring(rh, rl, idx, th, tl, band,
                                         jnp.asarray(sentinel),
                                         interpret=True))
        np.testing.assert_array_equal(out[idx], ref)
        others = [s for s in range(S) if s != idx]
        np.testing.assert_array_equal(out[others], sentinel[others])
    # fused output clip rides along, same slot discipline
    ref_c = np.asarray(fir_td_mxu_pair(rh[1], rl[1], th, tl, band,
                                       interpret=True, out_clip=0.05))
    out_c = np.asarray(fir_td_mxu_ring(rh, rl, 1, th, tl, band,
                                       jnp.asarray(sentinel), interpret=True,
                                       out_clip=0.05))
    np.testing.assert_array_equal(out_c[1], ref_c)


def test_agc_ring_input_kernels_match_plain(rng):
    """The ring-input variants of the AGC front/back kernels (scalar-
    prefetch slot select) must be bit-identical to the plain kernels on
    the sliced slot."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.agc_rms import rms_desired_pallas
    from afp_tpu.ops.pallas.agc_scan import smooth_gain_apply_pallas
    from afp_tpu.ops.pallas.fir_td import band_matrix

    S, B, T, w = 3, 8, 512, 128  # w: LANE multiple → two-level kernel
    ring = (rng.normal(size=(S, B, T)) * 0.4).astype(np.float32)
    band = band_matrix(np.full(w, 1.0 / w, dtype=np.float32))
    lp, rp = w // 2, w - 1 - w // 2
    for idx in range(S):
        ref = np.asarray(rms_desired_pallas(
            ring[idx], band, lp, rp, 0.2, 4.0, exact_band=True,
            interpret=True, transposed=True))
        got = np.asarray(rms_desired_pallas(
            jnp.asarray(ring), band, lp, rp, 0.2, 4.0, exact_band=True,
            interpret=True, transposed=True, ring_idx=idx))
        np.testing.assert_array_equal(got, ref)
    # non-LANE-multiple window → direct kernel path through the ring too
    w2 = 65
    band2 = band_matrix(np.full(w2, 1.0 / w2, dtype=np.float32))
    ref2 = np.asarray(rms_desired_pallas(
        ring[1], band2, w2 // 2, w2 - 1 - w2 // 2, 0.2, 4.0,
        exact_band=False, interpret=True))
    got2 = np.asarray(rms_desired_pallas(
        jnp.asarray(ring), band2, w2 // 2, w2 - 1 - w2 // 2, 0.2, 4.0,
        exact_band=False, interpret=True, ring_idx=1))
    np.testing.assert_array_equal(got2, ref2)

    # fused apply: ring-input x, both emit forms
    B2 = 1024  # tileable (sub 8 × 128 lanes)
    ring2 = (rng.normal(size=(S, B2, T)) * 0.4).astype(np.float32)
    d = (rng.uniform(0.5, 2.0, size=(T, B2))).astype(np.float32)
    for emit in (False, True):
        ref = smooth_gain_apply_pallas(
            d, ring2[2], 0.3, 0.05, 4.0, init=None, out_clip=0.99,
            interpret=True, emit_split=emit)
        got = smooth_gain_apply_pallas(
            d, jnp.asarray(ring2), 0.3, 0.05, 4.0, init=None,
            out_clip=0.99, interpret=True, emit_split=emit, ring_idx=2)
        if emit:
            np.testing.assert_array_equal(np.asarray(got[0][0]),
                                          np.asarray(ref[0][0]))
            np.testing.assert_array_equal(np.asarray(got[0][1]),
                                          np.asarray(ref[0][1]))
        else:
            np.testing.assert_array_equal(np.asarray(got[0]),
                                          np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_fir_td_pair_to_ring_matches_pair(rng):
    """fir_td_mxu_pair_to_ring must equal fir_td_mxu_pair on the same
    inputs, writing only slot `idx` of the aliased output ring."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import (fir_td_mxu_pair,
                                           fir_td_mxu_pair_to_ring,
                                           split_bf16)

    taps, T, B, S = 129, 512, 8, 3
    h = (rng.normal(size=taps) * 0.1).astype(np.float32)
    band = jnp.asarray(band_matrix(h))
    x = (rng.normal(size=(B, T)) * 0.4).astype(np.float32)
    xh, xl = split_bf16(jnp.asarray(x))
    tail = (rng.normal(size=(B, taps - 1)) * 0.4).astype(np.float32)
    th, tl = split_bf16(jnp.asarray(tail))
    sentinel = np.full((S, B, T), 7.0, np.float32)
    ref = np.asarray(fir_td_mxu_pair(xh, xl, th, tl, band, interpret=True,
                                     out_clip=0.3))
    out = np.asarray(fir_td_mxu_pair_to_ring(
        xh, xl, th, tl, band, 1, jnp.asarray(sentinel), interpret=True,
        out_clip=0.3))
    np.testing.assert_array_equal(out[1], ref)
    np.testing.assert_array_equal(out[[0, 2]], sentinel[[0, 2]])


def test_fir_td_ring_emit_tail(rng):
    """``emit_tail``: the ring kernels additionally return the NEXT step's
    overlap pair — bit-identical to slicing the last k_pad samples of
    ``concat(tail, x)`` — while the ring output stays identical to the
    non-emitting call.  Covers both tail regimes (k_pad < T and k_pad > T,
    where the emitted tail stitches old-tail and block columns)."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import (fir_td_mxu_pair_to_ring,
                                           fir_td_mxu_ring, split_bf16)

    B, S = 8, 3
    for taps, T in ((129, 512), (257, 128)):
        kp = -(-(taps - 1) // 128) * 128
        h = (rng.normal(size=taps) * 0.1).astype(np.float32)
        band = jnp.asarray(band_matrix(h))
        ring = (rng.normal(size=(S, B, T)) * 0.4).astype(np.float32)
        rh, rl = split_bf16(jnp.asarray(ring))
        tail = (rng.normal(size=(B, kp)) * 0.4).astype(np.float32)
        th, tl = split_bf16(jnp.asarray(tail))
        sentinel = jnp.full((S, B, T), 7.0, jnp.float32)
        exth = np.concatenate([np.asarray(th), np.asarray(rh[1])], axis=-1)
        extl = np.concatenate([np.asarray(tl), np.asarray(rl[1])], axis=-1)

        base = np.asarray(fir_td_mxu_ring(rh, rl, 1, th, tl, band, sentinel,
                                          interpret=True))
        out, nh, nl = fir_td_mxu_ring(rh, rl, 1, th, tl, band, sentinel,
                                      interpret=True, emit_tail=True)
        np.testing.assert_array_equal(np.asarray(out), base)
        np.testing.assert_array_equal(np.asarray(nh), exth[:, -kp:])
        np.testing.assert_array_equal(np.asarray(nl), extl[:, -kp:])

        out2, nh2, nl2 = fir_td_mxu_pair_to_ring(
            rh[1], rl[1], th, tl, band, 1, sentinel, interpret=True,
            emit_tail=True)
        np.testing.assert_array_equal(np.asarray(out2)[1], base[1])
        np.testing.assert_array_equal(np.asarray(nh2), exth[:, -kp:])
        np.testing.assert_array_equal(np.asarray(nl2), extl[:, -kp:])


def test_fir_td_pair_rejects_bad_shapes(rng):
    """The pair kernel must raise cleanly (not silently truncate) on a batch
    no tile divides and on T not a multiple of 128."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import fir_td_mxu_pair, split_bf16

    h = (rng.normal(size=33) * 0.1).astype(np.float32)
    band = band_matrix(h)
    xh, xl = split_bf16(jnp.asarray(
        rng.normal(size=(12, 256)).astype(np.float32)))
    th, tl = split_bf16(jnp.asarray(
        rng.normal(size=(12, 32)).astype(np.float32)))
    with pytest.raises(ValueError, match="batch 12"):
        fir_td_mxu_pair(xh, xl, th, tl, band, interpret=True)
    xh2, xl2 = split_bf16(jnp.asarray(
        rng.normal(size=(8, 200)).astype(np.float32)))
    th2, tl2 = split_bf16(jnp.asarray(
        rng.normal(size=(8, 32)).astype(np.float32)))
    with pytest.raises(ValueError, match="multiple of 128"):
        fir_td_mxu_pair(xh2, xl2, th2, tl2, band, interpret=True)


def test_merge_bf16_roundtrip(rng):
    """merge_bf16 is the inverse of split_bf16 to combined-bf16 precision."""
    import jax.numpy as jnp

    from afp_tpu.ops.pallas.fir_td import merge_bf16, split_bf16

    v = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    hi, lo = split_bf16(v)
    err = np.max(np.abs(np.asarray(merge_bf16(hi, lo)) - np.asarray(v)))
    assert err < np.max(np.abs(np.asarray(v))) * 2 ** -16


def test_f32_ring_tile_picker_tracks_pair_picker():
    """The dithered f32-ring ↔ staged-pair bit-equality certified by
    tools/hw_check.py requires the two kernels' batch-tile pickers to
    agree (the fused-dither PRNG seeds per batch-tile program, so a tile
    mismatch remaps noise to different rows).  Pin the agreement at the
    hw_check shape and the bench headline shape so a picker edit cannot
    silently break the hardware contract."""
    from afp_tpu.ops.pallas.fir_td import (_pick_b_tile_b3t,
                                           _pick_b_tile_b3t_f32)

    # hw_check.check_serving_ring shape: B=1024, T=2048, k_pad=256
    assert _pick_b_tile_b3t(1024, 256, 2048) == \
        _pick_b_tile_b3t_f32(1024, 256, 2048)
    # both pickers must share the candidate ladder (the f32 kernel's
    # larger VMEM footprint may step DOWN earlier, never off-ladder)
    for B, k_pad, T in ((4096, 4096, 4096), (512, 128, 512),
                        (8, 128, 256)):
        pt = _pick_b_tile_b3t(B, k_pad, T)
        ft = _pick_b_tile_b3t_f32(B, k_pad, T)
        assert ft <= pt and pt % ft == 0, (B, k_pad, T, pt, ft)
