"""Equivalence tests for the Pallas MXU FIR kernel (interpret mode on CPU)."""
import numpy as np
import pytest

from afp_tpu.ops.pallas import band_matrix, fir_conv_xla, fir_td_mxu


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
