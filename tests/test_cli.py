"""CLI smoke tests (offline WAV processing, design, devices)."""
import numpy as np
import pytest

from afp_tpu.cli import main
from afp_tpu.utils import read_wav, write_wav


def test_cli_process_wav(tmp_path, rng, capsys):
    src = str(tmp_path / "in.wav")
    dst = str(tmp_path / "out.wav")
    x = (0.3 * rng.standard_normal((2, 44100))).astype(np.float32).clip(-1, 1)
    write_wav(src, x, 44100)
    rc = main(["process", src, dst, "--blocksize", "1024", "--upsample", "2",
               "--numtaps", "65", "--cutoff", "10000", "--dither", "off"])
    assert rc == 0
    y, rate = read_wav(dst)
    assert rate == 44100
    assert y.shape[0] == 2
    assert np.all(np.isfinite(y))
    # lowpass at 10k must attenuate HF energy: compare spectra
    X = np.abs(np.fft.rfft(x[0]))
    Y = np.abs(np.fft.rfft(y[0, : x.shape[1]]))
    hf = slice(int(15000 / 44100 * x.shape[1]), None)
    assert np.mean(Y[hf]) < 0.1 * np.mean(X[hf])


def test_cli_process_with_eq_and_agc(tmp_path, rng):
    src = str(tmp_path / "in.wav")
    dst = str(tmp_path / "out.wav")
    x = (0.01 * rng.standard_normal((1, 22050))).astype(np.float32)
    write_wav(src, x, 44100)
    rc = main(["process", src, dst, "--blocksize", "1024", "--upsample", "1",
               "--numtaps", "65", "--eq-gains", "1,1,1,1,1,1,1,1,1",
               "--agc", "--dither", "off"])
    assert rc == 0
    y, _ = read_wav(dst)
    assert np.std(y[:, 4096:]) > np.std(x) * 1.5  # AGC boost


def test_cli_design(tmp_path, capsys):
    plot = str(tmp_path / "resp.png")
    taps = str(tmp_path / "taps.txt")
    rc = main(["design", "--cutoff", "11000", "--numtaps", "101",
               "--plot", plot, "--taps-out", taps])
    assert rc == 0
    import os

    assert os.path.getsize(plot) > 1000
    h = np.loadtxt(taps)
    assert h.shape == (101,)


def test_cli_devices(capsys):
    assert main(["devices"]) == 0
    assert capsys.readouterr().out.strip()


def test_cli_process_keeps_partial_final_block(tmp_path, rng):
    """An input that isn't a whole number of blocks must come back at full
    length (the final partial block used to be silently dropped)."""
    src, dst = str(tmp_path / "in.wav"), str(tmp_path / "out.wav")
    x = (0.3 * rng.standard_normal((1, 22050))).astype(np.float32).clip(-1, 1)
    write_wav(src, x, 44100)
    rc = main(["process", src, dst, "--blocksize", "1024", "--upsample", "1",
               "--numtaps", "65", "--dither", "off"])
    assert rc == 0
    y, _ = read_wav(dst)
    assert y.shape == (1, 22050)
    assert np.any(y[:, -512:])  # the tail carries real audio, not silence
