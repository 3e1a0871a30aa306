"""Offline filter-response plots (L4, SURVEY.md §1).

Re-creates `/root/reference/plot_filter.py:11-132`'s 3-panel figure —
magnitude dB (8000-pt freqz), wrapped phase, centered impulse stem (max 200
samples) — with the same adaptive axis rule (log scale iff Nyquist > 20 kHz).
Differences by design: headless Agg rendering to a file/Figure instead of a
forced Qt5Agg interactive window (the engine is a server-side framework), and
our first-party freqz instead of scipy's.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..design.freqz import freqz

__all__ = ["plot_filter_response"]


def plot_filter_response(coefficients, fs: float = 44100,
                         filter_type: Optional[str] = None,
                         save_path: Optional[str] = None,
                         show: bool = False):
    """Render the 3-panel response figure. Returns the matplotlib Figure.

    `save_path` writes a PNG; `show=True` attempts a non-blocking interactive
    display (only if a GUI backend is available).
    """
    import matplotlib

    if not show:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    coefficients = np.asarray(coefficients, dtype=np.float64)

    fig = plt.figure(figsize=(12, 8))
    gs = fig.add_gridspec(3, 1, height_ratios=[2, 1, 1])
    ax_mag = fig.add_subplot(gs[0, 0])
    ax_phase = fig.add_subplot(gs[1, 0])
    ax_impulse = fig.add_subplot(gs[2, 0])

    w, h = freqz(coefficients, worN=8000, fs=fs)
    magnitude = 20 * np.log10(np.abs(h) + 1e-8)
    phase = np.angle(h)

    nyquist = fs / 2
    if nyquist > 20000:
        x_scale = "log"
        x_ticks = [x for x in [20, 100, 1000, 10000, nyquist] if x <= nyquist]
        x_lim = (20, nyquist)
    else:
        x_scale = "linear"
        x_ticks = np.linspace(0, nyquist, num=9)
        x_lim = (0, nyquist)

    if x_scale == "log":
        ax_mag.semilogx(w, magnitude, color="C0")
    else:
        ax_mag.plot(w, magnitude, color="C0")
    peak_mag = np.max(magnitude)
    mag_range = max(5, peak_mag + 5)
    title_type = (filter_type or "FIR").capitalize()
    ax_mag.set_title(f"{title_type} Filter Response (Fs={fs/1000:.1f}kHz)")
    ax_mag.set_ylabel("Magnitude (dB)")
    ax_mag.set_ylim(-120, mag_range)
    ax_mag.set_xticks(x_ticks)
    ax_mag.set_xticklabels([f"{int(x)}" if x >= 1 else f"{x:.1f}" for x in x_ticks])
    ax_mag.grid(True, which="both", linestyle=":")
    ax_mag.set_xlim(x_lim)

    if x_scale == "log":
        ax_phase.semilogx(w, phase, color="C1")
    else:
        ax_phase.plot(w, phase, color="C1")
    ax_phase.set_ylabel("Phase (radians)")
    ax_phase.set_xlabel("Frequency (Hz)")
    ax_phase.grid(True, which="both", linestyle=":")
    ax_phase.set_xticks(x_ticks)
    ax_phase.set_xticklabels([f"{int(x)}" if x >= 1 else f"{x:.1f}" for x in x_ticks])
    ax_phase.set_xlim(x_lim)

    impulse_response = coefficients.copy()
    center = len(impulse_response) // 2
    plot_range = min(200, len(impulse_response))
    start = max(0, center - plot_range // 2)
    end = min(len(impulse_response), start + plot_range)
    markerline, stemlines, _ = ax_impulse.stem(
        np.arange(start, end),
        impulse_response[start:end],
        linefmt="C2-",
        markerfmt="C2o",
        basefmt="C7:",
    )
    plt.setp(stemlines, "linewidth", 0.5)
    plt.setp(markerline, "markersize", 3)
    ax_impulse.set_title("Impulse Response (Centered)")
    ax_impulse.set_xlabel("Samples")
    ax_impulse.set_ylabel("Amplitude")
    ax_impulse.grid(True, linestyle=":")
    ax_impulse.set_xlim(start, end)

    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=100)
    if show:
        plt.show(block=False)
        plt.pause(0.1)
    return fig
