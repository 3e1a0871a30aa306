"""CPU flow rehearsal of the on-hardware validation sweep.

``tools/hw_check.py`` normally refuses to run off-TPU: its asserts certify
compiled-lowering numerics.  But a *wiring* bug in the sweep itself — a
config a check builds wrong, a ring-form mismatch, a dtype contract break —
would crash mid-sweep and burn a hardware window (one such emit16 cfg bug
was caught by review before the first run; this rehearsal would have caught
it mechanically).  ``AFP_HW_CHECK_CPU_FLOW=1`` runs the SAME sweep on the
CPU backend in interpret mode with only the hardware-only claims relaxed
(see the hw_check module docstring).

The full rehearsal runs every check at hardware shapes and takes several
minutes on a 1-CPU box, so it is opt-in::

    AFP_RUN_HW_FLOW=1 python -m pytest tests/test_hw_check_flow.py -x -q

Run it before every hardware sweep (tools/hw_check.py's own docs say the
same).  The always-on test below is the cheap structural half: flow mode
must select the right checks, skip the PRNG-backed ones, and keep the
hardware mode's gate intact.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "hw_check.py")


def _run(env_extra, timeout):
    # drop PYTHONPATH (breaks the axon plugin) and any mode flags from the
    # developer shell — each case must pin its own mode, or an exported
    # AFP_HW_CHECK_CPU_FLOW=1 would flip the hw-mode case into a rehearsal
    drop = ("PYTHONPATH", "AFP_HW_CHECK_CPU_FLOW", "AFP_AGC_FUSED_FORCE")
    env = {k: v for k, v in os.environ.items() if k not in drop}
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, SCRIPT], cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True)


def test_hw_mode_refuses_cpu_and_points_at_flow():
    """Without the flag, the sweep still hard-requires a TPU (the numeric
    contract must never silently certify on CPU) — and the error now tells
    the operator about the rehearsal mode."""
    r = _run({"JAX_PLATFORMS": "cpu"}, timeout=300)
    assert r.returncode == 2, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["ok"] is False
    assert "AFP_HW_CHECK_CPU_FLOW" in out["error"]


@pytest.mark.skipif(os.environ.get("AFP_RUN_HW_FLOW", "0") != "1",
                    reason="full flow rehearsal is opt-in (several minutes "
                           "at hardware shapes on 1 CPU): AFP_RUN_HW_FLOW=1")
def test_full_flow_rehearsal():
    """The whole sweep, CPU backend, interpret mode, hardware shapes."""
    r = _run({"JAX_PLATFORMS": "cpu", "AFP_HW_CHECK_CPU_FLOW": "1"},
             timeout=3000)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["ok"] is True
    assert out["mode"] == "cpu_flow"
    assert out["skipped"] == ["check_dither", "check_fused_dither"]
    # every non-skipped check contributed at least one result key
    for key in ("fir_379t_4096x256_B3", "fir_ps_B3", "agc_restart",
                "fused_clip_exact", "agc_rms_fused_w512",
                "agc_one_kernel_vs_f64", "conv_pair_max_abs_diff",
                "serving_ring_pair_max_abs_diff",
                "offline_fold_f32_max_abs_diff",
                "offline_fold_ps_pair_max_abs_diff"):
        assert key in out, key
