#!/usr/bin/env python
"""Measure the regime where `smooth_gain_parallel` (the associative-scan
AGC solver) beats `smooth_gain_scan` (lax.scan) — VERDICT r4 weak #5.

The solver's shipped scope claim is "backends without the Pallas scan
kernel (CPU/GPU), or very long T".  This probe times both on the CPU
backend across (B, T) shapes and prints a table; run with
``JAX_PLATFORMS=cpu`` (ad-hoc scripts must force CPU — the axon plugin
ignores the env var, so we set the config here).

Usage: PYTHONPATH=. python tools/agc_parallel_probe.py
"""
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from afp_tpu.ops.agc import smooth_gain_parallel, smooth_gain_scan  # noqa: E402


def main():
    a_att, a_rel = 0.28, 0.08
    scan = jax.jit(lambda d: smooth_gain_scan(d, a_att, a_rel))
    par = jax.jit(lambda d: smooth_gain_parallel(d, a_att, a_rel))
    print(f"{'B':>5} {'T':>8} {'scan_ms':>9} {'parallel_ms':>12} {'par/scan':>9}")
    for B, T in [(8, 4096), (64, 4096), (8, 65536), (64, 65536),
                 (1, 262144), (8, 262144)]:
        rng = np.random.default_rng(0)
        d = jnp.asarray(np.abs(rng.normal(size=(B, T))).astype(np.float32))
        for f in (scan, par):
            f(d).block_until_ready()  # compile
        ts = {}
        for name, f in (("scan", scan), ("par", par)):
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                f(d).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            ts[name] = best * 1e3
        # consistency while we're here
        err = float(jnp.max(jnp.abs(scan(d) - par(d))))
        print(f"{B:>5} {T:>8} {ts['scan']:>9.2f} {ts['par']:>12.2f} "
              f"{ts['par'] / ts['scan']:>9.2f}  (maxdiff {err:.2e})")


if __name__ == "__main__":
    main()
