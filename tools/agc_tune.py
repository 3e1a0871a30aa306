#!/usr/bin/env python
"""AGC scan-kernel tile sweep on real hardware.

The fused AGC back half (`ops/pallas/agc_scan.py:smooth_gain_apply_pallas`)
is a serial per-sample recurrence: each grid step runs T_CHUNK dependent
VPU steps over a [SUBLANES, 128] register set, so wall time is bounded by
dependency-chain latency, not VMEM traffic (ROADMAP perf item #1).  More
sublanes per tile = more independent chains hiding that latency, but VMEM
caps the product SUBLANES x T_CHUNK (the d/x/y blocks + chunk scratch are
all proportional to it).  This sweep measures the real chip's optimum over
(SUBLANES, T_CHUNK) at the C8 operating point ([4096, 2048], the AGC stage
runs pre-upsample at the raw block size, `stream_process_AGC.py:132-144`).

Run from the repo root (NO PYTHONPATH — it breaks axon plugin discovery):

    python tools/agc_tune.py [B] [T]
"""
import os
import signal
import sys
import time

# repo-root importability without PYTHONPATH (env PYTHONPATH breaks the axon
# TPU plugin discovery — docs/ROADMAP.md dev-environment note)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/afp_jax_cache")


def _alarm(seconds: int):
    def handler(signum, frame):
        raise TimeoutError(f"stage exceeded {seconds}s")

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    import jax
    import jax.numpy as jnp
    import numpy as np

    import afp_tpu.ops.pallas.agc_scan as mod

    rng = np.random.default_rng(0)
    d_tm = jnp.asarray(rng.uniform(0.2, 4.0, size=(T, B)).astype(np.float32))
    x = jnp.asarray((rng.standard_normal((B, T)) * 0.1).astype(np.float32))
    a_att, a_rel, mg = 0.2, 0.02, 4.0

    # correctness oracle from the current configuration (f64 host recurrence)
    dn = np.asarray(d_tm, dtype=np.float64).T  # [B, T]
    g = dn[:, 0].copy()
    gold = np.empty_like(dn)
    gold[:, 0] = g
    for t in range(1, T):
        alpha = np.where(dn[:, t] > g, a_att, a_rel)
        g = alpha * dn[:, t] + (1.0 - alpha) * g
        gold[:, t] = g
    gold_y = np.clip(np.asarray(x, np.float64) * np.clip(gold, 0.1, mg),
                     -0.99, 0.99)

    base = (mod.SUBLANES, mod.T_CHUNK)
    results = []
    # T_CHUNK must be a multiple of 128 (it is the minor dim of the
    # batch-major output block); (32, 256) exceeds scoped VMEM
    for sub, tc in ((8, 128), (16, 128), (32, 128), (8, 256), (16, 256)):
        if T % tc or B % (sub * mod.LANES):
            continue
        mod.SUBLANES, mod.T_CHUNK = sub, tc
        jax.clear_caches()

        # marginal per-block cost, measured the way the engine runs it: a
        # lax.scan of K kernel invocations inside ONE jitted dispatch (an
        # unjitted per-block wrapper call measures tunnel dispatch overhead,
        # ~13 ms, not the ~0.2 ms kernel)
        K = 32

        @jax.jit
        def fn(d, xx):
            def body(carry, _):
                y, gl = mod.smooth_gain_apply_pallas(
                    d, xx, a_att, a_rel, mg, init=carry)
                return gl, jnp.sum(y)
            gl, ys = jax.lax.scan(body, d[0], None, length=K)
            return gl, ys

        try:
            _alarm(240)
            y, gl = mod.smooth_gain_apply_pallas(d_tm, x, a_att, a_rel, mg)
            float(jnp.sum(y))  # force + tunnel sync
            err = float(np.max(np.abs(np.asarray(y, np.float64) - gold_y)))
            gl2, ys = fn(d_tm, x)  # compile
            float(jnp.sum(ys))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                gl2, ys = fn(d_tm, x)
                float(jnp.sum(ys) + jnp.sum(gl2))
                times.append((time.perf_counter() - t0) / K)
            signal.alarm(0)
            ms = min(times) * 1e3
            results.append((sub, tc, ms, err))
            print(f"sub={sub:4d} t_chunk={tc:4d}  {ms:7.3f} ms/block  "
                  f"err={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"sub={sub:4d} t_chunk={tc:4d}  FAILED: {e}", flush=True)
            jax.clear_caches()
    mod.SUBLANES, mod.T_CHUNK = base

    if results:
        best = min(results, key=lambda r: r[2])
        print(f"\nbest: sub={best[0]} t_chunk={best[1]} {best[2]:.3f} ms "
              f"(current config sub={base[0]} t_chunk={base[1]})")


if __name__ == "__main__":
    main()
