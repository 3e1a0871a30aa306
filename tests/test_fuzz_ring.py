"""Seeded fuzz of the zero-copy serving rings — the flagship serving path.

`tools/hw_check.py` certifies each ring form's numerics contract at ONE
shape; this fuzz draws random ring-capable configs (ingest form × emit ×
AGC chain × link × EQ × shapes) and holds every draw to the SAME contracts
(`fir_td.py` / hw_check.check_serving_ring):

* pair ingest and the fused AGC chain: ring ≡ the SAME pipeline's staged
  ``step()`` sequence, BIT-exact (same kernel bodies, same key walk);
* the f32 / pcm16 conv rings: the ring kernel splits bf16 in VMEM, so the
  bit-exact gold is the staged PAIR pipeline fed the same values (vs the
  staged f32 path they sit in the documented −110 dB accumulation class —
  NOT bitwise, which emit16 would surface as ±1 LSB flips);
* ``emit='pcm16'``: ≡ `quantize_pcm16` of the matching f32-emit ring;
* the emitted tail is the raw input history; `run_ring_mega` ≡ `run_ring`.

Draws whose shape the ring kernels don't support fall out via
`supports_ring_step` — the gate refusing is part of the contract.
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from afp_tpu.engine import Pipeline, PipelineParams, StreamConfig

#: heavy suite — excluded from the fast pass (docs/TESTING.md tiering);
#: run the FULL suite before committing kernel/engine changes
pytestmark = pytest.mark.slow


N_DRAWS = 16


def _draw(rng):
    pick = lambda *xs: xs[rng.integers(len(xs))]
    ingest = pick("f32", "pair", "pcm16")
    agc = bool(pick(False, True)) and ingest != "pair"  # validate() rule
    emit = pick("f32", "f32", "pcm16")
    # dither: bit-exact cross-PIPELINE golds (the conv-ring forms) need it
    # off; within-pipeline comparisons (pair, AGC chain) keep the same key
    # walk, so tpdf stays comparable — except under emit16 in interpret
    # mode, which rejects dither by design (post-pass can't follow the
    # in-kernel quantize)
    same_pipe_gold = agc or ingest == "pair"
    dither = (pick("off", "tpdf")
              if same_pipe_gold and emit != "pcm16" else "off")
    return StreamConfig(
        samplerate=44100,
        # the fused AGC chain's scan kernel tiles at 8 sublanes × 128
        # lanes, so its ring form needs batch ≥ 1024 (smaller batches are
        # gate-refused into the staged path); keep its blocks ≤ 1024 for
        # interpret-mode runtime
        blocksize=int(pick(512, 1024) if agc else pick(512, 1024, 2048)),
        upsample_factor=int(pick(1, 2)),
        numtaps=int(pick(65, 129)),
        batch=1024 if agc else int(pick(128, 256, 512)),
        eq_enabled=bool(pick(False, True)),
        agc_enabled=agc,
        agc_mode="exact",
        agc_window_size=int(pick(128, 256, 512)),
        agc_carry=True,
        agc_link_group=int(pick(1, 2)) if agc else 1,
        resample_quality="fast",  # tier mechanics tested elsewhere
        dither_kind=dither,
        downsample_mode="decimate",
        conv_strategy="td_mxu",
        ingest=ingest,
        emit=emit,
        output_clip=0.99,
    )


def _tails(st):
    t = st.conv_tail
    return t if isinstance(t, tuple) else (t,)


def _run_ring(p, params, rh, rl, K, B, T, emit16, mega=False):
    ring = jnp.zeros((K, B, T), jnp.int16 if emit16 else jnp.float32)
    disp = p.run_ring_mega if mega else p.run_ring
    st, ring = disp(params, p.init_state(seed=5), rh, rl, ring, K)
    return st, np.asarray(ring)


@pytest.mark.parametrize("seed", range(N_DRAWS))
def test_fuzz_ring_matches_staged(seed, monkeypatch):
    monkeypatch.setenv("AFP_AGC_FUSED_FORCE", "1")
    from afp_tpu.ops.pallas.fir_td import quantize_pcm16, split_bf16

    rng = np.random.default_rng(4000 + seed)
    try:
        cfg = _draw(rng).validate()
    except ValueError:
        return  # loud rejection of an invalid combo is a pass
    p = Pipeline(cfg)
    if not p.supports_ring_step:
        return  # the gate refusing unsupported shapes is the contract
    params = p.device_params(PipelineParams.design(p.cfg))

    K, B, T = 3, cfg.batch, cfg.blocksize
    sig = (rng.normal(size=(K, B, T)) * 0.05).astype(np.float32)
    if cfg.agc_link_group == 2:
        sig[:, 1::2] = 0.5 * sig[:, 0::2]
    if cfg.ingest == "pcm16":
        blocks = np.clip(np.round(sig * 32768.0), -32768, 32767
                         ).astype(np.int16)
        floats = blocks.astype(np.float32) / np.float32(32768.0)
    else:
        blocks = floats = sig
    emit16 = cfg.emit == "pcm16"

    # --- the bit-exact gold, per the form's documented contract ---
    same_pipe_gold = cfg.agc_enabled or cfg.ingest == "pair"
    if same_pipe_gold:
        gp, gparams = p, params

        def g_ingest(b):
            return (split_bf16(jnp.asarray(b)) if cfg.ingest == "pair"
                    else jnp.asarray(b))
    else:
        # conv-ring forms are pair-kernel class: gold = the staged PAIR
        # pipeline fed the same values (exact for pcm16's n/32768 floats)
        pcfg = dataclasses.replace(cfg, ingest="pair", emit="f32")
        gp = Pipeline(pcfg)
        gparams = gp.device_params(PipelineParams.design(gp.cfg))

        def g_ingest(b):
            return split_bf16(jnp.asarray(b))

    st = gp.init_state(seed=5)
    gold = []
    gold_src = blocks if same_pipe_gold else floats
    for b in gold_src:
        st, y = gp.step(gparams, st, g_ingest(b))
        gold.append(np.asarray(y))
    gold = np.stack(gold)
    if emit16 and not same_pipe_gold:
        gold = np.asarray(quantize_pcm16(jnp.asarray(gold)))

    # --- ring form of the input ---
    if cfg.ingest == "pair":
        rh, rl = split_bf16(jnp.asarray(blocks))
    else:
        rh, rl = jnp.asarray(blocks), None

    st_r, ring = _run_ring(p, params, rh, rl, K, B, T, emit16)
    np.testing.assert_array_equal(ring, gold)  # BIT-exact per contract

    # emitted tail carry: pair forms carry the gold pipeline's pair tail;
    # conv single-ring forms carry the raw input history verbatim
    if cfg.ingest == "pair" or cfg.agc_enabled:
        for a, b in zip(_tails(st), _tails(st_r)):
            na, nb_ = np.asarray(a), np.asarray(b)
            n = min(na.shape[-1], nb_.shape[-1])
            np.testing.assert_array_equal(na[..., -n:], nb_[..., -n:])
    else:
        tail = np.asarray(st_r.conv_tail)
        assert tail.dtype == blocks.dtype
        np.testing.assert_array_equal(
            tail, blocks[-1][:, -tail.shape[-1]:])
    if cfg.agc_enabled:
        np.testing.assert_array_equal(np.asarray(st.agc_gain),
                                      np.asarray(st_r.agc_gain))

    # one-launch megakernel ≡ per-step ring (conv forms; no AGC mega; the
    # mega's dithered form is TPU-only — it refuses interpret-mode dither)
    if not cfg.agc_enabled and cfg.dither_kind == "off":
        st_m, ring2 = _run_ring(p, params, rh, rl, K, B, T, emit16,
                                mega=True)
        np.testing.assert_array_equal(ring2, ring)
        for a, b in zip(_tails(st_r), _tails(st_m)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
