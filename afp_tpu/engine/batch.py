"""Per-stream parameter banks (SURVEY.md §7 step 5).

The reference runs one stream with one parameter set.  The TPU engine's
scaling axis is thousands of concurrent streams — and each can carry its OWN
EQ gain vector (and, via gain-weighted band combination, its own effective
kernel): `combined_response` is a ``[B, n_bands] × [n_bands, F]`` contraction
followed by a broadcast multiply, so per-stream banks cost one small matmul
and zero recompilation.

Supported on both conv strategies: the FFT path contracts gains into a
[B, F] response (one small matmul); the td_mxu path evaluates every band's
convolution in one wide MXU dot and mixes per stream in-kernel
(``fir_td_mxu_per_stream`` — costs n_bands× the shared dot, so FFT is the
better per-stream strategy at large band counts).  Per-stream *tap-level*
kernels (different numtaps per stream) are intentionally out of scope: that
is a shape change, which the static-shape contract forbids mid-stream.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .config import PipelineParams
from .pipeline import DeviceParams, Pipeline

__all__ = ["with_per_stream_gains", "with_per_stream_filters",
           "with_per_stream_agc", "broadcast_gains", "StreamPacking"]


def with_per_stream_agc(pipe: Pipeline, params: DeviceParams,
                        target_level=None, max_gain=None,
                        attack=None, release=None) -> DeviceParams:
    """Per-stream AGC POLICY banks (VERDICT r4 #6): promote any of the
    batch-global AGC knobs to a [batch] vector — a mixed-tenant batch can
    then carry one AGC policy per stream through the same fused kernels.

    `target_level` / `max_gain`: scalars or [batch] vectors, stored
    directly.  `attack` / `release`: per-stream TIME constants (the
    reference's knobs, `/root/reference/stream_process_AGC.py:43-89`),
    converted per stream with the reference α rule
    (:func:`afp_tpu.ops.agc.agc_alphas` at the pipeline's static
    ``agc_window_size``).  Omitted knobs keep their current (scalar or
    vector) value.

    The vectors ride the same batch tiles the fused RMS/scan/apply
    kernels already walk (lane-broadcast target tiles; carry-shaped α
    tiles), the serving-ring chain consumes them unchanged, and
    checkpointing round-trips them (DeviceParams is flattened
    generically).  Exclusions, both falling back gracefully: the opt-in
    one-kernel AGC (`AFP_AGC_ONE_KERNEL`) runs the two-kernel chain
    under vector params, and ``agc_link_group`` members should share a
    policy (linked streams share one gain — per-member targets would be
    overridden by the group-min semantics anyway).
    """
    cfg = pipe.cfg
    if not cfg.agc_enabled:
        raise ValueError("with_per_stream_agc requires agc_enabled=True")
    B = pipe.batch

    def vec(v, name):
        a = np.asarray(v, dtype=np.float32)
        if a.ndim == 0:
            return jnp.float32(a)
        if a.shape != (B,):
            raise ValueError(f"{name} must be a scalar or [{B}] vector, "
                             f"got shape {a.shape}")
        return jnp.asarray(a)

    upd = {}
    if target_level is not None:
        upd["agc_target"] = vec(target_level, "target_level")
    if max_gain is not None:
        upd["agc_max_gain"] = vec(max_gain, "max_gain")
    from ..ops.agc import agc_alphas

    for name, times, field in (("attack", attack, "agc_a_att"),
                               ("release", release, "agc_a_rel")):
        if times is None:
            continue
        t = np.asarray(times, dtype=np.float64)
        if t.ndim == 0:
            a_att, a_rel = agc_alphas(cfg.agc_window_size, float(t), float(t))
            upd[field] = jnp.float32(a_att if name == "attack" else a_rel)
            continue
        if t.shape != (B,):
            raise ValueError(f"{name} must be a scalar or [{B}] vector, "
                             f"got shape {t.shape}")
        alphas = np.empty(B, dtype=np.float32)
        for b in range(B):
            a_att, a_rel = agc_alphas(cfg.agc_window_size,
                                      float(t[b]), float(t[b]))
            alphas[b] = a_att if name == "attack" else a_rel
        upd[field] = jnp.asarray(alphas)
    return params._replace(**upd)


@dataclasses.dataclass(frozen=True)
class StreamPacking:
    """Stream→tile design packing for banked per-stream filters
    (VERDICT r4 #4).

    The banked td_mxu kernels select ONE design per batch-tile row group
    (scalar-prefetch addressing — `engine/batch.py:_banked_tile`), so an
    ARBITRARY interleaving of per-stream designs used to require the
    caller to pre-sort streams (or silently lose the banked kernels).
    This object carries the permutation that sorts the caller's streams
    into tile-compatible device order, and its inverse:

    * ``pack(x)``   — caller order → device order (apply at ingest);
    * ``unpack(y)`` — device order → caller order (apply on drain; a
      host-side gather on the [B, L] output, cheap next to the dispatch).

    `perm[p] = c` means device row ``p`` processes caller stream ``c``.
    Link groups (``agc_link_group > 1``) are permuted WHOLE — groups stay
    adjacent, so the linked group-min semantics are unchanged.  Works on
    numpy or jax arrays, any batch axis (blocks ``[B, L]``, signals
    ``[B, T]``, stacked blocks ``[nb, B, L]`` via ``axis=1``).
    """

    perm: np.ndarray  # device_row -> caller_row
    inv: np.ndarray  # caller_row -> device_row

    @property
    def identity(self) -> bool:
        return bool(np.array_equal(self.perm, np.arange(len(self.perm))))

    def pack(self, x, axis: int = 0):
        """Reorder caller-order streams into device (tile-sorted) order."""
        if isinstance(x, np.ndarray):
            return np.take(x, self.perm, axis=axis)
        return jnp.take(jnp.asarray(x), jnp.asarray(self.perm), axis=axis)

    def unpack(self, y, axis: int = 0):
        """Restore device-order outputs to the caller's stream order."""
        if isinstance(y, np.ndarray):
            return np.take(y, self.inv, axis=axis)
        return jnp.take(jnp.asarray(y), jnp.asarray(self.inv), axis=axis)


def broadcast_gains(gains, batch: int, n_bands: int) -> jnp.ndarray:
    """Normalize a gain spec to [batch, n_bands]: accepts [n_bands] (shared),
    [batch, n_bands] (per-stream), or a scalar."""
    g = jnp.asarray(np.asarray(gains, dtype=np.float32))
    if g.ndim == 0:
        g = jnp.full((batch, n_bands), g)
    elif g.ndim == 1:
        if g.shape[0] != n_bands:
            raise ValueError(f"expected {n_bands} gains, got {g.shape[0]}")
        g = jnp.broadcast_to(g[None, :], (batch, n_bands))
    elif g.ndim == 2:
        if g.shape != (batch, n_bands):
            raise ValueError(f"expected gains [{batch}, {n_bands}], got {g.shape}")
    else:
        raise ValueError("gains must be scalar, [n_bands], or [batch, n_bands]")
    return g


def with_per_stream_gains(pipe: Pipeline, params: DeviceParams,
                          gains) -> DeviceParams:
    """Return params with a per-stream gain matrix [batch, n_bands].

    ``combined_response`` then yields a [batch, F] response — each stream is
    filtered by its own EQ curve in the same fused FFT pass.
    """
    cfg = pipe.cfg
    if not (cfg.eq_enabled and len(cfg.eq_bands)):
        # H_bands is a [1, F] placeholder then and combined_response
        # statically ignores eq_gains — accepting the call would silently
        # no-op (or reject a correct [B, n_bands] matrix with a
        # misleading shape error)
        raise ValueError(
            "with_per_stream_gains requires eq_enabled=True with at "
            "least one EQ band (per-stream gains weight the band bank)")
    n_bands = params.H_bands.shape[0]
    g = broadcast_gains(gains, pipe.batch, n_bands)
    return params._replace(eq_gains=g)


def _batched_convolve(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Full linear conv of shared `a` [K] with each row of `b` [B, N]
    (float64, one batched FFT — the cold design path for stream banks)."""
    K, N = len(a), b.shape[-1]
    n = 1 << (K + N - 2).bit_length()
    out = np.fft.irfft(np.fft.rfft(a, n) * np.fft.rfft(b, n, axis=-1), n,
                       axis=-1)
    return out[..., : K + N - 1]


def _design_sort_perm(assign: np.ndarray, link: int = 1) -> np.ndarray:
    """Stable permutation grouping identical designs contiguously —
    whole ``agc_link_group`` blocks move together (the linked group-min
    runs over adjacent streams, so groups must stay intact)."""
    B = len(assign)
    if link > 1:
        g = assign.reshape(B // link, link)
        if not np.all(g == g[:, :1]):
            raise ValueError(
                "pack=True requires a constant design within each "
                f"agc_link_group of {link} adjacent streams (linked "
                "streams share one gain and must share one kernel)")
        order = np.argsort(g[:, 0], kind="stable")
        return (order[:, None] * link
                + np.arange(link)[None, :]).reshape(-1)
    return np.argsort(assign, kind="stable")


def with_per_stream_filters(pipe: Pipeline, variants: Sequence[dict],
                            bt: Optional[int] = None,
                            pack: bool = False):
    """Per-stream MAIN-FILTER banks (SURVEY §7 step 5: "each stream can have
    its own kernel"): design one main filter per stream from `variants`
    (dicts of dynamic design-field overrides — cutoff, filter_type,
    window_type, design_method) and upload a [B, F] response bank.  Each
    stream is then filtered by its own kernel in the same fused FFT pass —
    the response multiply broadcasts over the batch, so the hot path is
    unchanged and swaps stay glitch-free.

    Constraints (all enforced):
    * one variant per stream (len == batch),
    * overrides must be shape-preserving (numtaps/blocksize/… are static —
      change them per stream and the batch no longer shares one program),
    * ``eq_enabled=False`` (per-band × per-stream cascade banks would be
      [B, n_bands, F] — design per-stream EQ by folding band gains into
      the per-stream kernel instead).

    Both conv strategies are supported.  The FFT path carries a [B, F]
    response bank (true per-stream granularity).  The **td_mxu** path
    (SURVEY §7.5 on the fast strategy — VERDICT r3 #3) deduplicates the
    variants into a [D, n_casc] cascade bank plus a per-tile design
    assignment consumed by the BANKED Pallas kernels
    (`ops.pallas.fir_td.fir_td_mxu_banked` and the f32/pcm16 serving-ring
    forms): each batch tile's band matrix is selected by scalar-prefetch
    ADDRESSING, so per-stream designs run at the shared-kernel dot cost.
    The price is granularity: streams sharing a design must occupy whole
    batch-tile row groups (the kernel's tile ladder, ≥ 8 rows, larger
    when VMEM allows) — group identical designs contiguously, or use the
    fft strategy for row-level banks.  Every ingest works: pcm16/pair
    serving RINGS feed the banked kernels natively (raw int16 slots
    convert in VMEM — exact), while their STAGED steps reconstruct the
    f32 window from the split pair (exact for pcm16; the documented
    ~2⁻¹⁶ pair class for f32 pair ingest).  The offline fold stays
    disabled (scan path; `Pipeline._fold_decision`); `bt` overrides the
    assignment tile for wide meshes.

    ``pack=True`` (VERDICT r4 #4) lifts the contiguity requirement for
    ARBITRARY interleaved orderings: the variants are sorted into
    tile-compatible device order and the call returns ``(params,
    StreamPacking)`` — apply ``packing.pack`` at ingest and
    ``packing.unpack`` on drain (or hand the packing to `RingServer`,
    which does both).  Per-stream outputs are identical to the unpacked
    ordering; only the device-side row order changes.  Each design's
    MULTIPLICITY must still tile (a multiple of 8 rows after sorting —
    the MXU tile floor); ``agc_link_group`` blocks move whole and must
    be design-constant.
    """
    cfg = pipe.cfg
    if len(variants) != pipe.batch:
        raise ValueError(f"need {pipe.batch} variants, got {len(variants)}")
    if cfg.eq_enabled and len(cfg.eq_bands):
        raise NotImplementedError(
            "per-stream filter banks require eq_enabled=False "
            "(fold per-stream EQ into the kernel design instead)"
        )
    _STATIC = {"numtaps", "blocksize", "upsample_factor", "batch",
               "samplerate", "min_phase", "agc_window_size"}
    mains = []
    design0 = None
    for ov in variants:
        bad = _STATIC.intersection(ov)
        if bad:
            raise ValueError(f"per-stream overrides cannot change {sorted(bad)}"
                             " (shape-static fields)")
        c = dataclasses.replace(cfg, **ov).validate()
        if c.numtaps != cfg.numtaps:
            # validate() bumps even numtaps to odd for highpass/bandstop
            # (a type-II FIR has a forced Nyquist zero) — a per-variant
            # bump changes the kernel length, which np.stack would reject
            # (mixed variants) or the bank assignment would silently
            # truncate (all variants bumped)
            raise ValueError(
                f"variant {ov!r} changes numtaps {cfg.numtaps} → "
                f"{c.numtaps} (the even→odd bump for "
                f"{c.filter_type}): use an odd base numtaps so every "
                "per-stream kernel shares one static length")
        d = PipelineParams.design(c)
        if design0 is None:
            design0 = d
        mains.append(d.main_taps.astype(np.float64))
    mains = np.stack(mains)  # [B, n_kernel]

    if pipe.fused:
        casc = _batched_convolve(pipe._h_up_np, mains)
        if pipe._h_down_np is not None:
            casc = _batched_convolve(pipe._h_down_np, casc)
        casc = casc[:, :: pipe.upf]  # phase-0 polyphase component
        bank = np.zeros((pipe.batch, pipe.n_casc))
        bank[:, : casc.shape[-1]] = casc[:, : pipe.n_casc]
    else:
        bank = mains
    # base params built from variant 0's already-computed design (its
    # H_main is replaced on the next line anyway; every other field
    # depends only on the shared cfg — re-designing the base filter here
    # would double the cold bank-build cost for nothing)
    params = pipe.device_params(design0)
    if not pipe._use_td:
        H_main = jnp.fft.rfft(jnp.asarray(bank, jnp.float32), n=pipe.nfft,
                              axis=-1)
        p = params._replace(H_main=H_main)
        if pack:  # fft banks are row-granular — packing is the identity
            ident = np.arange(pipe.batch)
            return p, StreamPacking(perm=ident, inv=ident.copy())
        return p

    # ---- td_mxu: deduplicated design bank + tile-constant assignment ----
    uniq: dict = {}
    assign = np.empty(pipe.batch, dtype=np.int32)
    for b in range(pipe.batch):
        key = bank[b].tobytes()
        if key not in uniq:
            uniq[key] = len(uniq)
        assign[b] = uniq[key]
    designs = np.empty((len(uniq), pipe.n_casc))
    for b in range(pipe.batch):
        designs[assign[b]] = bank[b]
    packing = None
    if pack:
        perm = _design_sort_perm(assign, link=pipe.cfg.agc_link_group)
        packing = StreamPacking(perm=perm, inv=np.argsort(perm))
        assign = assign[perm]
        bank = bank[perm]  # the [B, F] response bank rides device order too
    H_main = jnp.fft.rfft(jnp.asarray(bank, jnp.float32), n=pipe.nfft,
                          axis=-1)
    bt = _banked_tile(pipe, assign, bt)
    params = params._replace(
        H_main=H_main,
        casc_bank=jnp.asarray(designs, jnp.float32),
        casc_assign=jnp.asarray(assign[::bt], jnp.int32),
    )
    return (params, packing) if pack else params


def _banked_tile(pipe: Pipeline, assign: np.ndarray,
                 bt: Optional[int] = None) -> int:
    """The batch tile the banked kernels will run at: a ladder value that
    divides the batch, sits at or below BOTH kernels' VMEM picks (staged +
    ring — a smaller tile always fits), and within which the design
    assignment is CONSTANT.

    The DEFAULT additionally caps the tile at ``max(8, B // 8)`` so the
    per-tile assignment has at least 8 entries on non-tiny batches — a
    bank built at global batch then shards over up to 8 devices without
    the caller thinking about tiles (shard_map splits `casc_assign` on
    the batch axis; one tile per mesh would not divide — r4 review
    finding).  Pass `bt` explicitly for other topologies (wider meshes
    need smaller tiles; a single device can take the largest).  Raises
    with guidance when the assignment is too fine (the MXU tile floor is
    8 rows)."""
    from ..ops.pallas.fir_td import (LANE, _pick_b_tile, _pick_b_tile_b3t_f32)

    B = pipe.batch
    n_casc = pipe.n_casc
    k_pad = -(-max(n_casc - 1, 1) // LANE) * LANE
    text = pipe.block + n_casc - 1
    cap = min(_pick_b_tile(B, text, pipe.block),
              _pick_b_tile_b3t_f32(B, k_pad, pipe.block))
    if bt is not None:
        if bt > cap or B % bt or bt not in (256, 128, 64, 32, 16, 8, B):
            raise ValueError(
                f"bt={bt} must be a ladder tile ≤ the VMEM pick {cap} "
                f"dividing batch {B}")
        groups = assign.reshape(B // bt, bt)
        if not np.all(groups == groups[:, :1]):
            raise ValueError(
                f"design assignment is not constant within bt={bt} row "
                "groups")
        return bt
    default_cap = min(cap, max(8, B // 8))
    for cand in (256, 128, 64, 32, 16, 8):
        if cand > default_cap or B % cand:
            continue
        groups = assign.reshape(B // cand, cand)
        if np.all(groups == groups[:, :1]):
            return cand
    if B <= 8 and np.all(assign == assign[0]):
        return B
    raise ValueError(
        "per-stream designs must be constant within aligned batch-tile "
        "row groups (multiples of 8 rows; the MXU tile floor) — pass "
        "pack=True to sort arbitrary orderings into tile-compatible "
        "device order (with_per_stream_filters then returns (params, "
        "StreamPacking)), or use conv_strategy='fft' for row-level banks")
