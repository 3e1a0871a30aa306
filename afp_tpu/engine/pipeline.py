"""The fused streaming pipeline (device hot path).

Re-creates the reference block chain — ASRC → AGC → upsample → multiband EQ →
main FIR → downsample → clip → dither (`/root/reference/stream_process_AGC.py
:91-201`, `stream_process.py:79-120`) — as one jitted step over HBM-resident
``[batch, block]`` arrays, with all streaming state carried functionally so
the whole run can be a single ``lax.scan``.

TPU-native fusion beyond the reference's combined-EQ-kernel trick
(`stream_process_EQ_GUI.py:87-90`): the EQ bank *and* the main filter are
folded into ONE frequency response,

    H_comb = (Σ_i gain_i · H_band_i) · H_main

so the entire filtering stage is a single rfft → complex multiply → irfft
overlap-save pass.  Gain changes are a [1, n_bands] × [n_bands, F] product —
runtime data, never a recompile (the glitch-free reconfig property,
SURVEY.md §2.4).

Latency semantics: one block in → one block out, zero-primed state — the
same contract as the reference's sounddevice callback.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.agc import AGCParams, desired_gain, moving_rms, smooth_gain_scan
from ..ops.convolve import next_pow2
from ..ops.dither import dither
from ..ops.resample import PolyResampler, decimate
from .config import PipelineParams, StreamConfig

__all__ = ["DeviceParams", "StreamState", "Pipeline"]

#: max serving steps per megakernel launch (`run_ring_mega`): Mosaic's fixed
#: SMEM footprint for the mega kernel leaves only ~7 KB of the 1 MB SMEM for
#: the [n_steps, 1] scalar-prefetch dither-seed array, so longer dispatches
#: chain multiple launches (bit-identical — see _run_ring_mega_impl).
MEGA_CHUNK_STEPS = int(os.environ.get("AFP_MEGA_CHUNK_STEPS", "512"))


class DeviceParams(NamedTuple):
    """Runtime (dynamic) parameter bank living in HBM.

    Swapping these arrays is the TPU expression of the reference's
    double-buffered `filter_lock` parameter swap
    (`stream_process_EQ_GUI.py:50-55, 380-385`): same shapes → no recompile.
    """

    H_bands: jnp.ndarray  # [n_bands, F] band kernel spectra
    H_main: jnp.ndarray  # [F] main kernel spectrum
    eq_gains: jnp.ndarray  # [n_bands]
    agc_target: jnp.ndarray  # [] scalar
    agc_max_gain: jnp.ndarray  # []
    agc_a_att: jnp.ndarray  # []
    agc_a_rel: jnp.ndarray  # []
    # time-domain cascade taps (fused path; for the 'td_mxu' strategy)
    casc_bands: Optional[jnp.ndarray] = None  # [n_bands, n_casc]
    casc_main: Optional[jnp.ndarray] = None  # [n_casc]
    #: precomputed wide band matrix for per-stream td mixing (rebuilt at
    #: parameter-swap time, not per block — r2 review finding)
    casc_wide: Optional[jnp.ndarray] = None  # [n_casc-1+128, n_bands*128]
    #: per-stream FILTER banks on td_mxu (`engine.batch
    #: .with_per_stream_filters`): the deduplicated design bank and the
    #: PER-TILE design assignment (length B/bt — bt is recovered
    #: statically from the shape, so it needs no extra field).  The banked
    #: conv kernels select each batch tile's band matrix by scalar-prefetch
    #: addressing — per-stream filters at the shared-kernel dot cost.
    casc_bank: Optional[jnp.ndarray] = None  # [D, n_casc]
    casc_assign: Optional[jnp.ndarray] = None  # [B // bt] int32

    def combined_response(self, eq_enabled: bool,
                          premultiplied: bool = False) -> jnp.ndarray:
        """The live frequency response.

        `premultiplied=False`: H_bands are raw band spectra → multiply the
        gain-combined EQ by H_main (the literal multirate chain).
        `premultiplied=True` (fused single-rate path): H_bands are already
        full per-band *cascade* spectra (upsampler ⊛ band ⊛ main ⊛
        downsampler, phase-0 polyphase) → just gain-combine; H_main is the
        no-EQ cascade.
        """
        if eq_enabled and self.H_bands.shape[0] > 0:
            # precision is load-bearing: this contraction runs on the MXU,
            # whose DEFAULT f32 path rounds inputs to bf16 — measured −49.6 dB
            # through the per-stream FFT path (round-2 hardware probe)
            H_eq = jnp.tensordot(self.eq_gains, self.H_bands, axes=1,
                                 precision=jax.lax.Precision.HIGHEST)
            return H_eq if premultiplied else H_eq * self.H_main
        return self.H_main

    def combined_cascade(self, eq_enabled: bool) -> jnp.ndarray:
        """Time-domain fused kernel [n_casc] (td_mxu strategy): the gain
        combination is linear in the taps, same as in frequency."""
        if eq_enabled and self.casc_bands is not None and self.casc_bands.shape[0] > 0:
            return jnp.tensordot(self.eq_gains, self.casc_bands, axes=1,
                                 precision=jax.lax.Precision.HIGHEST)
        return self.casc_main


class StreamState(NamedTuple):
    """Carried streaming state (pytree; all shapes static)."""

    asrc: Optional[PolyResampler]
    up: Optional[PolyResampler]
    #: [B, N_f − 1] overlap-save input history — f32 array, or the bf16
    #: (hi, lo) pair in conv-pair mode (`Pipeline._conv_pair`)
    conv_tail: jnp.ndarray
    down: Optional[PolyResampler]
    agc_gain: Optional[jnp.ndarray]  # [B] carried smoothed gain
    key: jax.Array
    #: [B, 50, n_bins] scan-carried spectrum ring (waterfall_enabled)
    wf: Optional[jnp.ndarray] = None


class Pipeline:
    """Compiled streaming pipeline for a fixed (static) StreamConfig.

    Usage::

        pipe = Pipeline(cfg)
        params = pipe.device_params(PipelineParams.design(cfg))
        state = pipe.init_state(seed=0)
        state, out = pipe.step(params, state, block)      # jitted
        state, outs = pipe.run(params, state, blocks)     # lax.scan over time
    """

    def __init__(self, cfg: StreamConfig):
        cfg = cfg.validate()
        self.cfg = cfg
        self.batch = cfg.batch
        self.block = cfg.blocksize
        self.upf = cfg.upsample_factor
        self.up_block = cfg.blocksize * cfg.upsample_factor

        # fused kernel length: EQ band (numtaps') ⊛ main (numtaps')
        n_design = cfg.numtaps // 2 + cfg.numtaps % 2 if cfg.min_phase else cfg.numtaps
        self.n_kernel = n_design
        self.n_fused = (
            2 * n_design - 1 if (cfg.eq_enabled and len(cfg.eq_bands) > 0) else n_design
        )

        # --- single-rate fusion (the TPU fast path) ---
        # upsample(U) → filter → downsample(U) with base-rate output is
        # algebraically y[n] = Σ_p cascade[U·(n−p)]·x[p]: ONE base-rate FIR
        # with the phase-0 polyphase component of the full cascade.
        # upsampled-rate output keeps the literal multirate chain (the fusion
        # exists precisely because the output returns to base rate)
        self.upsampled_out = cfg.output_rate == "upsampled" and self.upf > 1
        self.fused = bool(cfg.fuse_rate_conversion) and not self.upsampled_out
        if self.fused:
            from ..ops.resample import streaming_kernel

            if self.upf > 1:
                self._h_up_np = streaming_kernel(
                    self.upf, 1, quality=cfg.resample_quality)
                self._h_down_np = (
                    streaming_kernel(1, self.upf, quality=cfg.resample_quality)
                    if cfg.downsample_mode == "resample"
                    else None
                )
            else:
                self._h_up_np = np.ones(1)
                self._h_down_np = None
            n_total = len(self._h_up_np) + self.n_fused - 1
            if self._h_down_np is not None:
                n_total += len(self._h_down_np) - 1
            self.n_casc = -(-n_total // self.upf)  # ceil: decimated length
            self.nfft = next_pow2(self.block + self.n_casc - 1)
        else:
            self.n_casc = None
            self.nfft = next_pow2(self.up_block + self.n_fused - 1)

        #: Pallas kernels interpret off-TPU (CPU tests) and compile on-chip
        self._pl_interpret = jax.default_backend() != "tpu"
        # td_mxu strategy: precompute the band-matrix gather pattern
        self._use_td = self.fused and cfg.conv_strategy == "td_mxu"
        if self._use_td:
            from ..ops.pallas.fir_td import LANE

            rows = self.n_casc - 1 + LANE
            i = np.arange(rows)[:, None]
            j = np.arange(LANE)[None, :]
            k = self.n_casc - 1 + j - i
            self._band_mask = jnp.asarray((k >= 0) & (k < self.n_casc))
            self._band_idx = jnp.asarray(np.clip(k, 0, self.n_casc - 1),
                                         dtype=jnp.int32)
        self.agc = AGCParams(
            target_level=cfg.agc_target_level,
            window_size=cfg.agc_window_size,
            max_gain=cfg.agc_max_gain,
            attack=cfg.agc_attack,
            release=cfg.agc_release,
        )
        # AGC moving-RMS execution: the boxcar is just another FIR, and the
        # FFT convolution it defaults to is the slowest op on TPU (XLA FFTs
        # are matmul-emulated; measured 5.4 of the C8 chain's 5.6 ms/block,
        # r2 ablation).  Route it through the MXU band-matrix kernel when
        # shapes allow (block multiple of 128, batch divisible by a tile).
        self._rms_band = None
        self._rms_exact = False
        self._agc_fused_apply = False
        if cfg.agc_enabled and cfg.agc_window_size > 1 and self.block % 128 == 0:
            from ..ops.pallas.agc_rms import band_is_exact_bf16
            from ..ops.pallas.fir_td import band_matrix

            w = cfg.agc_window_size
            band_np = band_matrix(np.full(w, 1.0 / w, dtype=np.float32))
            from ..ops.pallas.agc_rms import _pick_tile as _rms_tile

            # gate on the SAME (B, T, W) call the kernel's _call makes —
            # _pick_tile raises when no tile divides the batch (r2 advisor:
            # the old gate passed the extended width as T, overestimating the
            # footprint and mis-gating some shapes)
            try:
                _rms_tile(self.batch, self.block, w,
                          two_level=(w >= 128 and w % 128 == 0))
                rms_tileable = True
            except ValueError:
                rms_tileable = False
            if rms_tileable:
                self._rms_band = jnp.asarray(band_np)
                # numpy 'same' centering: out[t] covers x[t−w//2 … t+w−1−w//2]
                self._rms_pad = (w // 2, w - 1 - w // 2)
                # power-of-two windows (the reference default min(512, bs//2))
                # have an exactly-bf16 boxcar weight → the fused kernel skips
                # its third MXU pass
                self._rms_exact = band_is_exact_bf16(band_np)
                # scan+clip+apply+carry fuse into one kernel when the batch
                # tiles exactly (no pad round trip); block % 128 == 0 already
                # guarantees the time axis
                from ..ops.pallas.agc_scan import LANES, _pick_sublanes

                self._agc_fused_apply = (
                    self.batch % (_pick_sublanes(self.batch) * LANES) == 0
                )
        # Single-kernel AGC (r3, opt-in): RMS + desired gain + scan + clip
        # + apply in ONE pass (ops/pallas/agc_fused.py).  MEASURED NEGATIVE
        # on v5e at the C8 point — the two-kernel chain is pareto-optimal
        # under DMA/compute overlap (287/324 vs 279 µs/block across two
        # fused builds; BENCHMARKS.md "Single-kernel AGC: measured
        # negative").  Kept opt-in (AFP_AGC_ONE_KERNEL=1) because its
        # chunk-prefix window sums are ~2⁷× tighter than the bf16 MXU
        # boxcar (window-local 2⁻²⁴ vs 2⁻¹⁷) — an accuracy option, not a
        # throughput one.  Both the staged step and the serving ring key
        # on this flag, so the two stay bit-identical either way.
        # (linked AGC excludes it: the fused kernel never materializes the
        # desired gain, so there is nowhere to apply the group-min — the
        # two-kernel chain handles agc_link_group > 1.)
        self._agc_one_kernel = False
        if (self._rms_band is not None and self._agc_fused_apply
                and cfg.agc_link_group == 1
                and cfg.agc_mode not in ("fast", "parallel")
                and os.environ.get("AFP_AGC_ONE_KERNEL", "0") == "1"):
            from ..ops.pallas.agc_fused import fused_rms_supported

            self._agc_one_kernel = fused_rms_supported(
                self.batch, self.block, cfg.agc_window_size,
                self._rms_pad[0])
        # Test hook: the fused AGC kernels normally run only on the TPU
        # backend; this forces them (in interpret mode) so CPU CI covers the
        # fused/pair code paths end-to-end.
        self._force_fused = os.environ.get("AFP_AGC_FUSED_FORCE", "0") == "1"
        # Pair mode: the fused AGC apply kernel emits the bf16 hi/lo pair and
        # the conv kernel consumes it (plus the pair-carried overlap tail)
        # directly — the conv input staging pass (concat + split, a full HBM
        # round trip) disappears.  Only meaningful for bf16-class conv.
        from ..ops.pallas.fir_td import PRECISION_MODE as _td_prec

        #: the fused AGC → pair-conv chain is live: exact-mode AGC with the
        #: fused apply kernel emitting the bf16 pair straight into the
        #: pair-input conv (the C8 serving chain).  Distinct from
        #: `_conv_pair` below, which is also set by pair/pcm16 ingest —
        #: the ring step's AGC branch and the pcm16 raw-x handoff key on
        #: THIS flag (exact-mode fused semantics), not on `_conv_pair`.
        #: 'fast' mode's fused blockwise recurrence (chunk-32 attack/release
        #: + in-kernel interpolation — smooth_gain_apply_pallas(blockwise=))
        #: rides the SAME fused-apply/ring chain as 'exact'; only
        #: 'parallel' (the associative-scan solver, an XLA composition)
        #: stays on the unfused path.
        self._agc_blockwise = 32 if cfg.agc_mode == "fast" else None
        #: fast mode streams chunk MEANS of the desired gain between the
        #: RMS and apply kernels (`rms_desired_pallas(mean_chunk=)` →
        #: `smooth_gain_apply_pallas(d_is_means=True)`) — the blockwise
        #: recurrence never needs per-sample d, so the chain's largest
        #: intermediate shrinks 32× in HBM.  Linked AGC keeps per-sample d
        #: (the group-min runs on d before the means are taken — min of
        #: means ≠ mean of mins).
        self._agc_means = bool(self._agc_blockwise
                               and cfg.agc_link_group == 1)
        self._agc_chain_pair = (
            self._agc_fused_apply and self._use_td
            and _td_prec in ("B3", "B3F", "B3C")
            and cfg.agc_mode != "parallel"
            and (not self._pl_interpret or self._force_fused)
        )
        self._conv_pair = self._agc_chain_pair
        # Pair ingest (cfg.ingest='pair'): blocks arrive as the bf16 hi/lo
        # pair and feed the pair-input conv kernel directly — no on-device
        # input staging at all (the split lives wherever ingest does).
        # Validate() guarantees td_mxu + no agc/asrc; bf16-class precision
        # is required because the pair IS the bf16 operand split.
        self._pair_ingest = (
            cfg.ingest == "pair" and self._use_td
            and _td_prec in ("B3", "B3F", "B3C")
        )
        if cfg.ingest == "pair" and not self._pair_ingest:
            raise ValueError(
                "ingest='pair' requires a bf16-class conv precision "
                f"(AFP_TD_PRECISION is {_td_prec!r})")
        # int16 PCM ingest (cfg.ingest='pcm16'): blocks arrive as raw int16
        # PCM (n/32768 full scale) and the conv kernels convert + split in
        # VMEM — exact for 16-bit data, half the input HBM/ingest bytes
        # (fir_td.py:_load_f32).  The staged step splits at device entry
        # (bit-identical — convert and split are elementwise).
        self._i16_ingest = (
            cfg.ingest == "pcm16" and self._use_td
            and _td_prec in ("B3", "B3F", "B3C")
        )
        if cfg.ingest == "pcm16" and not self._i16_ingest:
            raise ValueError(
                "ingest='pcm16' requires a bf16-class conv precision "
                f"(AFP_TD_PRECISION is {_td_prec!r})")
        self._conv_pair = (self._conv_pair or self._pair_ingest
                           or self._i16_ingest)
        # pcm16 + AGC: the conv consumes the GAIN-APPLIED signal, so the
        # overlap tail stays the bf16 pair the AGC kernel emits — only the
        # AGC x-reads ride int16.  `_i16_tail` marks the raw-int16 tail
        # carry (conv consumes x itself); `_i16_agc_raw` marks the fused
        # AGC chain consuming the raw int16 block/ring slot (the kernels
        # convert in VMEM — agc_rms/agc_scan/agc_fused `_load_f32` notes).
        self._i16_tail = self._i16_ingest and not cfg.agc_enabled
        self._i16_agc_raw = self._i16_ingest and self._agc_chain_pair
        # int16 PCM output contract (cfg.emit='pcm16'): the final output
        # stage quantizes int16(clip(round(y·32768), ±fs)) — fused into
        # the conv kernel's store on the td serving paths
        # (fir_td._finish_tile), an XLA epilogue everywhere else.  Output
        # HBM bytes and the device→host drain halve; the dither (clamped
        # to ≤16 bits by validate()) decorrelates exactly this quantizer.
        self._emit16 = cfg.emit == "pcm16"
        #: bf16-class conv precision — the B3 split kernels (pair ingest,
        #: fused AGC pair chain, f32 serving ring) all require it
        self._td_b3 = _td_prec in ("B3", "B3F", "B3C")
        if self._use_td:
            # tail is carried padded to a LANE multiple so every window
            # slice in the ring/pair kernels is lane-aligned
            # (fir_td.py:_fir_kernel_b3t / _fir_kernel_b3t_f32)
            from ..ops.pallas.fir_td import LANE as _lane

            self._k_pad = -(-max(self.n_casc - 1, 1) // _lane) * _lane
        # Device-side ASRC runs only in 'compat' mode (reference semantics);
        # in 'exact' mode the StreamEngine's host AsrcFrontend owns rate
        # conversion and the device pipeline sees engine-rate blocks.
        self._asrc_device = bool(
            cfg.source_samplerate
            and cfg.source_samplerate != cfg.samplerate
            and cfg.asrc_mode == "compat"
        )
        # compat submode: streaming when the block divides the reduced
        # decimation factor, else the reference's stateless per-block
        # conversion (`stream_process_AGC.py:126-129`)
        self._asrc_stateless = False
        if self._asrc_device:
            import math as _math

            g = _math.gcd(cfg.samplerate, cfg.source_samplerate)
            self._asrc_stateless = bool(self.block % (cfg.source_samplerate // g))

        # NOTE: no donate_argnums — the engine's degradation ladder keeps the
        # previous state alive to recover from a failed step (a donated state
        # buffer would be dead after any exception).  State is tiny (tails),
        # so donation buys nothing here.
        self._step = jax.jit(self._step_impl)
        self._run = jax.jit(self._run_impl)

    # ---------------- dynamic reconfiguration ----------------

    def refresh_dynamic(self, cfg: StreamConfig) -> None:
        """Absorb a dynamic-only config change (same `static_key()`):
        update `cfg` and re-derive the AGC α values so subsequent
        :meth:`device_params` banks reflect the new target/attack/release.
        Shapes are untouched — no recompile."""
        if cfg.static_key() != self.cfg.static_key():
            raise ValueError("refresh_dynamic requires an identical static_key")
        self.cfg = cfg
        self.agc = AGCParams(
            target_level=cfg.agc_target_level,
            window_size=cfg.agc_window_size,
            max_gain=cfg.agc_max_gain,
            attack=cfg.agc_attack,
            release=cfg.agc_release,
        )

    # ---------------- parameter bank ----------------

    def device_params(self, p: PipelineParams,
                      cfg: "StreamConfig | None" = None,
                      agc: "AGCParams | None" = None) -> DeviceParams:
        """Upload a designed parameter bank (kernel spectra at the pipeline's
        static FFT length, so swaps never change shapes).

        `cfg`/`agc` override the pipeline's current dynamic fields — this
        lets a reconfig build the NEW bank entirely outside the swap lock
        (host convolutions + device uploads take tens of ms; holding the
        lock for them would stall the real-time thread).

        On the fused path, per-band kernels become full *cascade* kernels —
        float64 host convolution of upsampler ⊛ band ⊛ main [⊛ downsampler],
        decimated to the phase-0 polyphase component — keeping the response
        linear in the EQ gains (glitch-free live gain updates preserved).
        """
        cfg = cfg if cfg is not None else self.cfg
        agc = agc if agc is not None else self.agc
        # NOTE: zero-size device arrays are avoided everywhere — creating an
        # empty buffer hangs the tunneled TPU transport.  When the EQ bank is
        # unused, H_bands is a [1, F] zeros placeholder gated off statically.
        n_b = p.eq_taps.shape[0] if (cfg.eq_enabled and len(cfg.eq_bands)) else 0
        # unused-band placeholder: produced via an on-device rfft (complex
        # HOST constants and zero-size buffers both upset the tunneled TPU
        # transport; a device-computed spectrum avoids both)
        placeholder = lambda: jnp.fft.rfft(
            jnp.zeros((1, 8), dtype=jnp.float32), n=self.nfft
        )
        if self.fused:
            main64 = np.asarray(p.main_taps, dtype=np.float64)

            def cascade(band: np.ndarray | None) -> np.ndarray:
                k = np.convolve(self._h_up_np, main64)
                if band is not None:
                    k = np.convolve(k, band)
                if self._h_down_np is not None:
                    k = np.convolve(k, self._h_down_np)
                k = k[:: self.upf]  # phase-0 polyphase component
                out = np.zeros(self.n_casc)
                out[: len(k)] = k
                return out

            if n_b:
                bands = np.stack(
                    [cascade(np.asarray(b, dtype=np.float64)) for b in p.eq_taps]
                )
                H_bands = jnp.fft.rfft(
                    jnp.asarray(bands, dtype=jnp.float32), n=self.nfft, axis=-1
                )
            else:
                H_bands = placeholder()
            H_main = jnp.fft.rfft(
                jnp.asarray(cascade(None), dtype=jnp.float32), n=self.nfft
            )
        else:
            H_bands = jnp.fft.rfft(
                jnp.asarray(p.eq_taps, dtype=jnp.float32), n=self.nfft, axis=-1
            ) if n_b else placeholder()
            H_main = jnp.fft.rfft(
                jnp.asarray(p.main_taps, dtype=jnp.float32), n=self.nfft
            )
        gains = np.asarray(p.eq_gains, dtype=np.float32)
        if gains.size == 0 or not n_b:
            gains = np.zeros(H_bands.shape[0], dtype=np.float32)
        casc_bands = casc_main = casc_wide = None
        if self._use_td:
            casc_main = jnp.asarray(cascade(None), dtype=jnp.float32)
            if n_b:
                from ..ops.pallas.fir_td import wide_band_matrix

                casc_bands = jnp.asarray(bands, dtype=jnp.float32)
                casc_wide = wide_band_matrix(casc_bands)
            else:
                casc_bands = jnp.zeros((1, self.n_casc), dtype=jnp.float32)
        return DeviceParams(
            H_bands=H_bands,
            H_main=H_main,
            eq_gains=jnp.asarray(gains),
            casc_bands=casc_bands,
            casc_main=casc_main,
            casc_wide=casc_wide,
            agc_target=jnp.float32(cfg.agc_target_level),
            agc_max_gain=jnp.float32(cfg.agc_max_gain),
            agc_a_att=jnp.float32(agc.a_att),
            agc_a_rel=jnp.float32(agc.a_rel),
        )

    # ---------------- state ----------------

    def init_state(self, seed: int = 0) -> StreamState:
        cfg = self.cfg
        B = (self.batch,)
        asrc = None
        if self._asrc_device and not self._asrc_stateless:
            asrc = PolyResampler.init(
                cfg.samplerate, cfg.source_samplerate, block=self.block,
                batch_shape=B, quality=cfg.resample_quality,
            )
        up = None
        if self.upf > 1 and not self.fused:
            up = PolyResampler.init(self.upf, 1, block=self.block,
                                    batch_shape=B,
                                    quality=cfg.resample_quality)
        down = None
        if (self.upf > 1 and cfg.downsample_mode == "resample"
                and not self.fused and not self.upsampled_out):
            down = PolyResampler.init(1, self.upf, block=self.up_block,
                                      batch_shape=B,
                                      quality=cfg.resample_quality)
        n_tail = (self.n_casc if self.fused else self.n_fused) - 1
        if self._i16_tail:
            # pcm16 mode, conv eats x itself (no AGC): the overlap tail is
            # the RAW int16 input history (exact — strictly more
            # information than its bf16 pair — and half the tail bytes),
            # padded to a LANE multiple.  With AGC on the conv consumes
            # the gain-applied signal, so the tail stays the bf16 pair
            # below (`_i16_tail` is False then).
            conv_tail = jnp.zeros((self.batch, self._k_pad), dtype=jnp.int16)
        elif self._conv_pair:
            # pair mode: the overlap tail is carried as its bf16 hi/lo split
            # (bit-identical conv inputs to the staged path — the split is
            # elementwise, so slicing/concatenating pairs commutes with it),
            # padded to a LANE multiple for aligned kernel windows
            kp = self._k_pad
            conv_tail = (jnp.zeros((self.batch, kp), dtype=jnp.bfloat16),
                         jnp.zeros((self.batch, kp), dtype=jnp.bfloat16))
        else:
            conv_tail = jnp.zeros((self.batch, n_tail), dtype=jnp.float32)
        agc_gain = jnp.ones((self.batch,), dtype=jnp.float32) if cfg.agc_enabled else None
        wf = None
        if cfg.waterfall_enabled:
            from ..ops.spectrum import waterfall_init

            out_len = self.up_block if self.upsampled_out else self.block
            wf = waterfall_init(out_len // 2 + 1, batch_shape=(self.batch,))
        return StreamState(
            asrc=asrc,
            up=up,
            conv_tail=conv_tail,
            down=down,
            agc_gain=agc_gain,
            key=jax.random.PRNGKey(seed),
            wf=wf,
        )

    # ---------------- the hot step ----------------


    def _banked_operands(self, params: DeviceParams):
        """(band_stack [D, rows, LANE], per-stream assign [B], bt) for the
        banked per-stream-filter kernels, from the params bank (bt is
        recovered statically from the per-tile assignment's length)."""
        band = jax.vmap(lambda k: jnp.where(
            self._band_mask, jnp.take(k, self._band_idx), 0.0
        ))(params.casc_bank)
        bt = self.batch // params.casc_assign.shape[0]
        return band, jnp.repeat(params.casc_assign, bt), bt

    def _linked(self, d: jnp.ndarray, transposed: bool) -> jnp.ndarray:
        """Apply the ``agc_link_group`` group-min to the desired-gain signal
        (`ops.agc.link_desired`) — identity at group 1.  `transposed`:
        the exact-TPU chain hands `d` time-major [T, B]."""
        G = self.cfg.agc_link_group
        if G == 1:
            return d
        from ..ops.agc import link_desired

        return link_desired(d, G, batch_axis=1 if transposed else 0)

    def _step_impl(self, params: DeviceParams, state: StreamState,
                   block: jnp.ndarray):
        cfg = self.cfg
        xi16 = None  # raw int16 block (pcm16 ingest) for the exact tail carry
        if self._i16_ingest:
            # pcm16 ingest: convert at device entry (n/32768, exact) and
            # split — elementwise, so bit-identical to the ring kernels'
            # in-VMEM convert+split of the same samples
            from ..ops.pallas.fir_td import PCM16_SCALE, split_bf16

            xi16 = jnp.asarray(block)
            if xi16.dtype != jnp.int16:
                raise ValueError(
                    f"ingest='pcm16' blocks must be int16, got {xi16.dtype}")
            if self._i16_agc_raw:
                # fused AGC chain: the RMS/apply kernels read the RAW
                # int16 block and convert in VMEM (exact) — the two f32
                # x-reads of the C8 chain halve; the conv then consumes
                # the gain-applied bf16 pair the apply kernel emits
                x = xi16
            elif cfg.agc_enabled:
                # AGC fallback paths (fast/parallel modes, untileable
                # shapes, interpret without the force hook) consume f32 —
                # convert at entry (n/32768, exact, same bits)
                x = xi16.astype(jnp.float32) * PCM16_SCALE
            else:
                x = split_bf16(xi16.astype(jnp.float32) * PCM16_SCALE)
        elif self._pair_ingest:
            if isinstance(block, tuple):
                # block is the bf16 (hi, lo) pair of the f32 block — flows
                # straight into the pair-input conv path (no staging pass)
                x = (jnp.asarray(block[0], jnp.bfloat16),
                     jnp.asarray(block[1], jnp.bfloat16))
            else:
                # f32 caller (the StreamEngine ladder path): split at device
                # entry.  One elementwise pass over the block — still
                # cheaper than the f32 conv staging it replaces (which
                # splits the LONGER concat(tail, block) extended signal and
                # materializes the concat) — and bit-identical to host-side
                # pair ingest (the split commutes with slicing/concat).
                from ..ops.pallas.fir_td import split_bf16

                x = split_bf16(jnp.asarray(block, dtype=jnp.float32))
        else:
            x = jnp.asarray(block, dtype=jnp.float32)  # [B, L_in]
        dither_done = False  # set when the conv kernel fused the dither
        clip_done = False  # set when the conv kernel fused the output clip
        emit_done = False  # set when the conv kernel fused the i16 quantize
        key0 = state.key

        # 1. ASRC: source rate → engine rate, padded/trimmed to blocksize
        #    (reference compat, `stream_process_AGC.py:126-129`)
        asrc = state.asrc
        if asrc is not None:
            asrc, x = asrc.process(x)
        elif self._asrc_stateless:
            from ..ops.resample import resample_poly

            x = resample_poly(x, cfg.samplerate, cfg.source_samplerate,
                              quality=cfg.resample_quality)
        if asrc is not None or self._asrc_stateless:
            n = x.shape[-1]
            if n < self.block:
                x = jnp.pad(x, ((0, 0), (0, self.block - n)))
            else:
                x = x[..., : self.block]

        # 2. AGC (pre-upsample; `stream_process_AGC.py:132-144`) + clip ±0.99
        agc_gain = state.agc_gain
        if agc_gain is not None:
            # per-stream AGC policy banks (`batch.with_per_stream_agc`):
            # any [B]-vector knob.  The fused RMS/apply kernels consume the
            # vectors natively; the opt-in one-kernel AGC does not (falls
            # back to the two-kernel chain, like linked AGC)
            vec_agc = (params.agc_target.ndim == 1
                       or params.agc_max_gain.ndim == 1
                       or params.agc_a_att.ndim == 1
                       or params.agc_a_rel.ndim == 1)
            # exact mode on TPU consumes the desired gain time-major: the
            # fused RMS kernel stores [T, B] directly and the scan kernel
            # reads it without its input transpose (one array round trip)
            exact_tpu = cfg.agc_mode not in ("fast", "parallel") and (
                not self._pl_interpret or self._force_fused)
            # 'fast' on TPU fuses too (blockwise recurrence inside the
            # apply kernel) when the fused back half is tileable — the d
            # array then also rides time-major
            fast_fused = (cfg.agc_mode == "fast"
                          and (not self._pl_interpret or self._force_fused)
                          and self._rms_band is not None
                          and self._agc_fused_apply)
            d_tm = exact_tpu or fast_fused
            if exact_tpu and self._agc_one_kernel and not vec_agc:
                # single-kernel AGC: RMS + desired + scan + clip + apply
                # (+ pair split) in one pass — d never exists in HBM and
                # x is read once (agc_fused.py; window-local f32 error,
                # tighter than the two-kernel MXU-boxcar path)
                from ..ops.pallas.agc_fused import agc_rms_apply_pallas

                carry = agc_gain if cfg.agc_carry else None
                emit = (self._conv_pair
                        and not (cfg.eq_enabled
                                 and params.eq_gains.ndim == 2)
                        and params.casc_bank is None)
                x, agc_gain = agc_rms_apply_pallas(
                    x, self.agc.window_size,
                    params.agc_a_att, params.agc_a_rel,
                    params.agc_target, params.agc_max_gain,
                    init=carry, out_clip=0.99, emit_split=emit,
                    interpret=self._pl_interpret,
                )
            else:
                mc = 0  # chunk-mean d emission (fast mode, fused apply)
                if self._rms_band is not None:
                    # fused MXU kernel: square → pad → boxcar dots → sqrt →
                    # desired gain in ONE pass straight from the raw block
                    # (saves ~240 MB/block of intermediate HBM traffic vs the
                    # staged version at the C8 operating point)
                    from ..ops.pallas.agc_rms import rms_desired_pallas

                    lp, rp = self._rms_pad
                    mc = (self._agc_blockwise
                          if (fast_fused and self._agc_means) else 0)
                    d = rms_desired_pallas(
                        x, self._rms_band, lp, rp,
                        params.agc_target, params.agc_max_gain,
                        exact_band=self._rms_exact,
                        interpret=self._pl_interpret,
                        transposed=d_tm, mean_chunk=mc,
                    )
                    if not mc:
                        d = self._linked(d, transposed=d_tm)
                else:
                    rms = moving_rms(x, self.agc.window_size)
                    d = desired_gain(rms, params.agc_target, params.agc_max_gain)
                    d = self._linked(d, transposed=False)
                carry = agc_gain if cfg.agc_carry else None
                if (exact_tpu or fast_fused) and (
                        self._rms_band is not None and self._agc_fused_apply):
                    # fully fused back half: scan + clip + apply + carry in one
                    # kernel — the per-sample gain never round-trips through
                    # HBM.  'fast' mode runs the blockwise recurrence inside
                    # the same kernel (chunk means + interpolation in VMEM)
                    from ..ops.pallas.agc_scan import smooth_gain_apply_pallas

                    # pair mode: emit the bf16 hi/lo pair for the pair-input conv
                    # kernel — unless the params carry per-stream banks, whose
                    # kernel consumes f32 (rare; falls back to staged input)
                    emit = (self._conv_pair
                            and not (cfg.eq_enabled
                                     and params.eq_gains.ndim == 2)
                            and params.casc_bank is None)
                    x, agc_gain = smooth_gain_apply_pallas(
                        d, x, params.agc_a_att, params.agc_a_rel,
                        params.agc_max_gain, init=carry, out_clip=0.99,
                        interpret=self._pl_interpret, emit_split=emit,
                        blockwise=self._agc_blockwise, d_is_means=bool(mc),
                    )
                else:
                    if cfg.agc_mode == "fast":
                        from ..ops.agc import smooth_gain_blockwise

                        g = smooth_gain_blockwise(
                            d, params.agc_a_att, params.agc_a_rel, init=carry
                        )
                    elif cfg.agc_mode == "parallel":
                        from ..ops.agc import smooth_gain_parallel

                        g = smooth_gain_parallel(
                            d, params.agc_a_att, params.agc_a_rel, init=carry
                        )
                    elif (not self._pl_interpret
                          or self._force_fused) and not vec_agc:
                        # exact mode on TPU: the Pallas hardware-loop scan kernel
                        # (identical per-sample semantics, none of the XLA loop
                        # overhead that made AGC the pipeline's serial ceiling).
                        # Under the force hook this also covers the case where
                        # the fused apply is not tileable but the RMS kernel
                        # already emitted d time-major.
                        from ..ops.pallas.agc_scan import smooth_gain_scan_pallas

                        g = smooth_gain_scan_pallas(
                            d, params.agc_a_att, params.agc_a_rel, init=carry,
                            time_major=exact_tpu and self._rms_band is not None,
                            out_batch_major=True,
                            interpret=self._pl_interpret,
                        )
                    else:
                        # XLA scan (interpret mode; also the vec_agc fallback
                        # on untileable shapes — the scan-pallas kernel's
                        # SMEM α slots are scalar-only)
                        if exact_tpu and self._rms_band is not None:
                            d = d.T  # the RMS kernel emitted d time-major
                        g = smooth_gain_scan(
                            d, params.agc_a_att, params.agc_a_rel, init=carry
                        )
                    mg = params.agc_max_gain
                    g = jnp.clip(g, 0.1,
                                 mg[:, None] if mg.ndim == 1 else mg)
                    x = jnp.clip(x * g, -0.99, 0.99)
                    agc_gain = g[..., -1]

        has_eq = cfg.eq_enabled and len(cfg.eq_bands) > 0
        # 3–5. the linear chain: upsample → EQ+main FIR → downsample.
        # Fused path: one base-rate overlap-save pass with the phase-0
        # polyphase cascade kernel (identical output, ~upf× less FFT work).
        up = state.up
        down = state.down
        if self.fused:
            n_conv = self.n_casc
            x_pair = isinstance(x, tuple)
            if self._conv_pair:
                # pair-carried tail: reconstruct f32 views only where a
                # consumer needs them (per-stream banks, fft fallback)
                if self._i16_tail:
                    # raw int16 tail → convert+split at entry (same exact
                    # math as the block's; the pair halves feed the same
                    # pair kernel the ring path's VMEM split feeds).
                    # (pcm16 + AGC carries a pair tail instead — the conv
                    # input is the gain-applied signal, not x.)
                    from ..ops.pallas.fir_td import PCM16_SCALE, split_bf16

                    tail_i16 = state.conv_tail
                    tail_hi, tail_lo = split_bf16(
                        tail_i16.astype(jnp.float32) * PCM16_SCALE)
                else:
                    tail_hi, tail_lo = state.conv_tail
                if not x_pair:
                    # fused apply fell back to f32 (per-stream banks or AGC
                    # disabled at runtime is impossible — gate is static —
                    # so this is the per-stream case): stage classically,
                    # using the REAL n_conv−1 history columns of the padded
                    # pair tail
                    from ..ops.pallas.fir_td import merge_bf16

                    tail_f32 = merge_bf16(tail_hi, tail_lo)[:, -(n_conv - 1):]
                    ext = jnp.concatenate([tail_f32, x], axis=-1)
            else:
                # [..., -(n_conv-1):] is an identity slice for the staged
                # tail; after an f32 ring step the carried tail is k_pad
                # wide (lane-aligned) and the slice drops the inert leading
                # history so the staged kernel's output alignment holds
                ext = jnp.concatenate(
                    [state.conv_tail[..., -(n_conv - 1):], x], axis=-1)
            if self._use_td:
                per_stream = has_eq and params.eq_gains.ndim == 2
                banked = params.casc_bank is not None
                # fuse the output stage (±clip, then dither — the reference
                # order) into the conv kernel's store when nothing else sits
                # between them (saves one full output r/w round trip per
                # fused op, ~0.2 ms/block at the headline config)
                fuse_dither = (
                    cfg.dither_kind != "off"
                    and not per_stream
                    and not self._pl_interpret
                )
                # (clip involves no PRNG, so it fuses in interpret mode too —
                # CPU tests then cover the fused store path)
                fuse_clip = cfg.output_clip is not None and not per_stream
                if per_stream:
                    # per-stream gain banks on the MXU: one wide dot per
                    # tile yields every band, mixed per stream in-kernel
                    from ..ops.pallas.fir_td import fir_td_mxu_per_stream

                    if x_pair:
                        # pair ingest + per-stream banks: the wide-dot
                        # kernel consumes f32 — reconstruct (combined-bf16
                        # precision, ~1e-7 relative)
                        from ..ops.pallas.fir_td import merge_bf16

                        xh_, xl_ = x
                        tail_f32 = merge_bf16(
                            tail_hi, tail_lo)[:, -(n_conv - 1):]
                        ext = jnp.concatenate(
                            [tail_f32, merge_bf16(xh_, xl_)], axis=-1)
                    y = fir_td_mxu_per_stream(
                        ext, params.casc_bands, params.eq_gains,
                        interpret=self._pl_interpret, wide=params.casc_wide,
                    )
                else:
                    from ..ops.pallas.fir_td import fir_td_mxu

                    if banked:
                        # per-stream filter banks: band stack + assignment
                        # from the shared helper (ring paths use it too)
                        band, b_assign, b_bt = self._banked_operands(params)
                    else:
                        k = params.combined_cascade(has_eq)
                        band = jnp.where(
                            self._band_mask, jnp.take(k, self._band_idx), 0.0
                        )
                    oc = cfg.output_clip if fuse_clip else None
                    clip_done = fuse_clip
                    dkw = {}
                    if fuse_dither:
                        from ..ops.pallas.dither_pl import fold_seed

                        key0, sub = jax.random.split(state.key)
                        dither_done = True
                        dkw = dict(
                            dither_seed=fold_seed(sub),
                            dither_bits=cfg.dither_bits,
                            dither_tpdf=(cfg.dither_kind == "tpdf"),
                        )
                    # emit='pcm16': the int16 quantize is the FINAL output
                    # stage, so it fuses into the store only when nothing
                    # runs after the kernel — dither must be fused or off
                    # (a post-kernel dither pass would have to dequantize)
                    if self._emit16 and (fuse_dither
                                         or cfg.dither_kind == "off"):
                        dkw["emit_i16"] = True
                        emit_done = True
                    if banked:
                        # per-stream filters at the shared-dot cost: the
                        # per-tile design index selects each tile's band by
                        # scalar-prefetch addressing.  The AGC pair emit is
                        # gated off under banked params; pair/pcm16 INGEST
                        # still arrives split, so the staged step
                        # reconstructs the f32 ext exactly like the
                        # per-stream-gains fallback (EXACT for pcm16 — the
                        # split of 16-bit data loses nothing; ~2⁻¹⁶ class
                        # for f32 pair ingest, the documented bound).  The
                        # serving rings consume the raw pcm16 ring natively.
                        from ..ops.pallas.fir_td import fir_td_mxu_banked

                        if x_pair:
                            from ..ops.pallas.fir_td import merge_bf16

                            tail_f32 = merge_bf16(
                                tail_hi, tail_lo)[:, -(n_conv - 1):]
                            ext = jnp.concatenate(
                                [tail_f32, merge_bf16(x[0], x[1])], axis=-1)
                        y = fir_td_mxu_banked(
                            ext, band, b_assign, bt=b_bt,
                            interpret=self._pl_interpret,
                            out_clip=oc, **dkw)
                    elif x_pair:
                        # pair-input kernel: no staging pass at all — the
                        # AGC kernel emitted the pair, the tail is carried
                        # as a pair, and the concat happens in VMEM.  The
                        # tail carry stays a post-kernel slice here: with
                        # ``emit_tail=True`` the kernel's extra outputs break
                        # XLA's in-place aliasing of y into the caller's
                        # donated output buffer, costing a full-block copy
                        # (measured 857k→636k xRT on v5e).  Only the ring
                        # step (`_ring_step_impl`), whose output slot the
                        # kernel writes itself, wins from emit_tail.
                        from ..ops.pallas.fir_td import fir_td_mxu_pair

                        y = fir_td_mxu_pair(
                            x[0], x[1], tail_hi, tail_lo, band,
                            interpret=self._pl_interpret, out_clip=oc,
                            **dkw,
                        )
                    else:
                        y = fir_td_mxu(ext, band, interpret=self._pl_interpret,
                                       out_clip=oc, **dkw)
            else:
                H = params.combined_response(has_eq, premultiplied=True)
                Y = jnp.fft.rfft(ext, n=self.nfft) * H
                y = jnp.fft.irfft(Y, n=self.nfft)
                y = jax.lax.slice_in_dim(
                    y, n_conv - 1, n_conv - 1 + self.block, axis=-1
                )
            if self._i16_tail:
                # pcm16 tail carry: slice the RAW int16 input history (the
                # exact analog of the pair slices below; the ring kernels
                # emit the same int16 columns from VMEM)
                kp = self._k_pad
                T = xi16.shape[-1]
                if kp <= T:
                    conv_tail = xi16[:, T - kp:]
                else:
                    conv_tail = jnp.concatenate(
                        [tail_i16[:, T - kp:], xi16], axis=-1)
            elif self._conv_pair:
                # NOTE: the staged step slices the tail post-kernel on
                # purpose — kernel-emitted tails (`emit_tail`) broke XLA's
                # output donation aliasing here and cost a full-block copy
                # (measured 857k→636k); only the ring step uses emit_tail.
                kp = self._k_pad
                if x_pair:
                    xh, xl = x
                    T = xh.shape[-1]
                    if kp <= T:
                        conv_tail = (xh[:, T - kp:], xl[:, T - kp:])
                    else:
                        conv_tail = (
                            jnp.concatenate([tail_hi[:, T - kp:], xh], axis=-1),
                            jnp.concatenate([tail_lo[:, T - kp:], xl], axis=-1),
                        )
                else:
                    # per-stream fallback staged through f32 ext: re-split
                    # the (padded-width) tail slice — split is elementwise,
                    # so this matches the pair the fused path would carry.
                    # ext holds n_conv−1 history columns; prepend the extra
                    # pad history from the carried pair (inert in the conv,
                    # but keeps the carry self-consistent).
                    from ..ops.pallas.fir_td import split_bf16

                    # ext width T + n_conv−1 ≥ kp always (T ≥ LANE)
                    conv_tail = split_bf16(jax.lax.slice_in_dim(
                        ext, ext.shape[-1] - kp, ext.shape[-1], axis=-1))
            else:
                conv_tail = jax.lax.slice_in_dim(
                    ext, ext.shape[-1] - (n_conv - 1), ext.shape[-1], axis=-1
                )
        else:
            if up is not None:
                up, x = up.process(x)  # [B, L*upf]
            H = params.combined_response(has_eq)
            ext = jnp.concatenate([state.conv_tail, x], axis=-1)  # [B, N_f-1+L']
            Y = jnp.fft.rfft(ext, n=self.nfft) * H
            y = jnp.fft.irfft(Y, n=self.nfft)
            y = jax.lax.slice_in_dim(
                y, self.n_fused - 1, self.n_fused - 1 + self.up_block, axis=-1
            )
            conv_tail = jax.lax.slice_in_dim(
                ext, ext.shape[-1] - (self.n_fused - 1), ext.shape[-1], axis=-1
            )
            if self.upf > 1 and not self.upsampled_out:
                if cfg.downsample_mode == "decimate":
                    y = decimate(y, self.upf)  # anti-alias provided by main filter
                else:
                    down, y = down.process(y)

        # 6. output clip (AGC engine clamps ±0.99, `stream_process_AGC.py:180`)
        # — skipped when already fused into the conv kernel's store
        if cfg.output_clip is not None and not clip_done:
            y = jnp.clip(y, -cfg.output_clip, cfg.output_clip)

        # 7. keyed dither — fused into the conv kernel above when possible;
        # otherwise the hardware-PRNG Pallas kernel on TPU (the XLA threefry
        # path measured 62% of the whole block budget, r2 ablation)
        if dither_done:
            key = key0
        else:
            key = state.key
            if cfg.dither_kind != "off":
                key, sub = jax.random.split(key)
                if not self._pl_interpret:
                    from ..ops.pallas.dither_pl import dither_pallas

                    y = dither_pallas(sub, y, cfg.dither_bits, cfg.dither_kind)
                else:
                    y = dither(sub, y, cfg.dither_bits, cfg.dither_kind)

        # 7b. output quantization (emit='pcm16'): int16 PCM is the dither's
        # target format (the reference dithers so the sound card's 16-bit
        # requantization decorrelates, `stream_process.py:83-90`); fused
        # into the conv store above when the kernel ran last, an XLA
        # epilogue otherwise (fft strategy, per-stream banks, interpret
        # dither) — same quantizer either way (fir_td.quantize_pcm16)
        if self._emit16 and not emit_done:
            from ..ops.pallas.fir_td import quantize_pcm16

            y = quantize_pcm16(y)

        # 8. scan-carried waterfall capture (§5.5 observability on-device)
        wf = state.wf
        if wf is not None:
            from ..ops.spectrum import spectrum_db, waterfall_push

            y_wf = y
            if self._emit16:
                # the listener's signal IS the quantized one — dequantize
                # (n/32768, exact) only to feed the f32 FFT
                from ..ops.pallas.fir_td import PCM16_SCALE

                y_wf = y.astype(jnp.float32) * PCM16_SCALE
            wf = waterfall_push(wf, spectrum_db(y_wf))

        new_state = StreamState(
            asrc=asrc, up=up, conv_tail=conv_tail, down=down,
            agc_gain=agc_gain, key=key, wf=wf,
        )
        return new_state, y

    def step(self, params: DeviceParams, state: StreamState, block: jnp.ndarray):
        """One block: [B, L] → ([B, L] out, state).  Jitted; state is NOT
        donated — the engine's degradation ladder keeps the previous state
        alive to recover from a failed step (see the __init__ note)."""
        return self._step(params, state, block)

    # ---------------- zero-copy serving-ring step ----------------

    @property
    def supports_ring_step(self) -> bool:
        """True when :meth:`ring_step` is available — three forms:

        * pair ingest (bf16 (hi, lo) input rings; `StreamConfig.validate`
          already restricts it to td_mxu, no AGC/ASRC, base-rate output);
        * the fused AGC chain (``_conv_pair`` without pair ingest): a
          single f32 input ring feeds the ring-input RMS and fused-apply
          kernels, whose pair output feeds the ring-output conv — the C8
          chain with zero staging copies;
        * the f32 conv ring (no AGC, f32 ingest, td_mxu B3-class): a
          single f32 input ring feeds `fir_td_mxu_ring_f32`, which splits
          in VMEM — the reference's f32 input contract with the
          pair-ring's zero-copy dispatch (a bf16 pair costs exactly the
          bytes of one f32 array, so the HBM traffic is identical);
        * the pcm16 conv ring (``ingest='pcm16'``): the same single-ring
          form over RAW int16 PCM blocks — the kernel converts (n/32768,
          exact) and splits in VMEM, halving the input HBM bytes and the
          host→device ingest transfer vs both forms above.

        All require the scan-carried waterfall off and no device-side
        ASRC; per-stream EQ banks are rejected at call time (their kernel
        consumes f32)."""
        if self.cfg.waterfall_enabled or not self.fused:
            return False
        if self._pair_ingest:
            return True
        if self.cfg.agc_enabled:
            # the AGC-chain ring form needs the fused kernels
            # (`_agc_chain_pair`, NOT `_conv_pair` — pcm16 ingest forces
            # the latter True even under the 'parallel' AGC mode, whose
            # associative-scan solver the ring chain does not implement).
            # 'exact' runs the per-sample recurrence, 'fast' the blockwise
            # one — both inside the same fused apply kernel.
            return bool(self._agc_chain_pair and self._rms_band is not None
                        and not self._asrc_device)
        return bool(self._use_td and self._td_b3 and not self._asrc_device)

    def _ring_step_impl(self, params: DeviceParams, state: StreamState,
                        ring_hi: jnp.ndarray, ring_lo: jnp.ndarray,
                        idx, out_ring: jnp.ndarray):
        """One serving step over HBM-resident rings — the sustained-mode
        hot loop without its two staging copies per block.

        The classic sustained loop (`bench.py:_sustained_xrt`) pays a
        `dynamic_slice` pulling block `idx` out of the input ring and a
        `dynamic_update_slice` pushing the result into the output ring —
        pure HBM→HBM copy traffic around the conv kernel.  Here the conv
        kernel itself reads slot `idx` of the (hi, lo) input ring via a
        scalar-prefetch BlockSpec, writes slot `idx` of the DONATED
        output ring in place, and emits the next step's overlap-tail pair
        from its VMEM-resident block (`fir_td_mxu_ring` ``emit_tail``) —
        no staging copies remain anywhere in the step.  Numerics are
        identical to :meth:`step` in pair-ingest mode.
        """
        cfg = self.cfg
        has_eq = cfg.eq_enabled and len(cfg.eq_bands) > 0
        if has_eq and params.eq_gains.ndim == 2:
            raise ValueError(
                "ring_step does not support per-stream EQ banks (the "
                "wide-dot kernel consumes f32) — use step()")
        if not self.supports_ring_step:
            raise ValueError(
                "ring_step requires pair ingest, the fused AGC chain, or "
                "the f32 conv ring, with the waterfall disabled (see "
                "supports_ring_step)")
        f32_ring = ring_lo is None  # one f32 ring vs bf16 pair rings
        if f32_ring == self._pair_ingest:
            raise ValueError(
                "ring form mismatch: pair-ingest pipelines take (hi, lo) "
                "rings, the fused AGC chain and the f32 conv ring take one "
                "f32 ring")
        agc_mode = f32_ring and cfg.agc_enabled  # fused AGC chain
        if self._emit16:
            if out_ring.dtype != jnp.int16:
                raise ValueError(
                    f"emit='pcm16' serving output rings must be int16, got "
                    f"{out_ring.dtype}")
            if cfg.dither_kind != "off" and self._pl_interpret:
                raise ValueError(
                    "emit='pcm16' ring serving off-TPU requires "
                    "dither_kind='off' (the post-kernel interpret dither "
                    "pass cannot run after the in-kernel quantize)")
        elif out_ring.dtype != jnp.float32:
            raise ValueError(
                f"serving output rings must be float32, got "
                f"{out_ring.dtype} (set emit='pcm16' for int16 output)")

        S, B, T = ring_hi.shape
        kp = self._k_pad
        idx = jnp.asarray(idx, dtype=jnp.int32)
        banked = params.casc_bank is not None
        rkw = {}
        if banked:
            if self._pair_ingest or cfg.agc_enabled:
                raise ValueError(
                    "per-stream filter banks ride the f32/pcm16 conv rings "
                    "only — pair ingest and the fused AGC chain consume "
                    "the shared band (use step(), or drop the bank)")
            band, rkw["assign"], rkw["bt"] = self._banked_operands(params)
        else:
            k = params.combined_cascade(has_eq)
            band = jnp.where(self._band_mask, jnp.take(k, self._band_idx),
                             0.0)
        fuse_dither = cfg.dither_kind != "off" and not self._pl_interpret
        key = state.key
        dkw = {}
        if fuse_dither:
            from ..ops.pallas.dither_pl import fold_seed

            key, sub = jax.random.split(key)
            dkw = dict(dither_seed=fold_seed(sub),
                       dither_bits=cfg.dither_bits,
                       dither_tpdf=(cfg.dither_kind == "tpdf"))
        agc_gain = state.agc_gain
        if f32_ring and not agc_mode:
            # f32 conv ring (C5/C6 chain, the reference input contract):
            # the kernel reads the raw f32 slot, splits in VMEM, convolves
            # into the donated output slot, and emits the next f32 tail.
            # Numerics: pair-kernel class — bit-identical to staged pair
            # steps; vs the staged f32 step the padded band regroups the
            # fp32 accumulation (≤ −110 dB, bit-exact in interpret mode —
            # fir_td.py:_fir_kernel_b3t_f32).  pcm16 ingest: the same form
            # over a raw int16 ring (half the input bytes; the in-VMEM
            # convert+split is exact — fir_td.py:_load_f32).
            if self._i16_ingest:
                if ring_hi.dtype != jnp.int16:
                    raise ValueError(
                        f"ingest='pcm16' serving rings must be int16, got "
                        f"{ring_hi.dtype}")
                from ..ops.pallas.fir_td import fir_td_mxu_ring_pcm16 as _ring
            else:
                if ring_hi.dtype != jnp.float32:
                    raise ValueError(
                        f"the f32 conv ring must be float32, got "
                        f"{ring_hi.dtype} (use ingest='pcm16' for int16 "
                        "rings)")
                from ..ops.pallas.fir_td import fir_td_mxu_ring_f32 as _ring

            out_ring, new_tail = _ring(
                ring_hi, idx, state.conv_tail, band, out_ring,
                interpret=self._pl_interpret, out_clip=cfg.output_clip,
                **rkw, **dkw,
            )
            if cfg.dither_kind != "off" and not fuse_dither:
                key, sub = jax.random.split(key)
                y = jax.lax.dynamic_index_in_dim(out_ring, idx,
                                                 keepdims=False)
                y = dither(sub, y, cfg.dither_bits, cfg.dither_kind)
                out_ring = jax.lax.dynamic_update_index_in_dim(
                    out_ring, y, idx, axis=0)
            new_state = StreamState(
                asrc=state.asrc, up=state.up, conv_tail=new_tail,
                down=state.down, agc_gain=agc_gain, key=key, wf=state.wf,
            )
            return new_state, out_ring
        tail_hi, tail_lo = state.conv_tail
        if agc_mode:
            # fused AGC chain over the f32 (or raw int16 PCM) ring: RMS
            # front half and the scan+clip+apply back half stream slot
            # `idx` directly (ring-input kernels; pcm16 slots convert in
            # VMEM — exact); the emitted pair feeds the ring-output conv.
            # Identical math to _step_impl's fused AGC path.
            from ..ops.pallas.fir_td import fir_td_mxu_pair_to_ring

            if self._i16_ingest:
                if ring_hi.dtype != jnp.int16:
                    raise ValueError(
                        f"ingest='pcm16' serving rings must be int16, got "
                        f"{ring_hi.dtype}")
            elif ring_hi.dtype != jnp.float32:
                raise ValueError(
                    f"the fused-AGC chain ring must be float32, got "
                    f"{ring_hi.dtype} (use ingest='pcm16' for int16 rings)")

            carry = agc_gain if cfg.agc_carry else None
            vec_agc = (params.agc_target.ndim == 1
                       or params.agc_max_gain.ndim == 1
                       or params.agc_a_att.ndim == 1
                       or params.agc_a_rel.ndim == 1)
            if self._agc_one_kernel and not vec_agc:
                # single-kernel AGC streaming the ring slot directly —
                # same kernel (and bits) as _step_impl's one-kernel branch
                from ..ops.pallas.agc_fused import agc_rms_apply_pallas

                (xh, xl), agc_gain = agc_rms_apply_pallas(
                    ring_hi, self.agc.window_size,
                    params.agc_a_att, params.agc_a_rel,
                    params.agc_target, params.agc_max_gain,
                    init=carry, out_clip=0.99, emit_split=True,
                    interpret=self._pl_interpret, ring_idx=idx,
                )
            else:
                from ..ops.pallas.agc_rms import rms_desired_pallas
                from ..ops.pallas.agc_scan import smooth_gain_apply_pallas

                lp, rp = self._rms_pad
                mc = self._agc_blockwise if self._agc_means else 0
                d = rms_desired_pallas(
                    ring_hi, self._rms_band, lp, rp,
                    params.agc_target, params.agc_max_gain,
                    exact_band=self._rms_exact,
                    interpret=self._pl_interpret,
                    transposed=True, ring_idx=idx, mean_chunk=mc,
                )
                if not mc:
                    d = self._linked(d, transposed=True)
                (xh, xl), agc_gain = smooth_gain_apply_pallas(
                    d, ring_hi, params.agc_a_att, params.agc_a_rel,
                    params.agc_max_gain, init=carry, out_clip=0.99,
                    interpret=self._pl_interpret, emit_split=True,
                    ring_idx=idx, blockwise=self._agc_blockwise,
                    d_is_means=bool(mc),
                )
            out_ring, nt_hi, nt_lo = fir_td_mxu_pair_to_ring(
                xh, xl, tail_hi, tail_lo, band, idx, out_ring,
                interpret=self._pl_interpret, out_clip=cfg.output_clip,
                emit_tail=True, **dkw,
            )
        else:
            from ..ops.pallas.fir_td import fir_td_mxu_ring

            out_ring, nt_hi, nt_lo = fir_td_mxu_ring(
                ring_hi, ring_lo, idx, tail_hi, tail_lo, band, out_ring,
                interpret=self._pl_interpret, out_clip=cfg.output_clip,
                emit_tail=True, **dkw,
            )
        if cfg.dither_kind != "off" and not fuse_dither:
            # interpret mode (CPU tests): dither the written slot in place —
            # the staging round trip this reintroduces exists only off-TPU
            key, sub = jax.random.split(key)
            y = jax.lax.dynamic_index_in_dim(out_ring, idx, keepdims=False)
            y = dither(sub, y, cfg.dither_bits, cfg.dither_kind)
            out_ring = jax.lax.dynamic_update_index_in_dim(
                out_ring, y, idx, axis=0)
        # pair tail carry: last k_pad columns of the block the conv just
        # consumed — emitted by the conv kernel itself from its VMEM-resident
        # block (`emit_tail`), so the carry costs no extra slice pass over
        # the HBM ring (was two dynamic_slices per step in pair mode)
        new_tail = (nt_hi, nt_lo)
        new_state = StreamState(
            asrc=state.asrc, up=state.up, conv_tail=new_tail,
            down=state.down, agc_gain=agc_gain, key=key, wf=state.wf,
        )
        return new_state, out_ring

    def ring_step(self, params: DeviceParams, state: StreamState,
                  ring_hi: jnp.ndarray, ring_lo: jnp.ndarray,
                  idx, out_ring: jnp.ndarray):
        """Jitted :meth:`_ring_step_impl`; `out_ring` is donated (the kernel
        writes slot `idx` in place and the rest rides through untouched).
        Pair ingest: `(ring_hi, ring_lo)` are the bf16 input rings.  Fused
        AGC chain: pass the single f32 ring as `ring_hi` and ``None`` as
        `ring_lo`."""
        if not hasattr(self, "_ring_step"):
            self._ring_step = jax.jit(self._ring_step_impl,
                                      donate_argnums=(5,))
        return self._ring_step(params, state, ring_hi, ring_lo, idx, out_ring)

    def _run_ring_impl(self, params: DeviceParams, state: StreamState,
                       ring_hi: jnp.ndarray, ring_lo: jnp.ndarray,
                       out_ring: jnp.ndarray, n_steps: int, start):
        K = ring_hi.shape[0]
        start = jnp.asarray(start, dtype=jnp.int32)
        if (ring_lo is None and not self.cfg.agc_enabled
                and self.supports_ring_step and not self._pair_ingest):
            # f32 conv ring: the kernel emits a k_pad-wide tail, so the
            # scan carry must enter at that width (one pad, outside the
            # loop; the padded leading history is numerically inert).
            # Gated on the form actually being the f32 conv ring so that
            # misuse (pair-ingest or unsupported pipelines) falls through
            # to _ring_step_impl's descriptive ValueErrors.
            t = state.conv_tail
            if t.shape[-1] != self._k_pad:
                state = state._replace(conv_tail=jnp.pad(
                    t, ((0, 0), (self._k_pad - t.shape[-1], 0))))

        def body(carry, i):
            st, rg = carry
            st, rg = self._ring_step_impl(
                params, st, ring_hi, ring_lo, jnp.mod(start + i, K), rg)
            return (st, rg), ()

        (state, out_ring), _ = jax.lax.scan(
            body, (state, out_ring), jnp.arange(n_steps, dtype=jnp.int32))
        return state, out_ring

    def run_ring(self, params: DeviceParams, state: StreamState,
                 ring_hi: jnp.ndarray, ring_lo: jnp.ndarray,
                 out_ring: jnp.ndarray, n_steps: int, start=0):
        """Sustained serving: ONE dispatch advances `n_steps` blocks around
        the HBM-resident rings, slot `(start+i) mod K` each step, writing
        the DONATED `out_ring` in place via the zero-copy ring kernel.
        This is the production serving loop shape: the host refills input
        slots / drains output slots asynchronously while the device scans.
        `n_steps` is static (compile-cached per value)."""
        if not hasattr(self, "_run_ring"):
            self._run_ring = jax.jit(self._run_ring_impl,
                                     static_argnums=(5,),
                                     donate_argnums=(4,))
        return self._run_ring(params, state, ring_hi, ring_lo, out_ring,
                              n_steps, start)

    def _run_ring_mega_impl(self, params: DeviceParams, state: StreamState,
                            ring_hi: jnp.ndarray, ring_lo: jnp.ndarray,
                            out_ring: jnp.ndarray, n_steps: int, start):
        """Whole-dispatch serving loop in chained megakernel launches
        (`fir_td_mxu_ring_mega` / `_mega_f32`): per-step math, slot order,
        and dither seed folds identical to :meth:`_run_ring_impl` in the
        matching ring form (pair rings, or the f32 conv ring when
        ``ring_lo is None``), but without the `lax.scan`, the per-step
        kernel launches, or the tail carry traffic.  Requires fused dither
        (TPU) or ``dither_kind='off'`` — the interpret-mode post-kernel
        dither pass has no per-step hook here."""
        cfg = self.cfg
        f32_form = ring_lo is None
        if not self.supports_ring_step or cfg.agc_enabled or (
                f32_form == self._pair_ingest):
            raise ValueError(
                "run_ring_mega requires pair ingest (bf16 (hi, lo) rings) "
                "or the f32 conv ring (no AGC), with the waterfall "
                "disabled (see supports_ring_step)")
        has_eq = cfg.eq_enabled and len(cfg.eq_bands) > 0
        if has_eq and params.eq_gains.ndim == 2:
            raise ValueError("run_ring_mega does not support per-stream EQ "
                             "banks — use step()")
        fuse_dither = cfg.dither_kind != "off" and not self._pl_interpret
        if cfg.dither_kind != "off" and not fuse_dither:
            raise ValueError(
                "run_ring_mega needs the fused dither epilogue (TPU); in "
                "interpret mode run it with dither_kind='off' or use "
                "run_ring")
        want = jnp.int16 if self._emit16 else jnp.float32
        if out_ring.dtype != want:
            raise ValueError(
                f"emit={cfg.emit!r} output rings must be {jnp.dtype(want)}, "
                f"got {out_ring.dtype}")
        from ..ops.pallas.fir_td import fir_td_mxu_ring_mega

        banked = params.casc_bank is not None
        rkw = {}
        if banked:
            if not f32_form:
                raise ValueError(
                    "per-stream filter banks ride the f32/pcm16 conv ring "
                    "mega forms only (pair ingest consumes the shared band)")
            band, rkw["assign"], rkw["bt"] = self._banked_operands(params)
        else:
            k = params.combined_cascade(has_eq)
            band = jnp.where(self._band_mask, jnp.take(k, self._band_idx),
                             0.0)
        key = state.key
        seeds = None
        dkw = {}
        if fuse_dither:
            from ..ops.pallas.dither_pl import fold_seed

            def fold(k_, _):
                k_, sub = jax.random.split(k_)
                return k_, fold_seed(sub)

            # same per-step key walk as _ring_step_impl → bit-exact dither
            key, seeds = jax.lax.scan(fold, key, None, length=n_steps)
            seeds = seeds.reshape(n_steps, 1)
            dkw = dict(dither_bits=cfg.dither_bits,
                       dither_tpdf=(cfg.dither_kind == "tpdf"))
        # Chained ≤MEGA_CHUNK_STEPS launches: Mosaic's fixed SMEM footprint
        # for this kernel sits ~7 KB under the 1 MB cap, so the [n_steps, 1]
        # scalar-prefetch seed array overflows SMEM for n_steps ≳ 1024
        # (measured: 2048 steps exceeded the cap by 1.1 KB on v5e).  Each
        # chunk is one kernel launch carrying the VMEM tail out/in — the
        # per-launch overhead returns only once per 512 blocks, and the
        # step math, slot order, and seed schedule stay bit-identical to
        # the single-launch form (seeds are sliced from the same key walk).
        start = jnp.asarray(start, dtype=jnp.int32)
        if f32_form:
            if self._i16_ingest:
                from ..ops.pallas.fir_td import (
                    fir_td_mxu_ring_mega_pcm16 as _mega)
            else:
                from ..ops.pallas.fir_td import (
                    fir_td_mxu_ring_mega_f32 as _mega)

            nt = state.conv_tail
            off = 0
            while off < n_steps:
                n = min(MEGA_CHUNK_STEPS, n_steps - off)
                sd = None if seeds is None else jax.lax.slice_in_dim(
                    seeds, off, off + n, axis=0)
                out_ring, nt = _mega(
                    ring_hi, start + off, nt, band, out_ring, n, seeds=sd,
                    interpret=self._pl_interpret,
                    out_clip=cfg.output_clip, **rkw, **dkw)
                off += n
            new_tail = nt
        else:
            nt_hi, nt_lo = state.conv_tail
            off = 0
            while off < n_steps:
                n = min(MEGA_CHUNK_STEPS, n_steps - off)
                sd = None if seeds is None else jax.lax.slice_in_dim(
                    seeds, off, off + n, axis=0)
                out_ring, nt_hi, nt_lo = fir_td_mxu_ring_mega(
                    ring_hi, ring_lo, start + off, nt_hi, nt_lo, band,
                    out_ring, n, seeds=sd, interpret=self._pl_interpret,
                    out_clip=cfg.output_clip, **dkw)
                off += n
            new_tail = (nt_hi, nt_lo)
        new_state = StreamState(
            asrc=state.asrc, up=state.up, conv_tail=new_tail,
            down=state.down, agc_gain=state.agc_gain, key=key, wf=state.wf,
        )
        return new_state, out_ring

    def run_ring_mega(self, params: DeviceParams, state: StreamState,
                      ring_hi: jnp.ndarray, ring_lo: jnp.ndarray,
                      out_ring: jnp.ndarray, n_steps: int, start=0):
        """Megakernel variant of :meth:`run_ring` (pair-ingest form with
        (hi, lo) rings, or the f32 conv ring with ``ring_lo=None``): the
        dispatch runs as one Pallas launch per ≤`MEGA_CHUNK_STEPS` blocks
        (vs one per block) — final ring, tail carry, and dither
        bit-identical to :meth:`run_ring`.  `out_ring` is donated;
        `n_steps` is static."""
        if not hasattr(self, "_run_ring_mega"):
            self._run_ring_mega = jax.jit(self._run_ring_mega_impl,
                                          static_argnums=(5,),
                                          donate_argnums=(4,))
        return self._run_ring_mega(params, state, ring_hi, ring_lo, out_ring,
                                   n_steps, start)

    # ---------------- scan over many blocks ----------------

    def _run_impl(self, params: DeviceParams, state: StreamState,
                  blocks: jnp.ndarray):
        def body(carry, blk):
            return self._step_impl(params, carry, blk)

        return jax.lax.scan(body, state, blocks)

    def run(self, params: DeviceParams, state: StreamState, blocks: jnp.ndarray):
        """Scan the pipeline over [T_blocks, B, L] → ([T_blocks, B, L_out])."""
        return self._run(params, state, blocks)

    # convenience: process a whole [B, T] signal
    def process_signal(self, params: DeviceParams, state: StreamState,
                       signal: jnp.ndarray, fold="auto"):
        """Whole-signal convenience: [B, T] → [B, T'].

        ``fold`` selects the offline execution strategy:

        * ``False`` — the literal streaming scan (one ``_step_impl`` per
          block, state threaded through ``lax.scan``).
        * ``"auto"`` (default) — use the time-FOLDED fast path (see
          :meth:`process_signal_folded`) when it is BIT-exact vs the scan:
          the td_mxu strategy only (the MXU's per-output K accumulation is
          batch-size-independent; the fft strategy's batched plan may
          specialize and shift ulps, and interpret mode lowers to host
          GEMMs whose blocking reassociates at the ~1e-7 level), dither
          off, ON TPU, and the batch under-tiles the MXU (B < 256).
          Semantics never change under 'auto'.
        * ``"prefer"`` — fold whenever :attr:`supports_fold` (offline
          callers that don't need the scan's dither stream: the CLI); with
          dither on the fold's noise REALIZATION differs from blockwise
          streaming (same keyed distribution — one fold seed instead of a
          per-block key walk), everything else is identical.
        * ``True`` — require the fold; raises if unsupported.
        """
        B, T = signal.shape
        L = self.block
        nblocks = T // L
        use_fold = self._fold_decision(fold, params)
        if use_fold:
            # nblocks == 0 included: process_signal_folded's guarded empty
            # return avoids the zero-size device buffer the scan path below
            # would otherwise create (a known tunnel hazard)
            return self.process_signal_folded(params, state, signal)
        # transfer the CONTIGUOUS signal first and lay out the block axis on
        # device: reshape+swapaxes on a large host array forces a strided
        # host copy, which on some hosts stalls in kernel time for GB-class
        # signals (measured >840 s at [4096, 64·4096] vs ~4 s this way)
        signal = self._coerce_signal(signal)
        blocks = signal[:, : nblocks * L].reshape(B, nblocks, L).swapaxes(0, 1)
        state, outs = self.run(params, state, blocks)
        return state, outs.swapaxes(0, 1).reshape(B, -1)

    def _coerce_signal(self, signal):
        if self._i16_ingest:
            signal = jnp.asarray(signal)
            if signal.dtype != jnp.int16:  # never silently quantize floats
                raise ValueError(
                    f"ingest='pcm16' signals must be int16, got "
                    f"{signal.dtype}")
            return signal
        return jnp.asarray(signal, dtype=jnp.float32)

    # ---------------- offline time-folded fast path ----------------

    def _fold_decision(self, fold, params: DeviceParams,
                       batch: int | None = None) -> bool:
        """Resolve a `fold` argument ('auto'|'prefer'|True|False) against
        this pipeline's capabilities.  `batch` overrides the MXU-tiling
        heuristic's batch (sharded callers pass their per-shard batch)."""
        batch = self.batch if batch is None else batch
        use_fold = False
        if params.casc_bank is not None:
            # per-stream filter banks: the fold packs blocks into the batch
            # axis, which would interleave rows of different designs inside
            # one assignment tile — keep the scan (the banked kernels'
            # shared-dot cost makes it fast anyway)
            if fold is True:
                raise ValueError(
                    "fold=True is unsupported with per-stream filter banks "
                    "(the folded batch axis breaks the tile-constant "
                    "design assignment) — use fold='auto'")
            return False
        if fold is True:
            if not self.supports_fold:
                raise ValueError(
                    "fold=True but this pipeline cannot fold (needs the "
                    "fused single-rate chain without AGC/device-ASRC/"
                    "waterfall)")
            use_fold = True
        elif fold == "prefer":
            use_fold = self.supports_fold
        elif fold == "auto":
            # bit-exactness is only claimed (and hw-certified) for the td
            # kernels, whose per-output K accumulation is batch-size-
            # independent; the fft strategy's batched plan may specialize
            # and shift ulps, so it folds only under 'prefer'/True.
            # Per-stream GAIN banks are excluded too: the wide-dot kernel's
            # folded-batch lowering measured a 7.9e-7 scan divergence at
            # the r4 'hq' cascade length on hardware (tools/hw_check.py) —
            # the documented ≤1e-6 class, but not BIT-exact, so 'auto'
            # (whose contract is "semantics never change") scans instead
            per_stream = (getattr(params.eq_gains, "ndim", 1) == 2
                          or getattr(params.H_main, "ndim", 1) == 2)
            use_fold = (self.supports_fold
                        and self._use_td
                        and not per_stream
                        and self.cfg.dither_kind == "off"
                        and not self._pl_interpret
                        and batch < 256)
        elif fold is not False:
            raise ValueError(
                f"fold must be 'auto', 'prefer', True, or False; got "
                f"{fold!r}")
        return use_fold

    @property
    def supports_fold(self) -> bool:
        """True when the offline fold applies: the fused single-rate chain
        with no cross-block recurrence (AGC) and no streaming resampler
        state (device ASRC / unfused up-down chain) — each block's output
        then depends only on the signal window behind it, so blocks fold
        into the BATCH axis and the whole signal runs as ONE batched
        kernel call (`process_signal_folded`)."""
        cfg = self.cfg
        return (self.fused
                and not cfg.agc_enabled
                and not self._asrc_device
                and not cfg.waterfall_enabled)

    def _frame_rows(self, ext, nb: int, W: int):
        """Frame [B, H + nb·L] into hop-L windows [B·nb, W] (W = H + L)
        using k = ceil(W/L) shifted block VIEWS + one concat — no gather
        (XLA gathers on TPU serialize; slices/concats fuse).  Works for
        f32, bf16, and int16 operands."""
        B = ext.shape[0]
        L = self.block
        k = -(-W // L)
        need = (nb - 1 + k) * L
        if need > ext.shape[-1]:
            ext = jnp.pad(ext, ((0, 0), (0, need - ext.shape[-1])))
        view = ext[:, :need].reshape(B, nb - 1 + k, L)
        frames = jnp.concatenate(
            [view[:, j:j + nb] for j in range(k)], axis=-1)[..., :W]
        return frames.reshape(B * nb, W)

    def process_signal_folded(self, params: DeviceParams, state: StreamState,
                              signal: jnp.ndarray):
        """Offline fast path: fold a [B, T] signal's blocks into the BATCH
        axis and run the conv chain as ONE batched call.

        The streaming scan at small batch starves the MXU — a [1, ·] block
        occupies one row of the 128-row systolic array and serializes
        nblocks dispatches.  With no AGC the fused cascade has no
        cross-block recurrence: block i's output depends only on
        signal[i·L − (n_casc−1) … (i+1)·L), so the windows fold into rows
        of one [B·nb, n−1+L] call — identical per-row math, full MXU
        tiles.  On TPU, BIT-exact vs the scan with dither off (same kernel
        windows and geometry, and the MXU's per-output K accumulation is
        batch-size-independent — asserted on hardware by
        tools/hw_check.py's check_offline_fold leg);
        in interpret/CPU mode the host GEMM's batch-dependent blocking
        reassociates at the ~1e-7 level.  With dither on the noise
        realization differs (one fold seed, not the scan's per-block key
        walk).  Final state matches the scan's (conv tail = the signal's
        last history columns, sliced — exact on every backend).

        Memory: ≈ (2 + (n−1)/L)× the signal bytes transiently (the framed
        rows duplicate each block's history).

        No reference analog — the reference processes offline files through
        the same per-block callback loop (`stream_process.py:79-120`).
        """
        if not hasattr(self, "_fold"):
            self._fold = jax.jit(self._fold_impl)
        signal = self._coerce_signal(signal)
        nb = signal.shape[-1] // self.block
        if nb == 0:  # nothing to fold (and zero-size device buffers are
            # a known tunnel hazard — docs/ROADMAP.md dev notes)
            out_dt = jnp.int16 if self._emit16 else jnp.float32
            return state, jnp.zeros((signal.shape[0], 0), out_dt)
        return self._fold(params, state, signal[:, : nb * self.block])

    def _fold_impl(self, params: DeviceParams, state: StreamState,
                   signal: jnp.ndarray):
        cfg = self.cfg
        B, T = signal.shape
        L = self.block
        nb = T // L
        n_conv = self.n_casc
        has_eq = cfg.eq_enabled and len(cfg.eq_bands) > 0
        R = B * nb
        R8 = -(-R // 8) * 8  # the td kernels' batch-tile granule floor
        key = state.key
        dither_on = cfg.dither_kind != "off"
        clip_done = dither_done = emit_done = False

        def pad_rows(a):
            return jnp.pad(a, ((0, R8 - R), (0, 0))) if R8 != R else a

        per_stream = has_eq and params.eq_gains.ndim == 2
        if self._use_td and per_stream:
            # per-stream gain banks: f32 ext rows (pair modes reconstruct,
            # exactly as the staged per-stream path does) + the per-stream
            # gain row repeated nb× (rows are B-major: row b·nb+i)
            from ..ops.pallas.fir_td import fir_td_mxu_per_stream

            kp = self._k_pad
            if self._i16_tail:
                from ..ops.pallas.fir_td import PCM16_SCALE

                ext_i = jnp.concatenate([state.conv_tail, signal], axis=-1)
                ext = ext_i.astype(jnp.float32) * PCM16_SCALE
                ext = ext[:, kp - (n_conv - 1):]
                new_tail = ext_i[:, -kp:]
            elif self._conv_pair:
                from ..ops.pallas.fir_td import merge_bf16, split_bf16

                th, tl = state.conv_tail
                tail_f32 = merge_bf16(th, tl)[:, -(n_conv - 1):]
                # mirror the staged pair+per-stream path exactly: the block
                # rides as merge(split(x)) there (the sub-lo residual drops
                # at ingest), so fold the same values
                sh, sl = split_bf16(signal)
                ext = jnp.concatenate([tail_f32, merge_bf16(sh, sl)],
                                      axis=-1)
                new_tail = tuple(split_bf16(ext[:, -kp:]))
            else:
                ext = jnp.concatenate(
                    [state.conv_tail[..., -(n_conv - 1):], signal], axis=-1)
                new_tail = ext[:, -(n_conv - 1):]
            rows = self._frame_rows(ext, nb, n_conv - 1 + L)
            gains = jnp.repeat(params.eq_gains, nb, axis=0)
            y = fir_td_mxu_per_stream(
                pad_rows(rows), params.casc_bands, pad_rows(gains),
                interpret=self._pl_interpret, wide=params.casc_wide)
        elif self._use_td:
            from ..ops.pallas.fir_td import fir_td_mxu, fir_td_mxu_pair

            band = jnp.where(self._band_mask,
                             jnp.take(params.combined_cascade(has_eq),
                                      self._band_idx), 0.0)
            fuse_dither = dither_on and not self._pl_interpret
            fuse_clip = cfg.output_clip is not None
            dkw = {"out_clip": cfg.output_clip if fuse_clip else None}
            clip_done = fuse_clip
            if fuse_dither:
                from ..ops.pallas.dither_pl import fold_seed

                key, sub = jax.random.split(key)
                dither_done = True
                dkw.update(dither_seed=fold_seed(sub),
                           dither_bits=cfg.dither_bits,
                           dither_tpdf=(cfg.dither_kind == "tpdf"))
            if self._emit16 and (fuse_dither or not dither_on):
                dkw["emit_i16"] = True
                emit_done = True
            if self._conv_pair:
                from ..ops.pallas.fir_td import PCM16_SCALE, split_bf16

                kp = self._k_pad
                if self._i16_tail:
                    ext_i = jnp.concatenate([state.conv_tail, signal],
                                            axis=-1)
                    rows_f = (self._frame_rows(ext_i, nb, kp + L)
                              .astype(jnp.float32) * PCM16_SCALE)
                    rh, rl = split_bf16(rows_f)
                    new_tail = ext_i[:, -kp:]
                else:  # pair-ingest: frame in the SPLIT domain (the split
                    # is elementwise, so framing commutes with it and the
                    # kernel sees bit-identical pair windows)
                    th, tl = state.conv_tail
                    sh, sl = split_bf16(signal)
                    ext_h = jnp.concatenate([th, sh], axis=-1)
                    ext_l = jnp.concatenate([tl, sl], axis=-1)
                    rh = self._frame_rows(ext_h, nb, kp + L)
                    rl = self._frame_rows(ext_l, nb, kp + L)
                    new_tail = (ext_h[:, -kp:], ext_l[:, -kp:])
                y = fir_td_mxu_pair(
                    pad_rows(rh[:, kp:]), pad_rows(rl[:, kp:]),
                    pad_rows(rh[:, :kp]), pad_rows(rl[:, :kp]), band,
                    interpret=self._pl_interpret, **dkw)
            else:
                ext = jnp.concatenate(
                    [state.conv_tail[..., -(n_conv - 1):], signal], axis=-1)
                rows = self._frame_rows(ext, nb, n_conv - 1 + L)
                y = fir_td_mxu(pad_rows(rows), band,
                               interpret=self._pl_interpret, **dkw)
                new_tail = ext[:, -(n_conv - 1):]
        else:  # fused fft strategy: one batched overlap-save pass
            ext = jnp.concatenate(
                [state.conv_tail[..., -(n_conv - 1):], signal], axis=-1)
            rows = self._frame_rows(ext, nb, n_conv - 1 + L)
            H = params.combined_response(has_eq, premultiplied=True)
            if H.ndim == 2:  # per-stream responses: one row per stream,
                # repeated nb× to match the B-major folded rows
                H = jnp.repeat(H, nb, axis=0)
            Y = jnp.fft.rfft(rows, n=self.nfft) * H
            y = jax.lax.slice_in_dim(jnp.fft.irfft(Y, n=self.nfft),
                                     n_conv - 1, n_conv - 1 + L, axis=-1)
            new_tail = ext[:, -(n_conv - 1):]

        if cfg.output_clip is not None and not clip_done:
            y = jnp.clip(y, -cfg.output_clip, cfg.output_clip)
        if dither_on and not dither_done:
            key, sub = jax.random.split(key)
            if not self._pl_interpret:
                from ..ops.pallas.dither_pl import dither_pallas

                y = dither_pallas(sub, y, cfg.dither_bits, cfg.dither_kind)
            else:
                y = dither(sub, y, cfg.dither_bits, cfg.dither_kind)
        if self._emit16 and not emit_done:
            from ..ops.pallas.fir_td import quantize_pcm16

            y = quantize_pcm16(y)

        y = y[:R].reshape(B, nb, -1).reshape(B, -1)
        new_state = StreamState(
            asrc=state.asrc, up=state.up, conv_tail=new_tail,
            down=state.down, agc_gain=state.agc_gain, key=key, wf=state.wf)
        return new_state, y
