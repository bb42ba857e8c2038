"""The render device: SoA param table, device state, and the block graph.

This is the TPU-native analog of DeviceBase + renderSamples (core/device.h,
alc/alu.cpp:2395-2438).  Key inversion vs the reference: instead of a
sequential `for voice in voices: Voice::mix(...)` loop feeding per-channel
SIMD kernels, the whole voice population lives in one structure-of-arrays
param table and a single jitted graph per device configuration renders a
1024-sample block for every voice at once:

    resample (gather) → biquad filters (scan) → gain-ramped mix (matmul)
    → [HRTF FFT accumulate] → B-Format decode (matmul) → output

Host↔device traffic per block is one param-table upload and one
[T, channels] output download; all sample-domain state (filter z's, band
splitter states, HRTF accumulator tail) is carried in a device-resident
state pytree.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import threading

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import (
    BUFFER_LINE_SIZE,
    GAIN_FADE_SAMPLES,
    MAX_AMBI_CHANNELS,
    RESAMPLE_TAPS,
)
from ..constants import MIXER_FRAC_BITS as MIXER_FRAC_BITS_
from ..ops import filters as f_ops
from ..ops import hrtf_mix
from ..ops import mix as mix_ops
from ..ops import nfc as nfc_ops
from ..ops import resample as rs_ops
from ..ops import tables
from ..ops import uhj as uhj_ops
from ..ops.pallas import biquad as biq_pallas
from ..ops.pallas import resample2 as rs_pallas
from ..ops.pallas import resample3 as rs_gen3
from ..ops.pallas import resample_unit as rs_unit
from . import context as ctx_mod
from . import hrtf as hrtf_mod
from . import logging as log
from . import mastering
from . import panning
from .devformat import Channel, DevFmtChannels, DevFmtType
from .voice import PlayState, Voice

f32 = np.float32


def _dedupe_buffers(tree):
    """Copy repeated array leaves so every leaf owns a distinct buffer
    (donation-safety: jax.jit(donate_argnums) rejects the same buffer at
    two donated leaves)."""
    leaves, treedef = jax.tree.flatten(tree)
    seen: set[int] = set()
    out = []
    for leaf in leaves:
        if isinstance(leaf, jax.Array):
            try:
                # Buffer identity, not object identity: XLA may hand two
                # distinct ArrayImpls the same underlying buffer.
                key = leaf.unsafe_buffer_pointer()
            except Exception:
                key = id(leaf)
            if key in seen:
                leaf = jnp.copy(leaf)
            else:
                seen.add(key)
        out.append(leaf)
    return jax.tree.unflatten(treedef, out)


class BufferPool:
    """Device-resident sample pool with a host-side bump/free allocator.

    Decoded float32 planar buffer data is uploaded once; voices gather from
    it with affine index math (replacing the reference's per-block staging
    copies in Voice::mix, core/voice.cpp:867-931).
    """

    def __init__(self, initial_capacity: int = 1 << 20) -> None:
        self._host = np.zeros(initial_capacity, f32)
        self._top = 8  # offset 0 reserved: silence guard
        self._free: list[tuple[int, int]] = []
        self._device: jax.Array | None = None
        self._dirty = True

    def alloc(self, data: np.ndarray) -> int:
        n = data.size
        for i, (off, sz) in enumerate(self._free):
            if sz >= n:
                self._free.pop(i)
                if sz > n:
                    self._free.append((off + n, sz - n))
                self._host[off:off + n] = data.ravel()
                self._dirty = True
                return off
        while self._top + n + 4096 > self._host.size:
            self._host = np.concatenate([self._host, np.zeros(self._host.size, f32)])
        off = self._top
        self._top += n
        self._host[off:off + n] = data.ravel()
        self._dirty = True
        return off

    # Pool-top DMA slack: the Pallas resamplers fetch aligned windows with
    # up to this much overrun past a buffer's end; keeping the pool array
    # this much larger than the data top means the window clip
    # (clip(start, 0, pool_len - fetch)) never engages for in-bounds reads.
    _SLACK = 4096

    def free(self, offset: int, size: int) -> None:
        # Coalesce with adjacent free spans so buffer churn doesn't fragment
        # the pool (the reference has no pool at all; per-buffer mallocs).
        self._free.append((offset, size))
        self._free.sort()
        merged: list[tuple[int, int]] = []
        for off, sz in self._free:
            if merged and merged[-1][0] + merged[-1][1] == off:
                merged[-1] = (merged[-1][0], merged[-1][1] + sz)
            else:
                merged.append((off, sz))
        # A top-adjacent free span returns to the bump allocator.
        if merged and merged[-1][0] + merged[-1][1] == self._top:
            self._top = merged.pop()[0]
        self._free = merged

    def device_array(self) -> jax.Array:
        if self._dirty or self._device is None:
            self._device = jnp.asarray(self._host)
            self._dirty = False
        return self._device


@dataclasses.dataclass
class ParamTable:
    """SoA per-line mixing parameters (the atomically-swapped props of the
    reference, batched).  One row = one voice mixing channel."""
    capacity: int
    n_dry: int
    n_sends: int
    n_wet: int

    def __post_init__(self) -> None:
        L = self.capacity
        self.active = np.zeros(L, bool)
        self.playing = np.zeros(L, bool)
        self.fade = np.zeros(L, np.int32)
        self.pos_int = np.zeros(L, np.int32)
        self.pos_frac = np.zeros(L, np.int32)
        self.increment = np.full(L, 1, np.int32)
        self.bank_row = np.zeros(L, np.int32)
        self.sf = np.zeros(L, f32)
        self.src_off = np.zeros(L, np.int32)
        self.src_len = np.zeros(L, np.int32)
        self.loop_start = np.zeros(L, np.int32)
        self.loop_end = np.full(L, 1, np.int32)
        self.has_loop = np.zeros(L, bool)
        self.has_wrapped = np.zeros(L, bool)
        self.dry_cur = np.zeros((L, self.n_dry), f32)
        self.dry_tgt = np.zeros((L, self.n_dry), f32)
        self.filter_active = np.zeros(L, bool)
        self.filter_coeffs = np.zeros((L, 2, 5), f32)
        self.filter_target = np.zeros((L, 2, 5), f32)
        self.filter_counter = np.zeros(L, np.int32)
        # Identity biquads by default
        self.filter_coeffs[:, :, 0] = 1.0
        self.filter_target[:, :, 0] = 1.0
        # HRTF rows (used when the device renders binaural).  Coeffs are
        # 192 taps: the 128-tap HRIR shifted by its integer delay (exact,
        # host-side), so the device needs no per-bin phase factors.
        self.hrtf_gain = np.zeros(L, f32)
        self.hrtf_old_gain = np.zeros(L, f32)
        self.hrtf_coeffs = np.zeros((L, 192, 2), f32)
        self.hrtf_old_coeffs = np.zeros((L, 192, 2), f32)
        self.hrtf_delay = np.zeros((L, 2), np.int32)
        self.hrtf_old_delay = np.zeros((L, 2), np.int32)
        # Wet sends: routing + gains
        self.wet_slot = np.zeros((L, max(self.n_sends, 1)), np.int32)
        self.wet_active = np.zeros((L, max(self.n_sends, 1)), bool)
        self.wet_cur = np.zeros((L, max(self.n_sends, 1), self.n_wet), f32)
        self.wet_tgt = np.zeros((L, max(self.n_sends, 1), self.n_wet), f32)
        self.send_filter_active = np.zeros((L, max(self.n_sends, 1)), bool)
        self.send_filter_coeffs = np.zeros((L, max(self.n_sends, 1), 2, 5), f32)
        self.send_filter_target = np.zeros((L, max(self.n_sends, 1), 2, 5), f32)
        self.send_filter_counter = np.zeros((L, max(self.n_sends, 1)), np.int32)
        self.send_filter_coeffs[:, :, :, 0] = 1.0
        self.send_filter_target[:, :, :, 0] = 1.0
        # NFC (only consumed when the device has NFC enabled): w0 per row,
        # -1.0 = create-state identity filter (un-adjusted, nfc.cpp:56-73).
        self.nfc_w0 = np.full(L, -1.0, f32)
        self.nfc_active = np.zeros(L, bool)

    # Fields that evolve deterministically on-device within a dispatch
    # (positions advance, gain ramps complete, filter coefficients interp,
    # fades expire); the host mirrors their end state with identical integer/
    # f32 math, so they upload once per dispatch — not per block.
    _EVOLVING = ("pos_int", "pos_frac", "fade", "has_wrapped", "dry_cur",
                 "filter_coeffs", "filter_counter", "wet_cur",
                 "send_filter_coeffs", "send_filter_counter")
    # Configuration fields: change only on voice/param events.  Note
    # has_wrapped is EVOLVING: the device detects loop wraps itself (the
    # position rebase below), so a wrap is not a host-visible event and
    # steady looping scenes never leave the chunked dispatch path.
    _CONFIG = ("active", "playing", "increment", "bank_row", "sf", "src_off",
               "src_len", "loop_start", "loop_end", "has_loop",
               "dry_tgt", "filter_active", "filter_target", "hrtf_gain",
               "hrtf_old_gain", "hrtf_coeffs", "hrtf_old_coeffs", "hrtf_delay",
               "hrtf_old_delay", "wet_slot", "wet_active", "wet_tgt",
               "send_filter_active", "send_filter_target",
               "nfc_w0", "nfc_active")
    _FIELDS = _EVOLVING + _CONFIG

    def evolving_dict(self) -> dict:
        out = {k: jnp.asarray(getattr(self, k)) for k in self._EVOLVING}
        # -1 marks never-initialized interp filters host-side; device sees 0.
        out["filter_counter"] = jnp.maximum(out["filter_counter"], 0)
        return out

    def config_dict(self) -> dict:
        return {k: jnp.asarray(getattr(self, k)) for k in self._CONFIG}

    def clear_row(self, r: int) -> None:
        self.active[r] = False
        self.playing[r] = False
        self.fade[r] = 0
        self.dry_cur[r] = 0.0
        self.dry_tgt[r] = 0.0
        self.wet_cur[r] = 0.0
        self.wet_tgt[r] = 0.0
        self.filter_active[r] = False
        self.filter_coeffs[r] = 0.0
        self.filter_coeffs[r, :, 0] = 1.0
        self.filter_target[r] = self.filter_coeffs[r]
        self.filter_counter[r] = -1  # fresh filter: first update snaps (biquad.cpp:144-149)
        self.send_filter_counter[r] = 0
        self.hrtf_gain[r] = 0.0
        self.hrtf_old_gain[r] = 0.0
        self.hrtf_coeffs[r] = 0.0
        self.hrtf_old_coeffs[r] = 0.0
        self.hrtf_delay[r] = 0
        self.hrtf_old_delay[r] = 0
        self.nfc_w0[r] = -1.0
        self.nfc_active[r] = False


class RenderDevice:
    """A playback device rendering through the batched TPU block graph."""

    def __init__(self, sample_rate: int = 48000,
                 fmt_channels: DevFmtChannels = DevFmtChannels.STEREO,
                 fmt_type: DevFmtType = DevFmtType.FLOAT,
                 *, capacity: int = 256, num_aux_sends: int = 2,
                 render_mode: panning.RenderMode | None = None,
                 hq_decode: bool = True,
                 ambi_order: int = 1,
                 hrtf_path: str | None = None,
                 loopback: bool = True) -> None:
        self.sample_rate = int(sample_rate)
        self.fmt_channels = fmt_channels
        self.fmt_type = fmt_type
        self.capacity = capacity
        self.num_aux_sends = num_aux_sends
        self.hrtf_store = None

        stereo_encoding = None
        if render_mode is None:
            # Default stereo output uses pairwise panning (panning.cpp:1420);
            # other formats use normal speaker decode.  The stereo-encoding
            # config key selects UHJ encode or HRTF instead
            # (panning.cpp:1366-1394).
            render_mode = (panning.RenderMode.PAIRWISE
                           if fmt_channels == DevFmtChannels.STEREO
                           else panning.RenderMode.NORMAL)
            if fmt_channels == DevFmtChannels.STEREO:
                from ..alc import config as _alconf
                enc = (_alconf.config_value_str("", "stereo-encoding")
                       or "").lower()
                if enc == "uhj":
                    stereo_encoding = "uhj"
                    render_mode = panning.RenderMode.NORMAL
                elif enc == "tsme":
                    stereo_encoding = "tsme"
                    render_mode = panning.RenderMode.NORMAL
                elif enc == "hrtf":
                    render_mode = panning.RenderMode.HRTF
        hrtf_full = True
        if render_mode == panning.RenderMode.HRTF:
            # InitHrtfPanning (panning.cpp:846-1138): "full" mode renders
            # each voice through its own HRIRs over a 1st-order ambi bus;
            # "ambi1".."ambi4" pan voices normally onto an order-N bus and
            # only the baked HRIR decode is binaural.  700 Hz crossover.
            from ..alc import config as _alconf
            mode_str = (_alconf.config_value_str("", "hrtf-mode")
                        or "full").lower()
            if mode_str == "basic":   # deprecated alias (panning.cpp:1078)
                mode_str = "ambi2"
            if mode_str in ("ambi1", "ambi2", "ambi3", "ambi4"):
                hrtf_full = False
                ambi_order = int(mode_str[-1])
            else:
                ambi_order = 1
        # Custom ambdec decoder for speaker layouts (aluInitRenderer,
        # panning.cpp:1236-1296): config key decoder/<layout> names the file.
        custom_decoder = None
        if render_mode not in (panning.RenderMode.HRTF,):
            _LAYOUT_KEYS = {
                DevFmtChannels.QUAD: "quad", DevFmtChannels.X51: "surround51",
                DevFmtChannels.X61: "surround61",
                DevFmtChannels.X71: "surround71",
                DevFmtChannels.X714: "surround714",
                DevFmtChannels.X7144: "surround7144",
                DevFmtChannels.X3D71: "3d71",
            }
            if (key := _LAYOUT_KEYS.get(fmt_channels)) is not None:
                from ..alc import config as _alconf
                decopt = _alconf.config_value_str("decoder", key)
                if decopt is None and key == "3d71":
                    decopt = _alconf.config_value_str("decoder",
                                                      "surround3d71")
                if decopt:
                    from . import ambdec as ambdec_mod
                    from . import helpers
                    # Relative preset names resolve through the data-file
                    # search paths (SearchDataFiles "presets",
                    # alc/panning.cpp:404-420).
                    decopt = (helpers.find_data_file(
                        decopt, ".ambdec", "presets") or decopt)
                    conf = ambdec_mod.load_ambdec(decopt)
                    custom_decoder = ambdec_mod.make_decoder(conf,
                                                             fmt_channels)
                    log.trace("Using %s decoder: %s", key, conf.description)
        self.layout = panning.init_panning(
            fmt_channels, self.sample_rate, hq_decode=hq_decode,
            render_mode=render_mode, ambi_order=ambi_order,
            xover_freq=700.0 if render_mode == panning.RenderMode.HRTF else 400.0,
            hrtf_full=hrtf_full, decoder=custom_decoder,
            stereo_encoding=stereo_encoding)
        self.n_dry = self.layout.n_dry
        self.n_real = len(self.layout.real_channels) or self.n_dry

        if render_mode == panning.RenderMode.HRTF:
            # Enumerated + rate-resampled load (GetLoadedHrtf,
            # core/hrtf.cpp:466-608); synthetic fallback with no data sets.
            store = hrtf_mod.load_hrtf(self.sample_rate, path=hrtf_path)
            self.hrtf_store = (store if store is not None
                               else hrtf_mod.make_synthetic_hrtf(self.sample_rate))
            log.trace("HRTF enabled: %s order, rate %d, ir %d",
                      ambi_order, self.hrtf_store.sample_rate,
                      self.hrtf_store.ir_size)
            self.ir_size = self.hrtf_store.ir_size
            self._direct_hrtf = hrtf_mod.build_direct_hrtf(
                self.hrtf_store, self.ir_size, ambi_order)
            # Zero-extend the baked 128-tap decode HRIRs to the voices'
            # 192-tap (delay-shifted) frame so both accumulate through the
            # same skew-sum.
            _dc = np.asarray(self._direct_hrtf.coeffs)
            self._direct_coeffs = np.concatenate(
                [_dc, np.zeros((_dc.shape[0], hrtf_mix.HRIR_EXT - _dc.shape[1],
                                2), f32)], axis=1)
            self._direct_hf_scales = np.asarray(self._direct_hrtf.hf_scales)
            self._hrtf_splitter = f_ops.BandSplitterKernels(
                float(f_ops.band_splitter_coeff(700.0 / self.sample_rate)),
                variant_3arg=True)

        # Near-field compensation (InitNearFieldCtrl, panning.cpp:276-300):
        # config-gated; control distance = HRTF field distance in HRTF mode,
        # decoder/speaker-dist for ambisonic output.
        from ..alc import config as alconf
        self.nfc = None
        self.avg_speaker_dist = 0.0
        self.nfc_scale = float(np.clip(alconf.config_value_float(
            "game_compat", "nfc-scale", 1.0), 0.0001, 10000.0))
        if alconf.config_value_bool("decoder", "nfc", False):
            ctrl = 0.0
            if self.layout.mode == panning.RenderMode.HRTF:
                ctrl = float(self.hrtf_store.field_distances[0])
            elif custom_decoder is not None:
                # Average positive speaker distances; 1.0 default when the
                # preset has none (panning.cpp:1283-1291).
                dists = custom_decoder.speaker_dists
                pos = dists[dists > 0.0]
                ctrl = (float(pos.mean()) if pos.size
                        else alconf.config_value_float(
                            "decoder", "speaker-dist", 1.0))
            elif self.layout.uhj_output:
                # ~2 m default control distance (panning.cpp:1153-1161)
                ctrl = alconf.config_value_float("uhj", "distance-ref", 2.0)
            elif (self.layout.dec_hf is None
                  and fmt_channels == DevFmtChannels.AMBI3D):
                ctrl = alconf.config_value_float("decoder", "speaker-dist",
                                                 0.0) or 0.0
            if ctrl > 0.0:
                self.avg_speaker_dist = float(np.clip(ctrl, 0.1, 10.0))
                w1 = float(nfc_ops.SPEED_OF_SOUND
                           / (f32(self.avg_speaker_dist)
                              * f32(self.sample_rate)))
                self.nfc = nfc_ops.NfcDeviceConsts(w1)
                log.trace("Using near-field reference distance: %.2f meters",
                          self.avg_speaker_dist)
        # Dry-channel spans per ambisonic order (contiguous in ACN order).
        # dry_acn holds true ACN indices for both 2D and 3D buses, so
        # floor(sqrt(acn)) is the order in either mixing mode.
        if self.nfc is not None:
            order_of = np.floor(np.sqrt(self.layout.dry_acn)).astype(int)
            groups = []
            for o in range(int(order_of.max()) + 1):
                idx = np.nonzero(order_of == o)[0]
                assert (np.diff(idx) == 1).all(), "non-contiguous order group"
                groups.append((int(idx[0]), int(idx[-1]) + 1))
            self._nfc_groups = groups

        # Distance compensation (InitDistanceComp, panning.cpp:301-360 +
        # doDistanceComp at alu.cpp:2261): per-speaker whole-sample delay +
        # level scale on the real outputs, before the limiter.
        self._dist_comp = None
        if (custom_decoder is not None
                and custom_decoder.speaker_dists is not None
                and alconf.config_value_bool("decoder", "distance-comp",
                                             True)):
            dists = custom_decoder.speaker_dists
            maxdist = float(dists.max(initial=0.0))
            if maxdist > 0.0:
                scale = f32(self.sample_rate) / nfc_ops.SPEED_OF_SOUND
                delays = np.zeros(self.n_real, np.int64)
                gains = np.ones(self.n_real, f32)
                for ch, dist in zip(custom_decoder.channels, dists):
                    idx = self.layout.channel_index.get(ch)
                    if idx is None or not dist > 0.0:
                        continue
                    delays[idx] = int(np.floor(
                        f32((maxdist - dist) * scale) + f32(0.5)))
                    gains[idx] = f32(dist / maxdist)
                bufs = [np.zeros(int(d), f32) for d in delays]
                self._dist_comp = (delays, gains, bufs)

        # Front stabilizer (alu.cpp:329-405): speaker decodes with FL/FR/FC
        # outputs where the decoder itself leaves FC silent; config-gated.
        # Splits the decoded front mid at 5 kHz and re-pans LF 1/3 and HF
        # 1/4 toward center, all-passing every other channel into phase.
        self._stab = None
        if (self.layout.dec_hf is not None
                and alconf.config_value_bool("", "front-stablizer", False)):
            ci = self.layout.channel_index
            need = (Channel.FRONT_LEFT, Channel.FRONT_RIGHT,
                    Channel.FRONT_CENTER)
            if all(ch in ci for ch in need):
                cidx = ci[Channel.FRONT_CENTER]
                hasfc = bool(np.any(self.layout.dec_hf[cidx]))
                if self.layout.dec_lf is not None:
                    hasfc |= bool(np.any(self.layout.dec_lf[cidx]))
                if not hasfc:
                    self._stab = {
                        "idx": (ci[Channel.FRONT_LEFT],
                                ci[Channel.FRONT_RIGHT], cidx),
                        "coeff": float(f_ops.band_splitter_coeff(
                            5000.0 / self.sample_rate)),
                    }

        self.pool = BufferPool()
        self.table = ParamTable(capacity, self.n_dry, num_aux_sends,
                                MAX_AMBI_CHANNELS)
        # UHJ/TSME codec quality tiers (uhj/decode-filter etc.,
        # alc/alc.cpp:548-585): iir (default) / fir256 / fir512.
        def _quality(block: str, key: str) -> str:
            v = (alconf.config_value_str(block, key) or "iir").lower()
            return v if v in ("iir", "fir256", "fir512") else "iir"
        self._uhj_dec_q = _quality("uhj", "decode-filter")
        self._tsme_dec_q = _quality("tsme", "decode-filter")
        self._uhj_enc_q = _quality("uhj", "encode-filter")
        self._tsme_enc_q = _quality("tsme", "encode-filter")
        self._uhj_enc = None
        self._tsme_enc = None
        # Cross-thread protocol: the render thread (backend mixer loop) and
        # app threads (source property writes, row alloc) serialize on this
        # lock — the mutex analog of the reference's wait-free prop-swap
        # discipline (alu.cpp:2009-2013; SURVEY §2.2).  App-side writes that
        # are single GIL-atomic assignments (props object swaps, dirty
        # flags) stay lock-free like the reference's atomics.
        self.lock = threading.RLock()
        self.connected = True
        self._free_rows = list(range(capacity - 1, -1, -1))
        # Host numpy: closed-over constants materialize on whatever backend
        # traces them (the virtual-CPU sharding mesh as well as the TPU).
        self._bank = {k: np.asarray(v) for k, v in tables.weight_bank().items()}
        self._bank_pad = None   # built lazily for the Pallas resampler
        self._bank_sl = None    # (taps, sliced bank) for the gen3 kernel
        self._taps = 4  # raised when voices use bsinc resamplers
        # The Pallas resampler is the TPU production path; the jnp path is
        # the CPU/test reference (ARCHITECTURE.md "perf kernel tier").
        self._pallas_ok = jax.default_backend() == "tpu"
        # Whole-pipeline Pallas reverb kernel (ops/pallas/reverb.py) for
        # wide (super-block) windows; OPENAL_PALLAS_REVERB=0 opts out.
        self._pallas_reverb = (os.environ.get("OPENAL_PALLAS_REVERB", "1")
                               not in ("0", "false", "off"))
        # Accelerator-loss fallback (alu.cpp:2499 analog): one-way switch
        # to XLA:CPU on a runtime error mid-render.
        self._cpu_fallback = False
        self._cpu_dev = None
        self._cfg_dev = None
        self._ev_dev = None   # device-evolved copy of the _EVOLVING fields
        self._rs_shared = None   # shared-pool unit-kernel statics (w/ cfg)
        self._cfg_has_resets = False
        self._pending_resets = set()
        self.contexts: list = []
        # Effect slots: aluInitEffectPanning gives each slot a full-order
        # ambisonic wet bus (ACN, unit scale).
        self.wet_channels = (self.layout.ambi_order + 1) ** 2
        self.slots: list = []
        self._state = self._init_state()
        self._clock_samples = 0
        self._carry: np.ndarray | None = None  # rendered-ahead frames (f32)
        self._uhj_groups: dict = {"u2": [], "u3": [], "u4": [], "ss": []}

        # BS2B crossfeed (panning.cpp:1421-1431): basic stereo, cf_level
        # config 1..6, and — like the reference — never on loopback devices
        # (the app owns loopback output; crossfeed only applies to devices
        # that drive physical audio, e.g. the wave/null backends).
        self._bs2b = None
        if (fmt_channels == DevFmtChannels.STEREO
                and not loopback
                and render_mode != panning.RenderMode.HRTF
                and not self.layout.uhj_output):
            cf = alconf.config_value_int("", "cf_level", 0) or 0
            if 1 <= cf <= 6:
                from . import bs2b as bs2b_mod
                self._bs2b = bs2b_mod.Bs2bProcessor(cf, self.sample_rate)

        # Output stage (alc/alc.cpp:1677-1763): dither for 8/16-bit output,
        # limiter for all integer formats (headroom-derived threshold).
        # Config: `dither` (bool, default on), `dither-depth` (bits, 0 =
        # auto per format), `output-limiter` (tri-state: unset keeps the
        # per-format default), `volume-adjust` (output gain in dB).
        depth = mastering.default_dither_depth(fmt_type.name)
        if not alconf.config_value_bool("", "dither", True):
            depth = 0
        elif (dd := alconf.config_value_int("", "dither-depth", 0) or 0) > 0:
            depth = int(np.clip(dd, 2, 24))
        self.dither = (mastering.DitherState(depth) if depth > 0 else None)
        self.limiter = None
        lim_opt = alconf.config_value_str("", "output-limiter")
        want_limiter = (fmt_type != DevFmtType.FLOAT
                        if lim_opt is None
                        else lim_opt.lower() in ("true", "yes", "on", "1"))
        if want_limiter:
            thr_db = mastering.limiter_threshold_db(fmt_type.name, depth)
            self.limiter = mastering.Limiter(self.n_real,
                                             float(self.sample_rate), thr_db)
        vol_db = alconf.config_value_float("", "volume-adjust", 0.0) or 0.0
        self._volume_scale = (float(10.0 ** (vol_db / 20.0))
                              if vol_db else None)

        # Effective decode matrices with -100 dB entries zeroed (MixSamples
        # silence-skip, mixer_c.cpp:180-181).
        def _thresh(m):
            if m is None:
                return None
            out = m.copy()
            out[np.abs(out) <= 1.0e-5] = 0.0
            return out

        self._dec_hf = _thresh(self.layout.dec_hf)
        self._dec_lf = _thresh(self.layout.dec_lf)
        self._uhj_splitter = f_ops.BandSplitterKernels(
            float(f_ops.band_splitter_coeff(self.layout.xover_f0norm)))
        self._splitter = (f_ops.BandSplitterKernels(
            float(f_ops.band_splitter_coeff(self.layout.xover_f0norm)))
            if self._dec_lf is not None else None)

    # --- row allocation ---

    def alloc_rows(self, n: int) -> list[int]:
        with self.lock:
            if len(self._free_rows) < n:
                # The reference grows its voice pool on demand
                # (alc.cpp:1952); here capacity keys the compiled graph
                # shape, so report clearly.
                raise RuntimeError(
                    f"voice capacity exhausted: {n} rows requested, "
                    f"{len(self._free_rows)} free of {self.capacity} "
                    f"(raise the device's `capacity` or stop sources first)")
            rows = [self._free_rows.pop() for _ in range(n)]
            for r in rows:
                self.table.clear_row(r)
            self._pending_resets.update(rows)
            self._cfg_dev = None
            return rows

    def free_rows(self, rows: list[int]) -> None:
        with self.lock:
            for r in rows:
                self.table.clear_row(r)
                self._free_rows.append(r)
            self._cfg_dev = None

    def set_taps(self, taps: int) -> None:
        self._taps = max(self._taps, taps)

    # --- effect slots ---

    def register_slot(self, slot) -> int:
        self.slots.append(slot)
        idx = len(self.slots) - 1
        self._state[f"slot{idx}"] = slot.state.device_update()
        self._cfg_dev = None
        return idx

    def slot_effect_changed(self, slot, buffer=None) -> None:
        self._state[f"slot{slot.index}"] = slot.state.device_update(buffer)
        self._cfg_dev = None

    def _chain_signature(self) -> tuple:
        sig = tuple(getattr(s.state, "state_signature", lambda: s.effect_type)()
                    for s in self.slots)
        counts = tuple(len(self._uhj_groups[k]) for k in ("u2", "u3", "u4", "ss"))
        return (sig + (("uhj",) + counts if any(counts) else ())
                + self._graph_gates())

    def _graph_gates(self) -> tuple:
        """Scene-profile flags that statically prune the block graph.

        Host-known facts the traced graph cannot see (all arrays look live
        to XLA): when no voice has a direct filter, the biquad stage drops
        out; when nothing feeds the dry ambisonic bus in per-voice-HRIR
        mode, the dry mix + band-split + direct decode drop out.  The flags
        ride the static chain signature, so a profile change just selects a
        different cached graph."""
        g = []
        t = self.table
        if not bool(t.filter_active[t.active].any()):
            g.append("gate:nofilt")
        if not bool(t.send_filter_active[t.active].any()):
            g.append("gate:nosendfilt")
        if (self.layout.mode == panning.RenderMode.HRTF and not self.slots
                and self.nfc is None
                and not bool(np.any(t.dry_tgt[t.active]))):
            g.append("gate:nodry")
        return tuple(g)

    # --- device state pytree ---

    def _init_state(self) -> dict:
        L = self.capacity
        state = {
            "filter_z": jnp.zeros((L, 2, 2), jnp.float32),
            "send_filter_z": jnp.zeros((L, max(self.num_aux_sends, 1), 2, 2),
                                       jnp.float32),
        }
        if self._uses_dual_band():
            state["split_state"] = jnp.zeros((self.n_dry, 3), jnp.float32)
        if self.nfc is not None:
            state["nfc_z"] = jnp.zeros((L, nfc_ops.NUM_STATES), jnp.float32)
        if self.layout.uhj_output:
            if self._uhj_enc_q == "iir":
                state.update(uhj_ops.uhj_encoder_iir_state())
            else:
                self._uhj_enc = uhj_ops.UhjEncoderState(
                    512 if self._uhj_enc_q == "fir512" else 256)
                state.update({f"uhjenc_{k}": v
                              for k, v in self._uhj_enc.init().items()})
        if self.layout.tsme_output:
            if self._tsme_enc_q == "iir":
                state.update(uhj_ops.tsme_encoder_iir_state())
            else:
                self._tsme_enc = uhj_ops.TsmeEncoderState(
                    512 if self._tsme_enc_q == "fir512" else 256)
                state.update({f"tsmeenc_{k}": v
                              for k, v in self._tsme_enc.init().items()})
        if self._stab is not None:
            state["stab_mid"] = jnp.zeros((1, 3), jnp.float32)
            state["stab_ap"] = jnp.zeros(self.n_real, jnp.float32)
        if self.layout.mode == panning.RenderMode.HRTF:
            state["hrtf_history"] = jnp.zeros((L, hrtf_mix.HIST), jnp.float32)
            state["hrtf_tail"] = jnp.zeros((128, 2), jnp.float32)
            state["direct_split"] = jnp.zeros((self.n_dry, 3), jnp.float32)
        return state

    def _uses_dual_band(self) -> bool:
        return self.layout.dec_lf is not None

    # --- the jitted block graph ---

    def _unit_resample(self, pool2d, cfg: dict, ev: dict, W: int, taps: int,
                       rs_plan: tuple):
        """Dispatch the unit-increment resampler: shared-pool staging when
        the plan carries the "sh" statics (active regions fit one VMEM
        image — zero per-voice DMAs), per-voice span DMAs otherwise."""
        if len(rs_plan) >= 3 and rs_plan[2] == "sh":
            n256, n64, vrows = rs_plan[3], rs_plan[4], rs_plan[5]
            return rs_unit.resample_voices_unit_shared(
                pool2d, cfg["rs_off_vmem"], cfg["src_len"],
                cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                ev["has_wrapped"], ev["pos_int"], cfg["rs_unit_w"],
                cfg["rs_shared_chunks"], W, taps,
                n256=n256, n64=n64, vrows=vrows, active=cfg["active"])
        return rs_unit.resample_voices_unit(
            pool2d, cfg["src_off"], cfg["src_len"], cfg["loop_start"],
            cfg["loop_end"], cfg["has_loop"], ev["has_wrapped"],
            ev["pos_int"], cfg["rs_unit_w"], W, taps)

    def _gen3_resample(self, pool2d, cfg: dict, ev: dict, W: int, taps: int,
                       rs_plan: tuple):
        """Dispatch the general (any-pitch) shared-pool resampler."""
        _, _, n256, n64, vrows, bucket = rs_plan
        return rs_gen3.resample_voices_gen_shared(
            pool2d, cfg["rs_off_vmem"], cfg["src_len"], cfg["loop_start"],
            cfg["loop_end"], cfg["has_loop"], ev["has_wrapped"],
            ev["pos_int"], ev["pos_frac"], cfg["increment"],
            cfg["bank_row"], cfg["sf"], self._bank_sl[1],
            cfg["rs_shared_chunks"], W, taps, n256=n256, n64=n64,
            vrows=vrows, max_inc=bucket, active=cfg["active"])

    def _render_one(self, state: dict, ev: dict, cfg: dict, pool: jax.Array,
                    T: int, taps: int, rs_plan: tuple | None = None,
                    axis_name: str | None = None,
                    x_pre: jax.Array | None = None,
                    gates: tuple = ()):
        """One block: returns (out [C,T], state', ev').

        With ``axis_name`` set (multi-chip: called under shard_map with the
        voice rows sharded over that mesh axis), the three cross-voice
        reductions — the dry ambisonic bus, the wet slot buses, and the HRTF
        accumulation spectra — become psums over ICI; the cheap post-voice
        stages (effects, decode) run replicated.

        Evolving fields advance exactly as the host mirrors them: positions
        by the fixed-point step, current gains to targets, filter coeffs per
        the interp schedule, the fade counter to zero (with Current==Target
        the continued 64-sample "fade" of the reference is the identity)."""
        T_res = T + self._uhj_pad()
        if x_pre is not None:
            # Super-block dispatch: the resample for several blocks ran as
            # one kernel call (one span DMA per voice per super-block); this
            # block consumes its slice.
            x = x_pre
        elif rs_plan is not None and rs_plan[0] == "unit":
            x = self._unit_resample(pool.reshape(-1, 128), cfg, ev, T_res,
                                    taps, rs_plan)
        elif rs_plan is not None and rs_plan[0] == "gen3":
            x = self._gen3_resample(pool.reshape(-1, 128), cfg, ev, T_res,
                                    taps, rs_plan)
        elif rs_plan is not None:
            span, winw = rs_plan[1], rs_plan[2]
            x = rs_pallas.resample_voices_pallas2(
                pool.reshape(-1, 128), cfg["src_off"], cfg["src_len"],
                cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                ev["has_wrapped"], ev["pos_int"], ev["pos_frac"],
                cfg["increment"], cfg["bank_row"], cfg["sf"],
                self._bank_pad, T_res, taps, span, winw)
        else:
            x = rs_ops.resample_voices(
                pool, cfg["src_off"], cfg["src_len"], cfg["loop_start"],
                cfg["loop_end"], cfg["has_loop"], ev["has_wrapped"],
                ev["pos_int"], ev["pos_frac"], cfg["increment"],
                cfg["bank_row"], cfg["sf"], self._bank, T_res, taps)
        x = jnp.where(cfg["active"][:, None], x, 0.0)
        x, new_uhj = self._uhj_decode(x, state, cfg, T, axis_name)

        new_state = dict(state)
        new_state.update(new_uhj)
        if "gate:nofilt" in gates:
            # Statically no direct filters: x passes through, the filter
            # memories stay cleared and the interp schedule converged —
            # bit-identical to the all-inactive dynamic path.
            x_mix = x
            new_state["filter_z"] = jnp.zeros_like(state["filter_z"])
            cf2 = cfg["filter_target"]
            cnt2 = jnp.zeros_like(ev["filter_counter"])
            fa = None
        else:
            y, z2, cf2, cnt2 = self._biquad(
                x, state["filter_z"], ev["filter_coeffs"],
                cfg["filter_target"], ev["filter_counter"], T)
            x_mix = jnp.where(cfg["filter_active"][:, None], y, x)
            # Inactive filters are cleared each block (DoFilters,
            # voice.cpp:254).
            fa = cfg["filter_active"]
            new_state["filter_z"] = jnp.where(fa[:, None, None], z2, 0.0)

        new_ev = dict(ev)
        pi2, pf2 = rs_ops.advance_positions(ev["pos_int"], ev["pos_frac"],
                                            cfg["increment"],
                                            jnp.int32(T))
        # Rebase looping voices into [loop_start, loop_end) between blocks
        # (congruent mod loop_len, so resolved reads are identical), setting
        # has_wrapped on the first wrap — the same integer math the host
        # mirror (Voice.advance) applies at chunk end.  This keeps positions
        # bounded across long chunked dispatches and makes loop wraps
        # device-local (no host event, no config rebuild).
        ll = jnp.maximum(cfg["loop_end"] - cfg["loop_start"], 1)
        rebase = cfg["has_loop"] & (pi2 >= cfg["loop_end"])
        pi2 = jnp.where(rebase,
                        cfg["loop_start"] + (pi2 - cfg["loop_start"]) % ll,
                        pi2)
        new_ev["pos_int"], new_ev["pos_frac"] = pi2, pf2
        new_ev["has_wrapped"] = ev["has_wrapped"] | rebase
        if fa is None:
            new_ev["filter_coeffs"] = cf2
            new_ev["filter_counter"] = cnt2
        else:
            new_ev["filter_coeffs"] = jnp.where(fa[:, None, None], cf2,
                                                cfg["filter_target"])
            new_ev["filter_counter"] = jnp.where(fa, cnt2, 0)
        new_ev["fade"] = jnp.zeros_like(ev["fade"])

        no_dry = "gate:nodry" in gates
        dry_tgt = jnp.where(cfg["playing"][:, None], cfg["dry_tgt"], 0.0)
        fade = min(GAIN_FADE_SAMPLES, T)
        if no_dry:
            # Statically nothing feeds the dry ambisonic bus (per-voice-HRIR
            # scene, no B-Format/UHJ voices, no slots, no NFC): the mix, the
            # band-split and the baked direct decode all drop out.  Current
            # gains land on their (zero) targets exactly as the 64-sample
            # ramp would by block end.
            dry = None
            new_ev["dry_cur"] = dry_tgt
        elif self.nfc is not None:
            # DoNfcMix (core/voice.cpp:660-691): order-0 channels mix the
            # unfiltered samples; each higher order mixes through its NFC
            # filter.  Rows without NFC (UHJ2/SuperStereo) bypass.
            max_ord = len(self._nfc_groups) - 1
            filt, nz2 = nfc_ops.process_orders(
                x_mix, state["nfc_z"], cfg["nfc_coeffs"], self.nfc, max_ord)
            na = cfg["nfc_active"]
            filt = [jnp.where(na[:, None], xo, x_mix) for xo in filt]
            new_state["nfc_z"] = jnp.where(na[:, None], nz2, 0.0)
            pieces, curs = [], []
            for o, (lo, hi) in enumerate(self._nfc_groups):
                src = x_mix if o == 0 else filt[o - 1]
                piece, cur = mix_ops.mix_voices(
                    src, ev["dry_cur"][:, lo:hi], dry_tgt[:, lo:hi],
                    ev["fade"], fade)
                pieces.append(piece)
                curs.append(cur)
            dry = jnp.concatenate(pieces, axis=0)
            dry_cur2 = jnp.concatenate(curs, axis=1)
        else:
            dry, dry_cur2 = mix_ops.mix_voices(x_mix, ev["dry_cur"], dry_tgt,
                                               ev["fade"], fade)
        if not no_dry:
            if axis_name is not None:
                dry = jax.lax.psum(dry, axis_name)
            new_ev["dry_cur"] = dry_cur2

        # --- auxiliary sends + effect slots ------------------------------
        out_real_extra = None
        n_slots = len(self.slots)
        if n_slots:
            B = self.wet_channels
            wet_bus = jnp.zeros((n_slots, B, T), jnp.float32)
            new_sendz = []
            new_scf, new_scnt = [], []
            no_sendfilt = "gate:nosendfilt" in gates
            for snd in range(self.num_aux_sends):
                if no_sendfilt:
                    # Statically no send filters: bit-identical to the
                    # all-inactive dynamic path without the biquad pass.
                    xs = x
                    new_sendz.append(
                        jnp.zeros_like(state["send_filter_z"][:, snd]))
                    new_scf.append(cfg["send_filter_target"][:, snd])
                    new_scnt.append(
                        jnp.zeros_like(ev["send_filter_counter"][:, snd]))
                else:
                    ys, sz, scf, scnt = self._biquad(
                        x, state["send_filter_z"][:, snd],
                        ev["send_filter_coeffs"][:, snd],
                        cfg["send_filter_target"][:, snd],
                        ev["send_filter_counter"][:, snd], T)
                    sfa = cfg["send_filter_active"][:, snd]
                    xs = jnp.where(sfa[:, None], ys, x)
                    new_sendz.append(jnp.where(sfa[:, None, None], sz, 0.0))
                    new_scf.append(jnp.where(sfa[:, None, None], scf,
                                             cfg["send_filter_target"][:, snd]))
                    new_scnt.append(jnp.where(sfa, scnt, 0))
                group = jnp.where(cfg["wet_active"][:, snd],
                                  cfg["wet_slot"][:, snd], n_slots)
                wet_tgt = jnp.where(cfg["playing"][:, None],
                                    cfg["wet_tgt"][:, snd, :B], 0.0)
                bus_s, wet_cur2 = mix_ops.mix_voices_grouped(
                    xs, ev["wet_cur"][:, snd, :B], wet_tgt, ev["fade"],
                    group, n_slots + 1, fade)
                wet_bus = wet_bus + bus_s[:n_slots]
                new_ev["wet_cur"] = new_ev["wet_cur"].at[:, snd, :B].set(wet_cur2)
            if axis_name is not None:
                wet_bus = jax.lax.psum(wet_bus, axis_name)
            new_state["send_filter_z"] = jnp.stack(new_sendz, axis=1)
            new_ev["send_filter_coeffs"] = jnp.stack(new_scf, axis=1)
            new_ev["send_filter_counter"] = jnp.stack(new_scnt, axis=1)

            for i, slot in enumerate(self.slots):
                contrib, real_contrib, new_state[f"slot{i}"] = \
                    slot.state.process(state[f"slot{i}"], cfg[f"slot{i}"],
                                       wet_bus[i], T)
                dry = dry + contrib
                if real_contrib is not None:
                    out_real_extra = (real_contrib if out_real_extra is None
                                      else out_real_extra + real_contrib)

        if self.layout.mode == panning.RenderMode.HRTF:
            # Voice HRIR convolutions + direct B-Format→binaural decode, all
            # time-domain MXU contractions + one skew-sum (ops/hrtf_mix.py).
            x_cat = jnp.concatenate([state["hrtf_history"], x_mix], axis=1)
            new_state["hrtf_history"] = x_cat[:, T:]
            g_eff = jnp.where(cfg["playing"], cfg["hrtf_gain"], 0.0)
            y_ext = hrtf_mix.hrtf_voices_accum(
                x_cat, cfg["hrtf_coeffs"], cfg["hrtf_delay"], g_eff,
                cfg["hrtf_old_coeffs"], cfg["hrtf_old_delay"],
                cfg["hrtf_old_gain"], ev["fade"], cfg["active"], T, fade)
            if axis_name is not None:
                y_ext = jax.lax.psum(y_ext, axis_name)
            if not no_dry:
                # Dry ambi bus (B-Format/UHJ voices) through the baked
                # decode.
                scaled, sp2 = self._hrtf_splitter.hf_scale(
                    dry, state["direct_split"], self._direct_hf_scales)
                new_state["direct_split"] = sp2
                y_ext = y_ext + hrtf_mix.direct_hrtf_accum(
                    scaled, self._direct_coeffs, T)
            out, new_tail = hrtf_mix.fold_accum(y_ext, state["hrtf_tail"], T)
            new_state["hrtf_tail"] = new_tail
            if out_real_extra is not None:
                out = out + out_real_extra
            return out, new_state, new_ev

        # Post-process: B-Format decode to real outputs.
        if self.layout.uhj_output:
            # UhjPostProcess (alu.cpp:300): encode the FuMa2D FOA dry bus
            # (W, X, Y rows) to stereo (IIR default or FIR tier per the
            # uhj/encode-filter config key).
            if self._uhj_enc is not None:
                est = {"wxy": state["uhjenc_wxy"],
                       "jwx_hist": state["uhjenc_jwx_hist"]}
                est2, left, right = self._uhj_enc.encode(
                    est, dry[0], dry[1], dry[2], T)
                new_state.update({f"uhjenc_{k}": v for k, v in est2.items()})
            else:
                left, right, enc2 = uhj_ops.uhj_encode_iir(
                    dry[0], dry[1], dry[2],
                    {k: state[k] for k in uhj_ops.uhj_encoder_iir_state()}, T)
                new_state.update(enc2)
            out = jnp.stack([left, right])
            if out_real_extra is not None:
                out = out + out_real_extra
            return out, new_state, new_ev
        if self.layout.tsme_output:
            # TsmePostProcess: ACN FOA dry bus (W, Y, Z, X rows) encoded.
            if self._tsme_enc is not None:
                est = {"wyzx": state["tsmeenc_wyzx"],
                       "jwx_hist": state["tsmeenc_jwx_hist"]}
                est2, left, right = self._tsme_enc.encode(
                    est, dry[0], dry[1], dry[2], dry[3], T)
                new_state.update({f"tsmeenc_{k}": v for k, v in est2.items()})
            else:
                left, right, enc2 = uhj_ops.tsme_encode_iir(
                    dry[0], dry[1], dry[2], dry[3],
                    {k: state[k] for k in uhj_ops.tsme_encoder_iir_state()}, T)
                new_state.update(enc2)
            out = jnp.stack([left, right])
            if out_real_extra is not None:
                out = out + out_real_extra
            return out, new_state, new_ev
        if self._dec_lf is not None:
            hp, lp, sp_state = self._splitter.split(dry, state["split_state"])
            new_state["split_state"] = sp_state
            out = (jnp.einsum("cd,dt->ct", self._dec_hf, hp,
                              precision=jax.lax.Precision.HIGHEST)
                   + jnp.einsum("cd,dt->ct", self._dec_lf, lp,
                                precision=jax.lax.Precision.HIGHEST))
        elif self._dec_hf is not None:
            out = jnp.einsum("cd,dt->ct", self._dec_hf, dry,
                             precision=jax.lax.Precision.HIGHEST)
        else:
            out = dry  # Ambi3D output: the dry bus is the output
        if self._stab is not None:
            out, new_state = self._stabilize(out, state, new_state, T)
        if out_real_extra is not None:
            out = out + out_real_extra
        return out, new_state, new_ev

    def _stabilize(self, out, state, new_state, T: int):
        """Front-image stabilization (alu.cpp:329-405) on the decoded out.

        The direct (real-out prefill) mid/side terms are zero here — this
        renderer has no direct-channel pre-mix — but their all-pass state
        slots still evolve like the reference's (zeros through the L slot,
        side through the R slot)."""
        li, ri, ci = self._stab["idx"]
        coeff = jnp.float32(self._stab["coeff"])
        left, right = out[li], out[ri]
        side = left - right
        mid = left + right
        hf, lf, mid_st = f_ops.band_split(mid[None], state["stab_mid"], coeff)
        new_state["stab_mid"] = mid_st
        # All-pass every channel: L slot carries the (zero) direct mid,
        # R slot carries the side signal, others their decoded output.
        ap_in = out.at[li].set(0.0).at[ri].set(side)
        ap_out, ap_z = f_ops.all_pass(ap_in, state["stab_ap"], coeff)
        new_state["stab_ap"] = ap_z
        c_pi_3 = jnp.float32(np.cos(1.0 / 3.0 * (np.pi * 0.5)))
        c_pi_4 = jnp.float32(np.cos(1.0 / 4.0 * (np.pi * 0.5)))
        s_pi_3 = jnp.float32(np.sin(1.0 / 3.0 * (np.pi * 0.5)))
        s_pi_4 = jnp.float32(np.sin(1.0 / 4.0 * (np.pi * 0.5)))
        m = lf[0] * c_pi_3 + hf[0] * c_pi_4 + ap_out[li]
        c = lf[0] * s_pi_3 + hf[0] * s_pi_4
        s = ap_out[ri]
        out = ap_out.at[li].set((m + s) * 0.5)
        out = out.at[ri].set((m - s) * 0.5)
        out = out.at[ci].add(c * 0.5)
        return out, new_state

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8, 9),
                       donate_argnums=(1, 2))
    def _render_chunk(self, state: dict, ev: dict, cfg: dict, pool: jax.Array,
                      T: int, n_blocks: int, taps: int, chain: tuple,
                      rs_plan: tuple | None = None):
        """n_blocks consecutive blocks in one dispatch via lax.scan.

        Amortizes dispatch/transfer overhead when the host has no pending
        events for the whole horizon (the analog of the reference's RT
        thread running freely between property updates).  The carried
        state/ev pytrees are donated: the evolved copies reuse the input
        buffers in place (no per-dispatch state reallocation; the host
        rebinds its handles to the outputs immediately)."""
        reset = cfg["reset_rows"]
        state = dict(state)
        state["filter_z"] = jnp.where(reset[:, None, None], 0.0,
                                      state["filter_z"])
        if "hrtf_history" in state:
            state["hrtf_history"] = jnp.where(reset[:, None], 0.0,
                                              state["hrtf_history"])
        if "send_filter_z" in state:
            state["send_filter_z"] = jnp.where(reset[:, None, None, None], 0.0,
                                               state["send_filter_z"])
        if "nfc_z" in state:
            state["nfc_z"] = jnp.where(reset[:, None], 0.0, state["nfc_z"])
        # chain keys the jit cache (slot set traced via self); its
        # "gate:" entries statically prune stages inside _render_one.
        gates = tuple(g for g in chain
                      if isinstance(g, str) and g.startswith("gate:"))
        if n_blocks == 1:
            out, state, ev = self._render_one(state, ev, cfg, pool, T, taps,
                                              rs_plan, gates=gates)
            return out[None], state, ev

        unit_sb = rs_plan[1] if (rs_plan is not None and rs_plan[0] == "unit"
                                 and len(rs_plan) > 1) else 1
        gen_sb = rs_plan[3] if (rs_plan is not None and rs_plan[0] == "gen"
                                and len(rs_plan) > 3) else 1
        gen3_sb = rs_plan[1] if (rs_plan is not None
                                 and rs_plan[0] == "gen3") else 1
        sb = max(unit_sb, gen_sb, gen3_sb)
        sb_f = sb
        if sb_f <= 1 and rs_plan is None:
            # The jnp gather resampler is window-size-agnostic (per-sample
            # modular index resolution), so the fused path below also runs
            # on the non-Pallas graph — any pitch, any loop length.
            sb_f = next((c for c in self._RS_SUPER_BLOCKS
                         if n_blocks % c == 0 and n_blocks >= c), 1)
        fused_hrtf = (sb_f > 1 and n_blocks % sb_f == 0
                      and "gate:nofilt" in gates
                      and (not self.slots or "gate:nosendfilt" in gates)
                      and self.layout.mode == panning.RenderMode.HRTF
                      and self.nfc is None and self._uhj_pad() == 0)
        if fused_hrtf:
            # Fused super-block HRTF path (PROFILE.md "multi-block HRTF
            # contraction"): with filters and UHJ statically pruned, a whole
            # super-block reduces to ONE resample kernel + ONE
            # [V,192,2]x[V,HIST+sb*T] MXU contraction + skew-sum + fold.
            # With effect slots attached the wet buses also mix at
            # super-block width (one grouped contraction per send); only the
            # effect pipelines themselves stay per-block (their delay rings
            # are sized for BufferLineSize writes).  Correct for fades too:
            # every ramp (HRIR crossfade, dry/wet gains) spans the first
            # fade_len samples of the window and holds after — exactly the
            # per-block evolution, since fades only enter nonzero on the
            # first block after a cfg upload.
            W = sb_f * T
            pool2d = pool.reshape(-1, 128)
            fade_len = min(GAIN_FADE_SAMPLES, T)
            no_dry = "gate:nodry" in gates
            n_slots = len(self.slots)

            def outer_f(carry, _):
                st, e = carry
                if unit_sb > 1:
                    x_all = self._unit_resample(pool2d, cfg, e, W, taps,
                                                rs_plan)
                elif gen3_sb > 1:
                    x_all = self._gen3_resample(pool2d, cfg, e, W, taps,
                                                rs_plan)
                elif gen_sb > 1:
                    x_all = rs_pallas.resample_voices_pallas2(
                        pool2d, cfg["src_off"], cfg["src_len"],
                        cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                        e["has_wrapped"], e["pos_int"], e["pos_frac"],
                        cfg["increment"], cfg["bank_row"], cfg["sf"],
                        self._bank_pad, W, taps, rs_plan[1], rs_plan[2])
                else:
                    x_all = rs_ops.resample_voices(
                        pool, cfg["src_off"], cfg["src_len"],
                        cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                        e["has_wrapped"], e["pos_int"], e["pos_frac"],
                        cfg["increment"], cfg["bank_row"], cfg["sf"],
                        self._bank, W, taps)
                # No active-mask on x_all: the HRTF contraction folds the
                # active mask into the gain column, inactive rows' history
                # garbage is cleared by the reset mask at (re)activation,
                # and the mix contractions see zero gains for inactive rows
                # (their samples are finite by kernel construction).
                st2 = dict(st)
                e2 = dict(e)
                g_eff = jnp.where(cfg["playing"], cfg["hrtf_gain"], 0.0)
                y_ext = hrtf_mix.hrtf_voices_accum_split(
                    st["hrtf_history"], x_all, cfg["hrtf_coeffs"],
                    cfg["hrtf_delay"], g_eff, cfg["hrtf_old_coeffs"],
                    cfg["hrtf_old_delay"], cfg["hrtf_old_gain"], e["fade"],
                    cfg["active"], W, fade_len)

                contrib_w = None
                extra_w = None
                if n_slots:
                    # Wet buses at super-block width; send filters are
                    # statically inactive (fused gate), so their memories
                    # stay cleared and the interp schedules converged.
                    B = self.wet_channels
                    wet_bus = jnp.zeros((n_slots, B, W), jnp.float32)
                    new_sendz, new_scf, new_scnt = [], [], []
                    for snd in range(self.num_aux_sends):
                        new_sendz.append(
                            jnp.zeros_like(st["send_filter_z"][:, snd]))
                        new_scf.append(cfg["send_filter_target"][:, snd])
                        new_scnt.append(jnp.zeros_like(
                            e["send_filter_counter"][:, snd]))
                        group = jnp.where(cfg["wet_active"][:, snd],
                                          cfg["wet_slot"][:, snd], n_slots)
                        wet_tgt = jnp.where(cfg["playing"][:, None],
                                            cfg["wet_tgt"][:, snd, :B], 0.0)
                        bus_s, wet_cur2 = mix_ops.mix_voices_grouped(
                            x_all, e["wet_cur"][:, snd, :B], wet_tgt,
                            e["fade"], group, n_slots + 1, fade_len)
                        wet_bus = wet_bus + bus_s[:n_slots]
                        e2["wet_cur"] = e2["wet_cur"].at[:, snd, :B].set(
                            wet_cur2)
                    st2["send_filter_z"] = jnp.stack(new_sendz, axis=1)
                    e2["send_filter_coeffs"] = jnp.stack(new_scf, axis=1)
                    e2["send_filter_counter"] = jnp.stack(new_scnt, axis=1)

                    # Effect pipelines at the widest window their delay
                    # rings allow (whole super-block for reverb), falling
                    # back to an inner per-sub-window scan otherwise.
                    Tw = W
                    for slot in self.slots:
                        mw = slot.state.max_window()
                        while Tw > mw or W % Tw:
                            Tw //= 2
                    Tw = max(Tw, T)

                    def slot_body(sst, b):
                        wet_b = jax.lax.dynamic_slice_in_dim(
                            wet_bus, b * Tw, Tw, axis=2)
                        contrib = jnp.zeros((self.n_dry, Tw), jnp.float32)
                        extra = jnp.zeros((2, Tw), jnp.float32)
                        sst2 = {}
                        for i, slot in enumerate(self.slots):
                            cb, rb_, sst2[f"slot{i}"] = slot.state.process(
                                sst[f"slot{i}"], cfg[f"slot{i}"],
                                wet_b[i], Tw)
                            contrib = contrib + cb
                            if rb_ is not None:
                                extra = extra + rb_
                        return sst2, (contrib, extra)

                    sst0 = {f"slot{i}": st[f"slot{i}"]
                            for i in range(n_slots)}
                    if Tw == W:
                        sst2, (contrib_w, extra_w) = slot_body(sst0, 0)
                        st2.update(sst2)
                    else:
                        sst2, (contribs, extras) = jax.lax.scan(
                            slot_body, sst0, jnp.arange(W // Tw))
                        st2.update(sst2)
                        contrib_w = contribs.swapaxes(0, 1).reshape(
                            self.n_dry, W)
                        extra_w = extras.swapaxes(0, 1).reshape(2, W)

                if no_dry:
                    e2["dry_cur"] = jnp.where(cfg["playing"][:, None],
                                              cfg["dry_tgt"], 0.0)
                else:
                    dry_tgt = jnp.where(cfg["playing"][:, None],
                                        cfg["dry_tgt"], 0.0)
                    dry, dry_cur2 = mix_ops.mix_voices(
                        x_all, e["dry_cur"], dry_tgt, e["fade"], fade_len)
                    e2["dry_cur"] = dry_cur2
                    if contrib_w is not None:
                        dry = dry + contrib_w
                    scaled, sp2 = self._hrtf_splitter.hf_scale(
                        dry, st["direct_split"], self._direct_hf_scales)
                    st2["direct_split"] = sp2
                    y_ext = y_ext + hrtf_mix.direct_hrtf_accum(
                        scaled, self._direct_coeffs, W)

                out_sb, new_tail = hrtf_mix.fold_accum(
                    y_ext, st["hrtf_tail"], W)
                if extra_w is not None:
                    out_sb = out_sb + extra_w
                st2["hrtf_history"] = x_all[:, W - hrtf_mix.HIST:]
                st2["hrtf_tail"] = new_tail
                st2["filter_z"] = jnp.zeros_like(st["filter_z"])
                pi2, pf2 = rs_ops.advance_positions(
                    e["pos_int"], e["pos_frac"], cfg["increment"],
                    jnp.int32(W))
                ll = jnp.maximum(cfg["loop_end"] - cfg["loop_start"], 1)
                rebase = cfg["has_loop"] & (pi2 >= cfg["loop_end"])
                pi2 = jnp.where(
                    rebase,
                    cfg["loop_start"] + (pi2 - cfg["loop_start"]) % ll, pi2)
                e2["pos_int"], e2["pos_frac"] = pi2, pf2
                e2["has_wrapped"] = e["has_wrapped"] | rebase
                e2["filter_coeffs"] = cfg["filter_target"]
                e2["filter_counter"] = jnp.zeros_like(e["filter_counter"])
                e2["fade"] = jnp.zeros_like(e["fade"])
                outs = out_sb.reshape(out_sb.shape[0], sb_f, T).swapaxes(0, 1)
                return (st2, e2), outs

            (state, ev), outs = jax.lax.scan(outer_f, (state, ev), None,
                                             length=n_blocks // sb_f)
            return outs.reshape((n_blocks,) + outs.shape[2:]), state, ev
        if sb > 1 and n_blocks % sb == 0:
            # Super-block resampling (PROFILE.md roadmap): per-voice scalar
            # geometry + span-DMA issue dominate the resample kernels, so
            # amortize — ONE kernel call covers sb consecutive blocks'
            # OUTPUT samples (output-indexed, so per-block slices are exact
            # at any pitch; loop seams stay single per kernel row by the
            # plan's span/loop bounds), and each block consumes its slice.
            pad = self._uhj_pad()
            T_sb = sb * T + pad
            pool2d = pool.reshape(-1, 128)

            def outer(carry, _):
                st, e = carry
                if unit_sb > 1:
                    x_all = self._unit_resample(pool2d, cfg, e, T_sb, taps,
                                                rs_plan)
                elif gen3_sb > 1:
                    x_all = self._gen3_resample(pool2d, cfg, e, T_sb, taps,
                                                rs_plan)
                else:
                    x_all = rs_pallas.resample_voices_pallas2(
                        pool2d, cfg["src_off"], cfg["src_len"],
                        cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                        e["has_wrapped"], e["pos_int"], e["pos_frac"],
                        cfg["increment"], cfg["bank_row"], cfg["sf"],
                        self._bank_pad, T_sb, taps, rs_plan[1], rs_plan[2])

                def inner(c2, b):
                    st2, e2 = c2
                    x_b = jax.lax.dynamic_slice_in_dim(x_all, b * T, T + pad,
                                                       axis=1)
                    out, st2, e2 = self._render_one(
                        st2, e2, cfg, pool, T, taps, rs_plan, x_pre=x_b,
                        gates=gates)
                    return (st2, e2), out

                (st, e), outs = jax.lax.scan(inner, (st, e),
                                             jnp.arange(sb))
                return (st, e), outs

            (state, ev), outs = jax.lax.scan(outer, (state, ev), None,
                                             length=n_blocks // sb)
            return outs.reshape((n_blocks,) + outs.shape[2:]), state, ev

        def body(carry, _):
            st, e = carry
            out, st, e = self._render_one(st, e, cfg, pool, T, taps,
                                          rs_plan, gates=gates)
            return (st, e), out

        (state, ev), outs = jax.lax.scan(body, (state, ev), None,
                                         length=n_blocks)
        return outs, state, ev

    def _biquad(self, x, z, cf, tgt, cnt, T: int):
        """Voice-channel dual biquad: Pallas (TPU, exact reference TDF2 op
        order) or the chunk-parallel XLA form (CPU/test reference)."""
        if self._pallas_ok and x.shape[0] % 1024 == 0 and T % 256 == 0:
            return biq_pallas.biquad_dual_interp_pallas(x, z, cf, tgt, cnt)
        return f_ops.biquad_dual_interp_chunked(x, z, cf, tgt, cnt)

    def _uhj_active(self) -> bool:
        return any(self._uhj_groups.values())

    def _uhj_tier(self, kind: str) -> str:
        """Decode quality for a voice kind: Super Stereo voices use the
        TSME decoder when the device output is TSME (core/voice.cpp:1232),
        the UHJ stereo decoder otherwise; UHJ2/3/4 always the UHJ tier."""
        if kind == "ss" and self.layout.tsme_output:
            return self._tsme_dec_q
        return self._uhj_dec_q

    def _uhj_pad(self) -> int:
        """Resample look-ahead for the active decode tiers (the decoder
        input padding, uhjfilter.h:111; rounded to the 128-sample kernel
        grain)."""
        pad = 0
        for kind in ("u2", "u3", "u4", "ss"):
            if self._uhj_groups[kind]:
                pad = max(pad,
                          256 if self._uhj_tier(kind) == "fir512" else 128)
        return pad

    def _uhj_decode(self, x: jax.Array, state: dict, cfg: dict, T: int,
                    axis_name: str | None = None):
        """UHJ / Super Stereo source decode (core/voice.cpp:989-995).

        Voices' L/R(/T/Q) rows are gathered from the resampled population
        with one-hot MXU contractions (no gathers), decoded batched with the
        default IIR quality tier (ops/uhj.py; the FIR tiers exist for the
        uhj-decode-quality config), LF-shelved for UHJ2/SuperStereo
        (Voice::prepare, core/voice.cpp:1290-1317), and scattered back over
        their rows as W/X/Y(/Z).
        """
        if not self._uhj_active():
            return x[:, :T] if x.shape[1] != T else x, {}
        hi = jax.lax.Precision.HIGHEST
        new_state: dict = {}
        x_out = x[:, :T]
        scale_rows = []
        for kind, C, n_in in (("u2", 3, 2), ("u3", 3, 3), ("u4", 4, 4),
                              ("ss", 3, 2)):
            n = len(self._uhj_groups[kind])
            if not n:
                continue
            G = cfg[f"uhj_g_{kind}"]                       # [n*C, L] one-hot
            chans = jnp.einsum("ul,lt->ut", G, x, precision=hi)
            if axis_name is not None:
                chans = jax.lax.psum(chans, axis_name)
            chans = chans.reshape(n, C, x.shape[1])
            tier = self._uhj_tier(kind)
            fnames = [f for f, _ in self._uhj_state_spec(kind)]
            st = {f: state[f"uhj_{kind}_{f}"] for f in fnames}
            # TSME output devices decode Super Stereo with the reversed
            # phase-shift convention (core/voice.cpp:1232-1251).
            jsgn = -1.0 if (kind == "ss" and self.layout.tsme_output) else 1.0
            if tier == "iir":
                if kind == "ss":
                    dec, st2 = uhj_ops.super_stereo_decode_iir(
                        chans, st, cfg["uhj_width"], T, j_sign=jsgn)
                else:
                    dec, st2 = uhj_ops.uhj_decode_iir(chans, st, T, n_in)
            else:
                nfir = 512 if tier == "fir512" else 256
                ch = chans[:, :, :T + uhj_ops.fir_pad(nfir)]
                if kind == "ss":
                    dec, dh, sh = uhj_ops.super_stereo_decode(
                        ch, st["dt_hist"], st["s_hist"], cfg["uhj_width"],
                        T, nfir, j_sign=jsgn)
                else:
                    dec, dh, sh = uhj_ops.uhj_decode(
                        ch, st["dt_hist"], st["s_hist"], T, n_in, nfir)
                st2 = {"dt_hist": dh, "s_hist": sh}
            for f in fnames:
                new_state[f"uhj_{kind}_{f}"] = st2[f]
            if kind == "u2":
                # Only FmtUHJ2 gets the quad-decode LF shelving
                # (core/voice.cpp:1288-1317); SuperStereo does not.
                scale_rows.append((kind, n, dec))
            else:
                flat = dec.reshape(n * C, T)
                mask = jnp.sum(G, axis=0)                  # [L] 1 on our rows
                x_out = x_out * (1.0 - mask[:, None]) + jnp.einsum(
                    "ul,ut->lt", G, flat, precision=hi)
        if scale_rows:
            # UHJ2 LF shelving (sWLFScale/sXYLFScale).
            cat = jnp.concatenate([d.reshape(-1, T) for _, _, d in scale_rows])
            lf = jnp.concatenate([
                jnp.tile(jnp.asarray([0.661, 1.293, 1.293], jnp.float32), n)
                for _, n, _ in scale_rows])
            scaled, sp2 = self._uhj_splitter.scale(
                cat, state["uhj_split"], jnp.float32(1.0), lf[:, None])
            new_state["uhj_split"] = sp2
            off = 0
            for kind, n, _ in scale_rows:
                G = cfg[f"uhj_g_{kind}"]
                flat = scaled[off:off + n * 3]
                off += n * 3
                mask = jnp.sum(G, axis=0)
                x_out = x_out * (1.0 - mask[:, None]) + jnp.einsum(
                    "ul,ut->lt", G, flat, precision=hi)
        return x_out, new_state

    def _uhj_filters(self, kind: str) -> tuple:
        """IIR decode field names (back-compat; see _uhj_state_spec)."""
        base = ("f2dt", "f1s", "f1dt", "f2s")
        return base + ("f1q",) if kind == "u4" else base

    def _uhj_state_spec(self, kind: str) -> list:
        """(field, per-voice shape) list for the kind's decode tier."""
        tier = self._uhj_tier(kind)
        if tier == "iir":
            base = [("f2dt", (4, 2)), ("f1s", (4, 2)), ("f1dt", (4, 2)),
                    ("f2s", (4, 2))]
            if kind == "u4":
                base.append(("f1q", (4, 2)))
            return base
        n = 512 if tier == "fir512" else 256
        h = uhj_ops.fir_hist(n)
        return [("dt_hist", (h,)), ("s_hist", (h,))]

    def _refresh_uhj_groups(self) -> None:
        """Rebuild UHJ voice groups + carried decode state on voice churn."""
        from .devformat import FmtChannels as FC

        kinds = {FC.UHJ2: "u2", FC.UHJ3: "u3", FC.UHJ4: "u4",
                 FC.SUPER_STEREO: "ss"}
        groups = {"u2": [], "u3": [], "u4": [], "ss": []}
        for ctx in self.contexts:
            for v in ctx.voices:
                k = kinds.get(v.fmt_channels)
                if k and v.rows and v.state in (PlayState.PLAYING,
                                                PlayState.STOPPING):
                    groups[k].append(v)
        old = self._uhj_groups
        if all([id(v) for v in old[k]] == [id(v) for v in groups[k]]
               for k in groups):
            return
        # Remap carried decode states by voice identity (shape per tier).
        for k in groups:
            n_new = len(groups[k])
            for f, shape in self._uhj_state_spec(k):
                name = f"uhj_{k}_{f}"
                old_arr = (np.asarray(self._state[name])
                           if name in self._state else None)
                if not n_new:
                    self._state.pop(name, None)
                    continue
                arr = np.zeros((n_new,) + shape, f32)
                for i, v in enumerate(groups[k]):
                    if v in old[k] and old_arr is not None:
                        arr[i] = old_arr[old[k].index(v)]
                self._state[name] = jnp.asarray(arr)
        n_split_new = 3 * len(groups["u2"])
        if n_split_new:
            old_split = (np.asarray(self._state["uhj_split"])
                         if "uhj_split" in self._state else None)
            arr = np.zeros((n_split_new, 3), f32)
            oldv = old["u2"]
            for i, v in enumerate(groups["u2"]):
                if v in oldv and old_split is not None:
                    j = oldv.index(v)
                    arr[3 * i:3 * i + 3] = old_split[3 * j:3 * j + 3]
            self._state["uhj_split"] = jnp.asarray(arr)
        else:
            self._state.pop("uhj_split", None)
        self._uhj_groups = groups

    def _uhj_cfg(self, cfg: dict) -> None:
        """One-hot gather matrices + widths for the active UHJ groups."""
        L = self.capacity
        for kind, C in (("u2", 3), ("u3", 3), ("u4", 4), ("ss", 3)):
            voices = self._uhj_groups[kind]
            if not voices:
                continue
            G = np.zeros((len(voices) * C, L), f32)
            for i, v in enumerate(voices):
                for c, r in enumerate(v.rows[:C]):
                    G[i * C + c, r] = 1.0
            cfg[f"uhj_g_{kind}"] = jnp.asarray(G)
        if self._uhj_groups["ss"]:
            cfg["uhj_width"] = jnp.asarray(np.array(
                [min(v.props.enh_width, 0.7) for v in self._uhj_groups["ss"]],
                f32))

    # --- the render loop ---

    def render_samples(self, num_frames: int) -> np.ndarray:
        """Render num_frames (alcRenderSamplesSOFT, alc/alc.cpp:3498).

        Returns interleaved samples [num_frames, n_real] in the device
        sample type.  Arbitrary counts are served: the device graph renders
        in 128-frame granularity (the kernel tiling unit), and any overshoot
        is carried to the next call (the reference's mixer instead renders
        odd block sizes directly; the audio stream is identical, only the
        internal block boundaries differ).
        """
        out = np.empty((num_frames, self.n_real), f32)
        done = 0
        with self.lock:
          if self._carry is not None:
            take = min(num_frames, self._carry.shape[0])
            out[:take] = self._carry[:take]
            self._carry = self._carry[take:] if take < self._carry.shape[0] \
                else None
            done += take
          while done < num_frames:
            done += self._render_dispatch(out, done, num_frames - done)
          return self._convert_output(out)

    _CHUNK_SIZES = (512, 256, 64, 8, 1)
    _GRAIN = 128  # kernel tiling unit: filters need T%32, HRTF/echo T%128
    # Sub-chunk size for pipelined dispatch (horizons split into this many
    # blocks per executable so output downloads overlap compute).
    _PIPE_BLOCKS = 128

    def _render_dispatch(self, out: np.ndarray, done: int, remaining: int) -> int:
        if self._cpu_fallback:
            with jax.default_device(self._cpu_dev):
                return self._render_dispatch_inner(out, done, remaining)
        return self._render_dispatch_inner(out, done, remaining)

    def _render_dispatch_inner(self, out: np.ndarray, done: int,
                               remaining: int) -> int:
        for ctx in self.contexts:
            ctx.process_updates()

        # Choose the dispatch horizon: the largest precompiled chunk that
        # fits both the request and the next host-visible event.  T rounds
        # up to the kernel granularity (128, or an effect's inner chunk
        # size); overshoot goes to carry.
        grain = self._GRAIN
        for slot in self.slots:
            grain = max(grain, getattr(slot.state, "granularity", 128))
        T = min(-(-remaining // grain) * grain, BUFFER_LINE_SIZE)
        n_blocks = 1
        if T == BUFFER_LINE_SIZE:
            horizon = min(remaining // T,
                          min((ctx.event_horizon_blocks(T) for ctx in self.contexts),
                              default=1 << 30))
            for size in self._CHUNK_SIZES:
                if size <= horizon:
                    n_blocks = size
                    break

        if self._cfg_dev is None:
            # The config (and possibly the evolving fields) re-upload from
            # the host table: every context's row mirror must be current.
            # Contexts skip the pack in steady state (see process_updates),
            # so sync any that did not pack this round.
            for ctx in self.contexts:
                if not ctx._packed_this_update:
                    ctx._pack_block_fields(BUFFER_LINE_SIZE)
                    ctx._packed_this_update = True
        if self._cfg_dev is None:
            self._refresh_uhj_groups()
            cfg = self._cfg_from_table()
            self._uhj_cfg(cfg)
            mask = self._pending_resets_mask()
            self._cfg_has_resets = bool(mask.any())   # host-known, no readback
            cfg["reset_rows"] = jnp.asarray(mask)
            for i, slot in enumerate(self.slots):
                cfg[f"slot{i}"] = {k: jnp.asarray(v)
                                   for k, v in slot.compute_update().items()}
            self._cfg_dev = cfg
            # Evolving fields changed with the config (every host-side write
            # to an _EVOLVING field coincides with mark_config_dirty); in
            # steady state the device's own evolved copy is bit-identical to
            # the host mirror, so nothing is uploaded.
            self._ev_dev = None
        ev = (self._ev_dev if self._ev_dev is not None
              else self.table.evolving_dict())

        # Pipeline the dispatch: a long horizon splits into sub-chunks whose
        # device→host output copies start as soon as each sub-chunk's
        # executable finishes, overlapping the next sub-chunk's compute —
        # the axon tunnel's ~30 ms latency / ~40 MB/s bandwidth would
        # otherwise serialize behind the whole horizon's compute.  The
        # host-side bookkeeping (process_updates / finish_chunk) stays
        # per-horizon: the event-horizon guarantee covers every sub-chunk.
        pipe = self._PIPE_BLOCKS
        subs = ([n_blocks] if n_blocks <= pipe
                else [pipe] * (n_blocks // pipe))
        bookkept = False
        try:
            pend = []
            for i, nb in enumerate(subs):
                # The render step donates (state, ev); a buffer appearing at
                # two leaves (a shared zeros init, or XLA aliasing two
                # identical outputs into one buffer) would be an invalid
                # double-donation.
                self._state = _dedupe_buffers(self._state)
                ev = _dedupe_buffers(ev)
                blocks, self._state, ev = self._render_chunk(
                    self._state, ev, self._cfg_dev,
                    self.pool.device_array(), T, nb, self._taps,
                    self._chain_signature(), self._rs_plan(T, nb))
                try:
                    blocks.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
                pend.append(blocks)
                if i == 0 and self._cfg_has_resets:
                    # Reset mask consumed by the first sub-chunk; later ones
                    # must not re-clear the evolved row state.  Swap just the
                    # mask leaf (shapes unchanged: no retrace, no rebuild).
                    cfg2 = dict(self._cfg_dev)
                    cfg2["reset_rows"] = jnp.zeros_like(cfg2["reset_rows"])
                    self._cfg_dev = cfg2
                    self._cfg_has_resets = False
            self._ev_dev = ev
            # Host bookkeeping overlaps the in-flight device work: the
            # mirror advance (finish_chunk) does not read the outputs.
            # Snapshot the horizon-start mirror first — the CPU-fallback
            # re-render needs it if a download below fails.
            mirror_snap = {k: np.copy(getattr(self.table, k))
                           for k in ParamTable._EVOLVING}
            for ctx in self.contexts:
                ctx.finish_chunk(T, n_blocks)
            self._clock_samples += n_blocks * T
            bookkept = True
            arrs = [np.asarray(jax.device_get(b)) for b in pend]
            arr = (np.concatenate(arrs) if len(arrs) > 1
                   else arrs[0])                           # [n_blocks, C, T]
        except jax.errors.JaxRuntimeError as e:
            # Accelerator failure mid-render (the alu.cpp:2499 disconnect
            # analog): migrate the device state to XLA:CPU and re-render
            # this dispatch there.  One-way: the device stays on CPU.
            if self._cpu_fallback:
                raise
            log.err("accelerator error, falling back to CPU render: %s",
                    str(e).splitlines()[0] if str(e) else e)
            self._migrate_to_cpu()
            # The dead device's evolved copy is unreachable; the host
            # mirror is bit-identical by design, so re-render the whole
            # horizon from its start — the live table if bookkeeping has
            # not run yet, the pre-advance snapshot if it has.
            if bookkept:
                ev = {k: jnp.asarray(v) for k, v in mirror_snap.items()}
                ev["filter_counter"] = jnp.maximum(ev["filter_counter"], 0)
            else:
                ev = self.table.evolving_dict()
            with jax.default_device(self._cpu_dev):
                blocks, self._state, self._ev_dev = self._render_chunk(
                    self._state, ev, self._cfg_dev,
                    self.pool.device_array(), T, n_blocks, self._taps,
                    self._chain_signature(), self._rs_plan(T, n_blocks))
                arr = np.asarray(jax.device_get(blocks))
        frames = n_blocks * T
        flat = arr.transpose(0, 2, 1).reshape(frames, -1)
        served = min(frames, remaining)
        out[done:done + served] = flat[:served]
        if served < frames:
            self._carry = flat[served:].copy()

        if self._cfg_has_resets:
            self._cfg_dev = None  # reset mask consumed; rebuild next time

        if not bookkept:   # CPU-fallback re-render path
            for ctx in self.contexts:
                ctx.finish_chunk(T, n_blocks)
            self._clock_samples += frames
        return served

    def _cfg_from_table(self) -> dict:
        """Upload the host ParamTable as the device config dict.

        nfc_w0 materializes on the host into per-row filter coefficients
        (NfcFilterAdjust, nfc.cpp:75-222); -1 rows get the create-state
        identity filter."""
        cfg = {k: jnp.asarray(getattr(self.table, k))
               for k in ParamTable._CONFIG
               if k not in ("nfc_w0",)}
        if self._pallas_ok:
            # Unit-increment tap weights (constant phase per voice; valid
            # whenever the unit rs_plan is selected).
            cfg["rs_unit_w"] = jnp.asarray(rs_unit.unit_weights_np(
                self._bank, self.table.bank_row, self.table.sf,
                self.table.pos_frac, self._taps))
            # Shared-pool staging layout (regions of the active buffers
            # merged into one VMEM image) — consumed by BOTH the unit
            # kernel's shared variant and the general resampler (gen3).
            # None when the union exceeds the VMEM buckets -> per-voice-DMA
            # kernels.  The cfg keys are ALWAYS populated (size-minimal
            # placeholders when unused) so the cfg pytree structure — and
            # therefore the _render_chunk trace cache — is stable across
            # layout flips.
            t = self.table
            pool_rows = self.pool._host.size // 128
            lay = rs_unit.shared_layout(
                t.src_off, t.src_len, t.loop_start, t.loop_end,
                t.has_loop, t.active, self._taps, pool_rows)
            if lay is not None:
                chunks, off_vmem, n256, n64, vrows = lay
                cfg["rs_shared_chunks"] = jnp.asarray(chunks)
                cfg["rs_off_vmem"] = jnp.asarray(off_vmem)
                self._rs_shared = (n256, n64, vrows, pool_rows)
            else:
                cfg["rs_shared_chunks"] = jnp.zeros(2, jnp.int32)
                cfg["rs_off_vmem"] = jnp.zeros(self.capacity, jnp.int32)
                self._rs_shared = None
        if self.nfc is not None:
            w0 = self.table.nfc_w0
            cf = self.nfc.adjust(np.maximum(w0, 0.0))
            ident = self.nfc.identity_coeffs(1)
            cfg["nfc_coeffs"] = jnp.asarray(
                np.where((w0 < 0.0)[:, None], ident, cf))
        return cfg

    def _migrate_to_cpu(self) -> None:
        """Move all device-resident state to XLA:CPU after an accelerator
        failure; caches derived from the dead device are dropped (config,
        evolved copies, pool upload, FFT spectra)."""
        self._cpu_fallback = True
        self._cpu_dev = jax.devices("cpu")[0]
        self._pallas_ok = False
        try:
            host_state = jax.device_get(self._state)
        except Exception:
            # The carried state was donated into the failed dispatch (or
            # lives on the dead accelerator): unreadable either way.
            # Reinitialize the stream-continuity state (filter memories,
            # HRTF history/tails, effect lines) — one glitch at the failure
            # instant, matching the reference's device-disconnect behavior.
            host_state = None
            log.err("carried render state unreachable; reinitializing")
        if host_state is not None:
            self._state = jax.device_put(host_state, self._cpu_dev)
        else:
            with jax.default_device(self._cpu_dev):
                st = self._init_state()
                for i, slot in enumerate(self.slots):
                    st[f"slot{i}"] = slot.state.device_update()
                for k, voices in self._uhj_groups.items():
                    nv_ = len(voices)
                    if not nv_:
                        continue
                    for f, shape in self._uhj_state_spec(k):
                        st[f"uhj_{k}_{f}"] = jnp.zeros((nv_,) + shape, f32)
                    if k == "u2":
                        st["uhj_split"] = jnp.zeros((3 * nv_, 3), f32)
                self._state = st
        self._cfg_dev = None
        self._ev_dev = None
        self.pool._device = None
        self.pool._dirty = True
        # The jit caches re-trace per device placement; with the config
        # rebuilt under default_device(cpu) every input lands on the CPU.
        with jax.default_device(self._cpu_dev):
            cfg = self._cfg_from_table()
            self._uhj_cfg(cfg)
            cfg["reset_rows"] = jnp.asarray(np.zeros(self.capacity, bool))
            for i, slot in enumerate(self.slots):
                cfg[f"slot{i}"] = {k: jnp.asarray(v)
                                   for k, v in slot.compute_update().items()}
            self._cfg_dev = cfg

    # --- checkpoint / resume (SURVEY §5: the carried-state pytree IS the
    # checkpoint; serialize per block for bit-exact resume) ---------------

    def snapshot(self) -> dict:
        """Serializable checkpoint of all render state at a block boundary.

        Captures the device-resident state pytree (filter z's, HRTF
        history/tail, effect delay lines), the evolving param mirror, the
        full SoA table, the rendered-ahead carry, and the device clock.
        Host object graphs (sources/buffers) are the app's to reconstruct;
        restoring into an identically-configured device continues the
        stream bit-exactly (tests/test_checkpoint.py)."""
        with self.lock:
            ev = (self._ev_dev if self._ev_dev is not None
                  else self.table.evolving_dict())
            return {
                "state": jax.tree.map(np.asarray, self._state),
                "ev": {k: np.asarray(v) for k, v in ev.items()},
                "table": {k: np.asarray(getattr(self.table, k)).copy()
                          for k in ParamTable._FIELDS},
                "carry": None if self._carry is None else self._carry.copy(),
                "clock": self._clock_samples,
            }

    def restore(self, snap: dict) -> None:
        """Restore a snapshot() into this (identically configured) device."""
        with self.lock:
            for k, v in snap["table"].items():
                getattr(self.table, k)[...] = v
            self._state = jax.tree.map(jnp.asarray, snap["state"])
            self._ev_dev = {k: jnp.asarray(v) for k, v in snap["ev"].items()}
            self._carry = (None if snap["carry"] is None
                           else snap["carry"].copy())
            self._clock_samples = snap["clock"]
            self._cfg_dev = None

    def handle_disconnect(self, msg: str = "") -> None:
        """Backend/device loss (doDisconnect, alc/alu.cpp:2499-2533).

        Marks the device disconnected, posts a disconnect event to every
        context, and stops all playing voices unless a context holds them
        (AL_SOFTX_hold_on_disconnect, core/context.h:94)."""
        with self.lock:
            if not self.connected:
                return
            self.connected = False
            log.err("device disconnected: %s", msg)
            for ctx in self.contexts:
                ctx._emit("disconnected", 0, msg)
                if getattr(ctx, "hold_on_disconnect", False):
                    continue
                for v in ctx.voices:
                    if v.source_id:
                        src = ctx.sources.get(v.source_id)
                        if src is not None:
                            src.voice_ended()
                        v.source_id = 0
                    if v.state == PlayState.PLAYING:
                        v.state = PlayState.STOPPING
                        self.mark_config_dirty()

    def clock_ns(self) -> int:
        """ALC_DEVICE_CLOCK_SOFT: nanoseconds of samples rendered
        (GetClockLatency / device->getClockTime analog)."""
        return int(self._clock_samples * 1_000_000_000 // self.sample_rate)

    def clock_latency_ns(self) -> tuple[int, int]:
        """ALC_DEVICE_CLOCK_LATENCY_SOFT: (clock, latency) — the loopback
        latency is the rendered-ahead carry."""
        carry = self._carry.shape[0] if self._carry is not None else 0
        return self.clock_ns(), int(carry * 1_000_000_000
                                    // self.sample_rate)

    def mark_config_dirty(self) -> None:
        self._cfg_dev = None

    # Largest blocks-per-resample-kernel-call (VMEM-bounded: the span
    # scratch at T_sb = 16*1024 is ~4.3 MB of the ~16 MB budget).
    _RS_SUPER_BLOCKS = (16, 8, 4, 2)

    def _rs_plan(self, T: int, n_blocks: int = 1) -> tuple | None:
        """Resampler kernel plan: ("unit",), ("unit", sb), ("gen", span,
        winw), or None (jnp gather path).

        Static per dispatch: keys the jit cache, so plans only bucket-change
        when the population's pitch profile crosses a boundary.  The unit
        plan (every active voice at increment exactly 1<<16 — native-rate
        playback, the dominant real-world case) selects the gather-free
        contiguous-window kernel (ops/pallas/resample_unit.py); with a
        multi-block dispatch it upgrades to a super-block plan ("unit", sb):
        one kernel call resamples sb consecutive blocks (one span DMA +
        one geometry pass per voice per sb blocks), provided every looping
        voice's loop is long enough that at most one seam falls inside the
        sb-block window."""
        if not (self._pallas_ok and T % 128 == 0):
            return None
        t = self.table
        pad = self._uhj_pad()
        T_res = T + pad
        act = t.active
        loop_len = t.loop_end - t.loop_start
        if (self.capacity % rs_unit.NV == 0
                and bool(np.all(t.increment[act] == (1 << MIXER_FRAC_BITS_)))):
            la = t.has_loop & act
            ll_min = int(loop_len[la].min()) if bool(la.any()) else (1 << 30)
            if ll_min >= T_res + self._taps:
                # Shared-pool staging (one VMEM image, zero per-voice DMAs)
                # when the active regions fit a VMEM bucket; the statics
                # were computed alongside the current config upload.
                sh = ()
                if (self._rs_shared is not None
                        and self._rs_shared[3] == self.pool._host.size // 128
                        and self._cfg_dev is not None
                        and "rs_off_vmem" in self._cfg_dev):
                    sh = ("sh",) + self._rs_shared[:3]

                def _sh_fits(win: int) -> tuple:
                    # The shared kernel asserts K+1 <= PADMAX at trace time
                    # (K = win//128 + 1); fall back to per-voice DMAs for
                    # windows past the pad-row headroom instead of erroring.
                    return sh if (win // 128 + 2 <= rs_unit.PADMAX) else ()

                for sbc in self._RS_SUPER_BLOCKS:
                    if (n_blocks >= sbc and n_blocks % sbc == 0
                            and ll_min >= sbc * T + pad + self._taps):
                        return ("unit", sbc) + _sh_fits(sbc * T + pad)
                sh1 = _sh_fits(T_res)
                return ("unit", 1) + sh1 if sh1 else ("unit",)
        max_inc = int(t.increment.max())
        if max_inc > (10 << MIXER_FRAC_BITS_):
            return None
        if self._bank_pad is None:
            self._bank_pad = rs_pallas.pad_bank_taps(tables.weight_bank())
        la = t.has_loop & act
        ll_min = int(loop_len[la].min()) if bool(la.any()) else (1 << 30)
        # General resampler v3 (ops/pallas/resample3.py): shared-pool
        # staging + MXU one-hot window assembly.  Applies at ANY pitch
        # profile whenever the active regions fit a VMEM bucket; the
        # super-block ladder is bounded by the int32 position math, the
        # single-seam guarantee (loop_len >= window span) and the VMEM
        # footprint of the per-voice resolved images.
        if (self.capacity % rs_gen3.NV == 0 and self._rs_shared is not None
                and self._rs_shared[3] == self.pool._host.size // 128
                and self._cfg_dev is not None
                and "rs_off_vmem" in self._cfg_dev):
            bucket = next(b for b in (1 << 16, 2 << 16, 4 << 16, 10 << 16)
                          if max_inc <= b)
            n256, n64, vrows = self._rs_shared[:3]
            if self._bank_sl is None or self._bank_sl[0] != self._taps:
                self._bank_sl = (self._taps, rs_gen3.slice_bank(
                    self._bank_pad, self._taps))
            for sbc in self._RS_SUPER_BLOCKS + (1,):
                if not (n_blocks >= sbc and n_blocks % sbc == 0):
                    continue
                W = sbc * T + pad
                if (W - 1) * bucket + 65535 >= (1 << 31):
                    continue   # per-sample position math must stay int32
                wspan = (((W - 1) * bucket + 65535)
                         >> MIXER_FRAC_BITS_) + self._taps
                if ll_min < wspan:
                    continue   # multiple loop seams per window
                if rs_gen3.vmem_bytes(W, bucket, self._taps,
                                      vrows) > rs_gen3.VMEM_GATE:
                    continue
                return ("gen3", sbc, n256, n64, vrows, bucket)
        if self.capacity % rs_pallas.NV != 0:
            return None
        winw = rs_pallas.winw_for(max_inc, self._taps)
        if not bool(np.all(~t.has_loop | (loop_len >= winw))):
            return None   # sub-window loops fall back to the jnp gather path
        # Per-voice-DMA general kernel (v2) fallback: pools too large for
        # the shared VMEM image.  Multi-block windows capped at sb=2 — its
        # per-row window assembly is serial scalar work (the reason v3
        # exists), so larger windows regress.
        for sbc in (2,):
            if n_blocks >= sbc and n_blocks % sbc == 0:
                need = ((((sbc * T + pad) - rs_pallas.LANE) * max_inc)
                        >> MIXER_FRAC_BITS_) + winw + 1
                if need <= rs_pallas.SPAN_BUCKETS[-1]:
                    return ("gen",
                            rs_pallas.span_for_increment(
                                max_inc, sbc * T + pad, winw),
                            winw, sbc)
        return ("gen", rs_pallas.span_for_increment(max_inc, T_res, winw),
                winw)

    def _apply_distance_comp(self, x: np.ndarray) -> np.ndarray:
        """Per-channel delay + gain (DistanceComp::process, alu.cpp analog).

        Stateful across calls: each channel carries its last `delay` samples
        so chunked rendering matches a continuous stream."""
        delays, gains, bufs = self._dist_comp
        n = x.shape[0]
        for c in range(x.shape[1]):
            d = int(delays[c])
            if d == 0:
                if gains[c] != 1.0:
                    x[:, c] = (x[:, c] * gains[c]).astype(f32)
                continue
            col = x[:, c].copy()
            if n >= d:
                x[d:, c] = col[:n - d]
                x[:d, c] = bufs[c]
                bufs[c][:] = col[n - d:]
            else:
                x[:, c] = bufs[c][:n]
                bufs[c][:d - n] = bufs[c][n:]
                bufs[c][d - n:] = col
            x[:, c] = (x[:, c] * gains[c]).astype(f32)
        return x

    def _pending_resets_mask(self) -> np.ndarray:
        mask = np.zeros(self.capacity, bool)
        if self._pending_resets:
            mask[list(self._pending_resets)] = True
            self._pending_resets.clear()
        return mask

    def _convert_output(self, x: np.ndarray) -> np.ndarray:
        """Limiter -> dither -> Write<T> quantization (alu.cpp:2422-2438).

        The limiter and dither run in <=1024-frame blocks, matching the
        reference's renderSamples cadence, on the decoded host output."""
        if self._bs2b is not None:
            left, right = self._bs2b.cross_feed(x[:, 0], x[:, 1])
            x = np.stack([left, right], axis=1)
        if self._dist_comp is not None:
            x = self._apply_distance_comp(np.ascontiguousarray(x))
        if self._volume_scale is not None:
            x = (x * f32(self._volume_scale)).astype(f32)
        if self.limiter is not None:
            x = np.ascontiguousarray(x)
            for i in range(0, x.shape[0], BUFFER_LINE_SIZE):
                self.limiter.process(x[i:i + BUFFER_LINE_SIZE])
        if self.dither is not None:
            parts = [self.dither.apply(x[i:i + BUFFER_LINE_SIZE])
                     for i in range(0, x.shape[0], BUFFER_LINE_SIZE)]
            x = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        if self.fmt_type == DevFmtType.FLOAT:
            return x
        # SampleConv<T> (alu.cpp:2320-2346): clamp then round-nearest-even.
        if self.fmt_type == DevFmtType.SHORT:
            return np.rint(np.clip(x * f32(32768.0), -32768.0, 32767.0)
                           ).astype(np.int16)
        if self.fmt_type == DevFmtType.UBYTE:
            return (np.rint(np.clip(x * f32(128.0), -128.0, 127.0)
                            ).astype(np.int16) + 128).astype(np.uint8)
        if self.fmt_type == DevFmtType.BYTE:
            return np.rint(np.clip(x * f32(128.0), -128.0, 127.0)
                           ).astype(np.int8)
        if self.fmt_type == DevFmtType.INT:
            return np.rint(np.clip(x * f32(2147483648.0), -2147483648.0,
                                   2147483520.0)).astype(np.int64
                                                         ).astype(np.int32)
        raise NotImplementedError(self.fmt_type)
