"""The rendering context: voices, listener, and the per-block update cycle.

Host analog of ContextBase + the parameter-update half of ProcessContexts
(alc/alu.cpp:2147-2168): voice changes drain at block boundaries, dirty
voice/listener properties recompute mixing parameters, and the results are
written into the device's SoA param table.  After each block the context
mirrors the deterministic state evolution (gain ramps complete, filter
coefficients advance, positions update) so no device→host readback is
needed between blocks.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from ..constants import GAIN_FADE_SAMPLES, MIXER_FRAC_BITS, MIXER_FRAC_MASK
from ..core import context as cparams
from ..core.devformat import FmtChannels
from ..core.voice import PlayState, Voice
from ..ops import filters as f_ops
from ..core import panning

f32 = np.float32
_COEFF_EPS = f32(0.015625)  # 1/64, biquad.cpp check_set


class VChange(enum.Enum):
    RESET = "reset"
    STOP = "stop"
    PLAY = "play"
    PAUSE = "pause"
    RESTART = "restart"


@dataclasses.dataclass
class VoiceChange:
    kind: VChange
    voice: Voice | None
    old_voice: Voice | None = None
    source_id: int = 0


class Context:
    """One rendering context on a device."""

    def __init__(self, device) -> None:
        self.device = device
        device.contexts.append(self)
        self.listener = cparams.ContextProps()
        self._listener_dirty = True
        self.params = cparams.calc_context_params(self.listener)
        self.voices: list[Voice] = []
        self.voice_changes: list[VoiceChange] = []
        self.events: list[tuple] = []     # (kind, source_id, ...)
        self.sources: dict[int, object] = {}
        self.buffers: dict[int, object] = {}
        self.effects: dict[int, object] = {}
        self.filters: dict[int, object] = {}
        self.aux_slots: dict[int, object] = {}
        self.deferred = False
        self._next_id = 1

    # --- object creation ---

    def _new_id(self) -> int:
        nid = self._next_id
        self._next_id += 1
        return nid

    def create_buffer(self):
        from ..al.buffer import Buffer

        buf = Buffer(self._new_id(), self)
        self.buffers[buf.id] = buf
        return buf

    def create_source(self):
        from ..al.source import Source

        src = Source(self._new_id(), self)
        self.sources[src.id] = src
        return src

    def create_aux_slot(self):
        from ..core.effectslot import EffectSlot

        slot = EffectSlot(self._new_id(), self)
        self.aux_slots[slot.id] = slot
        return slot

    def create_effect(self, effect_type: str = "null"):
        from ..al.effect import Effect

        eff = Effect(self._new_id(), effect_type)
        self.effects[eff.id] = eff
        return eff

    def create_filter(self, filter_type: str = "null"):
        from ..al.filter import Filter

        flt = Filter(self._new_id(), filter_type)
        self.filters[flt.id] = flt
        return flt

    # --- API-side entry points ---

    def new_voice(self) -> Voice:
        v = Voice()
        self.voices.append(v)
        return v

    def queue_change(self, change: VoiceChange) -> None:
        self.voice_changes.append(change)

    def listener_dirty(self) -> None:
        self._listener_dirty = True

    # --- block-boundary processing (mixer-thread side in the reference) ---

    def process_updates(self, block_len: int = 1024) -> None:
        self._process_voice_changes()
        if self.deferred:
            return
        force = self._listener_dirty
        if force:
            self.params = cparams.calc_context_params(self.listener)
            self._listener_dirty = False
        for slot in self.aux_slots.values():
            if slot.props_dirty:
                self.device.mark_config_dirty()
                slot.props_dirty = False
                force = True  # CalcEffectSlotParams forces voice updates
        for v in self.voices:
            if v.source_id and (v.props_dirty or force) \
                    and v.state in (PlayState.PLAYING, PlayState.STOPPING):
                self._update_voice_params(v)
                v.props_dirty = False
                self.device.mark_config_dirty()
        self._pack_block_fields(block_len)

    def event_horizon_blocks(self, T: int) -> int:
        """Blocks until the next host-visible event (voice end, queue item
        transition, first loop wrap, stop fade).  Within this horizon the
        per-block parameter update pass is a no-op, so the device can run
        multiple blocks per dispatch."""
        horizon = 1 << 30
        for v in self.voices:
            if not v.rows:
                continue
            if v.state == PlayState.STOPPING:
                return 1
            if v.state != PlayState.PLAYING:
                continue
            buf = v.current_buffer()
            if buf is None or buf.callback is not None:
                return 1
            per_block = v.step * T
            if per_block <= 0:
                continue
            if v.is_static and v.looping and buf.loop_end > buf.loop_start:
                if v.has_wrapped:
                    # Monotone positions within a chunk: bound by int32 range.
                    limit_frac = (1 << 30)
                else:
                    limit_frac = (buf.loop_end << 16)
            else:
                limit_frac = (buf.sample_len << 16)
            cur = (v.position << 16) + v.position_frac
            n = (limit_frac - cur) // per_block  # blocks fully before limit
            horizon = min(horizon, max(int(n), 1))
        return max(horizon, 1)

    def _process_voice_changes(self) -> None:
        """ProcessVoiceChanges (alu.cpp:2051-2145)."""
        if self.voice_changes:
            self.device.mark_config_dirty()
        for ch in self.voice_changes:
            if ch.kind in (VChange.RESET, VChange.STOP):
                v = ch.voice
                sendevt = False
                if v is not None:
                    sendevt = v.source_id != 0
                    v.source_id = 0
                    v.queue = []
                    if v.state == PlayState.PLAYING:
                        v.state = PlayState.STOPPING
                if ch.kind == VChange.RESET:
                    sendevt = True
                if sendevt:
                    self.events.append(("source_state", ch.source_id, ch.kind.value))
            elif ch.kind == VChange.PAUSE:
                v = ch.voice
                if v.state == PlayState.PLAYING:
                    v.state = PlayState.STOPPING
                    self.events.append(("source_state", ch.source_id, "pause"))
            elif ch.kind == VChange.PLAY:
                sendevt = True
                if ch.old_voice is not None:
                    ov = ch.old_voice
                    ov.queue = []
                    ov.source_id = 0
                    sendevt = ov.state != PlayState.PLAYING
                    if ov.state == PlayState.PLAYING:
                        ov.state = PlayState.STOPPING
                ch.voice.state = PlayState.PLAYING
                if sendevt:
                    self.events.append(("source_state", ch.source_id, "play"))
            elif ch.kind == VChange.RESTART:
                ov = ch.old_voice
                ov.queue = []
                if ov.source_id != 0:
                    ov.source_id = 0
                    was_playing = ov.state == PlayState.PLAYING
                    if was_playing:
                        ov.state = PlayState.STOPPING
                    ch.voice.state = (PlayState.PLAYING if was_playing
                                      else PlayState.STOPPED)
        self.voice_changes.clear()

    def _update_voice_params(self, v: Voice) -> None:
        dev = self.device
        mp = cparams.calc_voice_params(v, self.params, dev)
        v.step = mp.step
        t = dev.table
        for c, r in enumerate(v.rows):
            t.increment[r] = mp.step
            t.bank_row[r] = mp.bank_row
            t.sf[r] = mp.sf
            if mp.dry_target is not None and not v.has_hrtf:
                t.dry_tgt[r] = mp.dry_target[c]
            for snd in range(self.device.num_aux_sends):
                slot = v.props.send[snd].slot
                t.wet_active[r, snd] = slot is not None
                if slot is not None:
                    t.wet_slot[r, snd] = slot.index
                    t.wet_tgt[r, snd] = mp.wet_target[c, snd]
                    self._set_send_filter_target(
                        t, r, snd, np.stack([mp.send_lp_coeffs[snd],
                                             mp.send_hp_coeffs[snd]]))
                    t.send_filter_active[r, snd] = bool(mp.send_filter_active[snd])
            if v.has_hrtf:
                # Old ← previous target on fade (DoHrtfMix handles the blend).
                t.hrtf_old_coeffs[r] = t.hrtf_coeffs[r]
                t.hrtf_old_delay[r] = t.hrtf_delay[r]
                t.hrtf_coeffs[r] = mp.hrtf_coeffs[c]
                t.hrtf_delay[r] = mp.hrtf_delay[c]
                t.hrtf_gain[r] = mp.hrtf_gain[c]
                if not v.is_fading:
                    t.hrtf_old_gain[r] = mp.hrtf_gain[c]
                    t.hrtf_old_coeffs[r] = mp.hrtf_coeffs[c]
                    t.hrtf_old_delay[r] = mp.hrtf_delay[c]
            self._set_filter_target(t, r, np.stack([mp.lp_coeffs, mp.hp_coeffs]))
            t.filter_active[r] = mp.filter_active

    @staticmethod
    def _set_filter_target(t, r: int, new_target: np.ndarray) -> None:
        """BiquadInterpFilter::setParams counter logic (biquad.cpp:131-149)."""
        changed = bool(np.any(np.abs(new_target - t.filter_target[r]) > _COEFF_EPS))
        t.filter_target[r] = new_target
        if not changed:
            if t.filter_counter[r] <= 0:
                t.filter_counter[r] = 0
                t.filter_coeffs[r] = new_target
        elif t.filter_counter[r] >= 0:
            t.filter_counter[r] = f_ops.INTERP_SAMPLES
        else:
            t.filter_counter[r] = 0
            t.filter_coeffs[r] = new_target

    @staticmethod
    def _set_send_filter_target(t, r: int, snd: int, new_target) -> None:
        changed = bool(np.any(np.abs(new_target - t.send_filter_target[r, snd])
                              > _COEFF_EPS))
        t.send_filter_target[r, snd] = new_target
        if not changed:
            if t.send_filter_counter[r, snd] <= 0:
                t.send_filter_counter[r, snd] = 0
                t.send_filter_coeffs[r, snd] = new_target
        elif t.send_filter_counter[r, snd] >= 0:
            t.send_filter_counter[r, snd] = f_ops.INTERP_SAMPLES
        else:
            t.send_filter_counter[r, snd] = 0
            t.send_filter_coeffs[r, snd] = new_target

    def _pack_block_fields(self, block_len: int) -> None:
        """Per-dispatch row refresh: positions, fade counters, play state."""
        t = self.device.table
        fade = min(GAIN_FADE_SAMPLES, block_len)
        for v in self.voices:
            if not v.rows or v.state not in (PlayState.PLAYING, PlayState.STOPPING):
                continue
            playing = v.state == PlayState.PLAYING
            buf = v.current_buffer()
            for r in v.rows:
                if not t.active[r] or t.playing[r] != playing:
                    self.device.mark_config_dirty()
                t.active[r] = True
                t.playing[r] = playing
                t.fade[r] = fade if v.is_fading else 0
                t.pos_int[r] = v.position
                t.pos_frac[r] = v.position_frac
            if buf is not None:
                self._pack_source(v, buf)
            else:
                for r in v.rows:
                    if t.src_len[r] != 0:
                        self.device.mark_config_dirty()
                    t.src_len[r] = 0  # silence

    def _pack_source(self, v: Voice, buf) -> None:
        t = self.device.table
        looping = v.looping and v.is_static and v.position < buf.loop_end
        for c, r in enumerate(v.rows):
            chan = min(c, buf.channels - 1)
            src_off = buf.pool_offset + chan * buf.sample_len
            if (t.src_off[r] != src_off or t.src_len[r] != buf.sample_len
                    or t.has_loop[r] != looping
                    or t.has_wrapped[r] != v.has_wrapped):
                self.device.mark_config_dirty()
            t.src_off[r] = src_off
            t.src_len[r] = buf.sample_len
            t.loop_start[r] = buf.loop_start
            t.loop_end[r] = max(buf.loop_end, buf.loop_start + 1)
            t.has_loop[r] = looping
            t.has_wrapped[r] = v.has_wrapped

    def finish_chunk(self, T: int, n_blocks: int = 1) -> None:
        """Deterministic post-dispatch state evolution (host mirror)."""
        t = self.device.table
        frames = T * n_blocks
        for v in self.voices:
            if not v.rows:
                continue
            if v.state == PlayState.STOPPING:
                # Mixed one silent-target block; now fully stopped.
                v.state = PlayState.STOPPED
                self.device.free_rows(v.rows)
                v.rows = []
                continue
            if v.state != PlayState.PLAYING:
                continue
            # Gain ramps complete within the first block: Current ← Target.
            for r in v.rows:
                t.dry_cur[r] = t.dry_tgt[r] if t.playing[r] else 0.0
                t.wet_cur[r] = t.wet_tgt[r] if t.playing[r] else 0.0
                t.hrtf_old_gain[r] = t.hrtf_gain[r]
                t.hrtf_old_coeffs[r] = t.hrtf_coeffs[r]
                t.hrtf_old_delay[r] = t.hrtf_delay[r]
            rows = np.array(v.rows)
            # The interp schedule completes within 256 samples; cap the loop.
            cf, cnt = f_ops.host_advance_interp(
                t.filter_coeffs[rows], t.filter_target[rows],
                np.maximum(t.filter_counter[rows], 0),
                min(frames, f_ops.INTERP_SAMPLES))
            keep = t.filter_counter[rows] >= 0
            t.filter_coeffs[rows[keep]] = cf[keep]
            t.filter_counter[rows[keep]] = cnt[keep]
            for snd in range(self.device.num_aux_sends):
                scf, scnt = f_ops.host_advance_interp(
                    t.send_filter_coeffs[rows, snd],
                    t.send_filter_target[rows, snd],
                    np.maximum(t.send_filter_counter[rows, snd], 0),
                    min(frames, f_ops.INTERP_SAMPLES))
                keep = t.send_filter_counter[rows, snd] >= 0
                t.send_filter_coeffs[rows[keep], snd] = scf[keep]
                t.send_filter_counter[rows[keep], snd] = scnt[keep]

            v.is_fading = True
            # Position advance (voice.cpp:1086-1089)
            total = v.position_frac + v.step * frames
            samples_done = total >> MIXER_FRAC_BITS
            v.position_frac = total & MIXER_FRAC_MASK
            buffers_done, ended = v.advance(samples_done)
            if buffers_done:
                self.events.append(("buffer_completed", v.source_id, buffers_done))
                self.device.mark_config_dirty()
            if ended:
                v.state = PlayState.STOPPING
                self.events.append(("source_state", v.source_id, "stop"))
                src = self.sources.get(v.source_id)
                if src is not None:
                    src.voice_ended()
                v.source_id = 0
                self.device.mark_config_dirty()

    # Backwards-compatible alias (single block).
    def finish_block(self, T: int) -> None:
        self.finish_chunk(T, 1)
