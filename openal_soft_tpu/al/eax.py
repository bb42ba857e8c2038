"""EAX 2.0–5.0 compatibility layer (API-level, no DSP of its own).

Host re-realization of al/eax/ (~4.2 kLoC in the reference): EAXSet/EAXGet
dispatch by property-set GUID (al/eax/call.h:26 EaxCall), four effect slots
(al/eax/fx_slots.h:16), listener/reverb property translation onto the
existing EAXReverb EFX engine (al/effects/reverb.cpp:982-1070
EaxReverbCommitter::translate/commit), and per-source filter-gain math
(al/source.cpp:4027-4133 eax_create_direct_filter_param /
eax_create_room_filter_param).

All values route onto the normal EFX objects, so the render path is the
ordinary effect-slot graph — exactly the reference's design.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

# --- property-set GUIDs (al/eax/api.cpp; ABI constants) ----------------------

DSPROPSETID_EAX20_ListenerProperties = \
    "0306a6a8-b224-11d2-99e5-0000e8d8c722"
DSPROPSETID_EAX20_BufferProperties = \
    "0306a6a7-b224-11d2-99e5-0000e8d8c722"
DSPROPSETID_EAX30_ListenerProperties = \
    "a8fa6882-b476-11d3-bdb9-00c0f02ddf87"
DSPROPSETID_EAX30_BufferProperties = \
    "a8fa6881-b476-11d3-bdb9-00c0f02ddf87"
EAXPROPERTYID_EAX40_Context = "1d4870ad-0def-43c0-a40c-523632296342"
EAXPROPERTYID_EAX40_FXSlot0 = "c4d79f1e-f1ac-436b-a81d-a738e7045469"
EAXPROPERTYID_EAX40_FXSlot1 = "08c00e96-74be-4491-93aa-e8ad35a49117"
EAXPROPERTYID_EAX40_FXSlot2 = "1d433b88-f0f6-4637-919f-60e7e06b5edd"
EAXPROPERTYID_EAX40_FXSlot3 = "efff08ea-c7d8-44ab-93ad-6dbd5f910064"
EAXPROPERTYID_EAX40_Source = "1b86b823-22df-4eae-8b3c-1278ce544227"

_FXSLOT_GUIDS = {EAXPROPERTYID_EAX40_FXSlot0: 0,
                 EAXPROPERTYID_EAX40_FXSlot1: 1,
                 EAXPROPERTYID_EAX40_FXSlot2: 2,
                 EAXPROPERTYID_EAX40_FXSlot3: 3}

# Effect GUIDs loadable into a slot (api.cpp EAX_REVERB_EFFECT etc.)
EAX_NULL_GUID = "00000000-0000-0000-0000-000000000000"
EAX_REVERB_EFFECT = "0cf95c8f-a3cc-4849-b0b6-832ecc1822df"
EAX_CHORUS_EFFECT = "de6d6fe2-0ab5-11d2-90f5-00c04fc28aca"
EAX_ECHO_EFFECT = "e9f1bc01-d021-11d1-b0a7-00a0c95a7e09"

_EFFECT_GUIDS = {EAX_NULL_GUID: "null", EAX_REVERB_EFFECT: "eaxreverb",
                 EAX_CHORUS_EFFECT: "chorus", EAX_ECHO_EFFECT: "echo"}

# DSPROPERTY_EAX20LISTENER_* (api.h:84-100)
L20_NONE, L20_ALL, L20_ROOM, L20_ROOMHF, L20_ROOMROLLOFF, L20_DECAYTIME, \
    L20_DECAYHFRATIO, L20_REFLECTIONS, L20_REFLECTIONSDELAY, L20_REVERB, \
    L20_REVERBDELAY, L20_ENVIRONMENT, L20_ENVIRONMENTSIZE, \
    L20_ENVIRONMENTDIFFUSION, L20_AIRABSORPTIONHF, L20_FLAGS = range(16)

# DSPROPERTY_EAX20BUFFER_* (api.h:222-237)
B20_NONE, B20_ALL, B20_DIRECT, B20_DIRECTHF, B20_ROOM, B20_ROOMHF, \
    B20_ROOMROLLOFF, B20_OBSTRUCTION, B20_OBSTRUCTIONLFRATIO, B20_OCCLUSION, \
    B20_OCCLUSIONLFRATIO, B20_OCCLUSIONROOMRATIO, B20_OUTSIDEVOLUMEHF, \
    B20_AIRABSORPTIONFACTOR, B20_FLAGS = range(15)

EAX_DEFER = 0x80000000      # property-id flag: defer commit

# EAX2 environment list == the first 26 EFX reverb presets, in enum order
# (api.h:118-148 / efx-presets.h).
EAX2_ENVIRONMENTS = (
    "generic", "paddedcell", "room", "bathroom", "livingroom", "stoneroom",
    "auditorium", "concerthall", "cave", "arena", "hangar",
    "carpetedhallway", "hallway", "stonecorridor", "alley", "forest",
    "city", "mountains", "quarry", "plain", "parkinglot", "sewerpipe",
    "underwater", "drugged", "dizzy", "psychotic")


def level_mb_to_gain(mb: float) -> float:
    """al/eax/utils.h level_mb_to_gain."""
    if mb <= -10000.0:
        return 0.0
    return float(10.0 ** (mb / 2000.0))


def gain_to_level_mb(gain: float) -> float:
    if gain <= 0.0:
        return -10000.0
    return float(2000.0 * math.log10(gain))


@dataclasses.dataclass
class EaxSourceProps:
    """EAX 2.0 buffer/source properties (EAX20BUFFERPROPERTIES defaults,
    api.h; al/source.cpp:3800-3836)."""
    direct: int = 0
    direct_hf: int = 0
    room: int = 0
    room_hf: int = 0
    room_rolloff: float = 0.0
    obstruction: int = 0
    obstruction_lf_ratio: float = 0.0
    occlusion: int = 0
    occlusion_lf_ratio: float = 0.25
    occlusion_room_ratio: float = 1.5
    occlusion_direct_ratio: float = 1.0
    exclusion: int = 0
    exclusion_lf_ratio: float = 1.0
    outside_volume_hf: int = 0
    air_absorption_factor: float = 0.0
    flags: int = 7


def _occlusion_mb(occ: float, path_ratio: float, lf_ratio: float) -> float:
    """eax_calculate_dst_occlusion_mb (al/source.cpp:4027-4033)."""
    return float(occ) * max(path_ratio * lf_ratio, path_ratio + lf_ratio - 1.0)


class EaxContext:
    """Per-AL-context EAX state: 4 fx slots + per-source properties."""

    MAX_FXSLOTS = 4

    def __init__(self, ctx) -> None:
        self.ctx = ctx
        self.slots = [None] * self.MAX_FXSLOTS
        self.slot_effect_type = ["null"] * self.MAX_FXSLOTS
        self.source_props: dict[int, EaxSourceProps] = {}
        self.primary_fx_slot = 0
        self.listener_env = 0
        self.deferred: list = []
        # Slot 0 defaults to the generic-environment reverb
        # (fx_slots.cpp: slot 0 loads EAX_REVERB_EFFECT on init).
        self._ensure_slot(0)
        self._load_effect(0, "eaxreverb")
        self._set_environment(0)

    # --- slots ---

    def _ensure_slot(self, idx: int):
        if self.slots[idx] is None:
            self.slots[idx] = self.ctx.create_aux_slot()
        return self.slots[idx]

    def _load_effect(self, idx: int, effect_type: str) -> None:
        slot = self._ensure_slot(idx)
        eff = self.ctx.create_effect(effect_type)
        slot.set_effect(eff)
        slot._eax_effect = eff
        self.slot_effect_type[idx] = effect_type

    def _set_environment(self, env: int) -> None:
        from . import presets
        self.listener_env = int(env)
        props = dict(presets.REVERB_PRESETS[EAX2_ENVIRONMENTS[env]])
        slot = self.slots[0]
        for k, v in props.items():
            slot._eax_effect.set(k, v)
        slot.set_effect(slot._eax_effect)

    def _reverb_effect(self, idx: int = 0):
        slot = self._ensure_slot(idx)
        if self.slot_effect_type[idx] != "eaxreverb":
            self._load_effect(idx, "eaxreverb")
        return slot._eax_effect

    # --- EAX20 listener (reverb) ---

    def set_listener(self, pid: int, value) -> None:
        """EAX20LISTENERPROPERTIES onto the slot-0 reverb
        (EaxReverbCommitter::translate, al/effects/reverb.cpp:991-1009)."""
        eff = self._reverb_effect(0)
        slot = self.slots[0]
        if pid == L20_ENVIRONMENT:
            self._set_environment(int(value))
            return
        if pid == L20_ALL:
            self._set_environment(int(value["environment"]))
            for key in ("room", "room_hf", "room_rolloff", "decay_time",
                        "decay_hf_ratio", "reflections", "reflections_delay",
                        "reverb", "reverb_delay", "environment_size",
                        "environment_diffusion", "air_absorption_hf"):
                if key in value:
                    self.set_listener(_L20_BY_NAME[key], value[key])
            return
        name, conv = _L20_PROPS[pid]
        eff.set(name, conv(value) if conv else value)
        slot.set_effect(eff)

    def get_listener(self, pid: int):
        eff = self._reverb_effect(0)
        if pid == L20_ENVIRONMENT:
            return self.listener_env
        name, conv = _L20_PROPS[pid]
        v = eff.get(name)
        return gain_to_level_mb(v) if conv else v

    # --- EAX20 buffer (source) ---

    def set_source(self, source_id: int, pid: int, value) -> None:
        props = self.source_props.setdefault(source_id, EaxSourceProps())
        names = {
            B20_DIRECT: "direct", B20_DIRECTHF: "direct_hf",
            B20_ROOM: "room", B20_ROOMHF: "room_hf",
            B20_ROOMROLLOFF: "room_rolloff",
            B20_OBSTRUCTION: "obstruction",
            B20_OBSTRUCTIONLFRATIO: "obstruction_lf_ratio",
            B20_OCCLUSION: "occlusion",
            B20_OCCLUSIONLFRATIO: "occlusion_lf_ratio",
            B20_OCCLUSIONROOMRATIO: "occlusion_room_ratio",
            B20_OUTSIDEVOLUMEHF: "outside_volume_hf",
            B20_AIRABSORPTIONFACTOR: "air_absorption_factor",
            B20_FLAGS: "flags",
        }
        if pid == B20_ALL:
            for k, v in value.items():
                setattr(props, k, v)
        else:
            setattr(props, names[pid], value)
        self.commit_source(source_id)

    def get_source(self, source_id: int, pid: int):
        props = self.source_props.setdefault(source_id, EaxSourceProps())
        names = {B20_DIRECT: "direct", B20_DIRECTHF: "direct_hf",
                 B20_ROOM: "room", B20_ROOMHF: "room_hf",
                 B20_ROOMROLLOFF: "room_rolloff",
                 B20_OBSTRUCTION: "obstruction",
                 B20_OBSTRUCTIONLFRATIO: "obstruction_lf_ratio",
                 B20_OCCLUSION: "occlusion",
                 B20_OCCLUSIONLFRATIO: "occlusion_lf_ratio",
                 B20_OCCLUSIONROOMRATIO: "occlusion_room_ratio",
                 B20_OUTSIDEVOLUMEHF: "outside_volume_hf",
                 B20_AIRABSORPTIONFACTOR: "air_absorption_factor",
                 B20_FLAGS: "flags"}
        return getattr(props, names[pid])

    def commit_source(self, source_id: int) -> None:
        """Recompute the source's direct + room filter gains
        (eax_create_direct_filter_param / eax_create_room_filter_param,
        al/source.cpp:4035-4133) and apply them to the AL source."""
        src = self.ctx.sources.get(source_id)
        p = self.source_props.get(source_id)
        if src is None or p is None:
            return
        # Direct path: obstruction always; occlusion via the primary slot.
        gain_mb = float(p.obstruction) * p.obstruction_lf_ratio
        gainhf_mb = float(p.obstruction)
        if p.occlusion:
            gain_mb += _occlusion_mb(p.occlusion, p.occlusion_direct_ratio,
                                     p.occlusion_lf_ratio)
            gainhf_mb += float(p.occlusion) * p.occlusion_direct_ratio
        gainhf_mb -= gain_mb
        gain_mb += float(p.direct)
        gainhf_mb += float(p.direct_hf)
        src.set("direct_gain", level_mb_to_gain(gain_mb))
        src.set("direct_gain_hf", level_mb_to_gain(gainhf_mb))
        src.set("direct_gain_lf", 1.0)

        # Room path onto the primary fx slot (send 0).
        slot = self.slots[self.primary_fx_slot]
        if slot is not None:
            room_mb = _occlusion_mb(p.occlusion, p.occlusion_room_ratio,
                                    p.occlusion_lf_ratio)
            roomhf_mb = float(p.occlusion) * p.occlusion_room_ratio
            roomhf_mb -= room_mb
            room_mb += float(p.room)
            roomhf_mb += float(p.room_hf)
            sp = src.props.send[0]
            sp.slot = slot
            sp.gain = level_mb_to_gain(room_mb)
            sp.gain_hf = level_mb_to_gain(roomhf_mb)
            sp.gain_lf = 1.0
            src._props_dirty = True
            if src.voice is not None and src.voice.source_id == src.id:
                import dataclasses as _dc
                src.voice.props = _dc.replace(src.props)
                src.voice.props_dirty = True


# Listener property -> (efx eaxreverb prop name, mB conversion or None)
_L20_PROPS = {
    L20_ROOM: ("gain", level_mb_to_gain),
    L20_ROOMHF: ("gain_hf", level_mb_to_gain),
    L20_ROOMROLLOFF: ("room_rolloff_factor", None),
    L20_DECAYTIME: ("decay_time", None),
    L20_DECAYHFRATIO: ("decay_hf_ratio", None),
    L20_REFLECTIONS: ("reflections_gain", level_mb_to_gain),
    L20_REFLECTIONSDELAY: ("reflections_delay", None),
    L20_REVERB: ("late_reverb_gain", level_mb_to_gain),
    L20_REVERBDELAY: ("late_reverb_delay", None),
    L20_ENVIRONMENTDIFFUSION: ("diffusion", None),
    L20_AIRABSORPTIONHF: ("air_absorption_gain_hf", level_mb_to_gain),
}
_L20_BY_NAME = {"room": L20_ROOM, "room_hf": L20_ROOMHF,
                "room_rolloff": L20_ROOMROLLOFF, "decay_time": L20_DECAYTIME,
                "decay_hf_ratio": L20_DECAYHFRATIO,
                "reflections": L20_REFLECTIONS,
                "reflections_delay": L20_REFLECTIONSDELAY,
                "reverb": L20_REVERB, "reverb_delay": L20_REVERBDELAY,
                "environment_diffusion": L20_ENVIRONMENTDIFFUSION,
                "air_absorption_hf": L20_AIRABSORPTIONHF,
                "environment_size": L20_ENVIRONMENTSIZE}


def get_eax(ctx) -> EaxContext:
    st = getattr(ctx, "_eax_state", None)
    if st is None:
        st = ctx._eax_state = EaxContext(ctx)
    return st


def eax_set(ctx, property_set: str, pid: int, source_id: int, value) -> None:
    """EAXSet (al/eax/call.cpp dispatch by property-set GUID)."""
    st = get_eax(ctx)
    ps = property_set.lower()
    pid &= ~EAX_DEFER
    if ps in (DSPROPSETID_EAX20_ListenerProperties,
              DSPROPSETID_EAX30_ListenerProperties):
        st.set_listener(pid, value)
    elif ps in (DSPROPSETID_EAX20_BufferProperties,
                DSPROPSETID_EAX30_BufferProperties,
                EAXPROPERTYID_EAX40_Source):
        st.set_source(source_id, pid, value)
    elif ps in _FXSLOT_GUIDS:
        idx = _FXSLOT_GUIDS[ps]
        # EAXFXSLOT_LOADEFFECT == 1 (api.h EAXFXSLOT_* enum)
        if pid == 1 and isinstance(value, str):
            st._load_effect(idx, _EFFECT_GUIDS.get(value.lower(), "null"))
        elif pid == 1:
            raise ValueError("slot load takes an effect GUID string")
    elif ps == EAXPROPERTYID_EAX40_Context:
        if pid == 2:                      # EAXCONTEXT_PRIMARYFXSLOTID
            st.primary_fx_slot = _FXSLOT_GUIDS.get(str(value).lower(), 0)
    else:
        raise ValueError(f"unknown EAX property set {property_set}")


def eax_get(ctx, property_set: str, pid: int, source_id: int):
    st = get_eax(ctx)
    ps = property_set.lower()
    pid &= ~EAX_DEFER
    if ps in (DSPROPSETID_EAX20_ListenerProperties,
              DSPROPSETID_EAX30_ListenerProperties):
        return st.get_listener(pid)
    if ps in (DSPROPSETID_EAX20_BufferProperties,
              DSPROPSETID_EAX30_BufferProperties,
              EAXPROPERTYID_EAX40_Source):
        return st.get_source(source_id, pid)
    raise ValueError(f"unknown EAX property set {property_set}")
