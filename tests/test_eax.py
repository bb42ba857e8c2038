"""EAX 2.0 compat layer: EAXSet/EAXGet render through the EFX path.

The reference's al/eax/ translates EAX property sets onto EFX objects
(reverb.cpp:991-1009, source.cpp:4035-4133); these tests assert the same
translation against our EFX layer and that an EAX 2.0 reverb scenario
actually renders through the effect-slot graph.
"""

import numpy as np

from openal_soft_tpu.al import api, eax
from openal_soft_tpu.al.eax import (
    B20_DIRECT, B20_OCCLUSION, DSPROPSETID_EAX20_BufferProperties,
    DSPROPSETID_EAX20_ListenerProperties, L20_DECAYTIME, L20_ENVIRONMENT,
    L20_ROOM,
)

# 44100 like the reverb golden suites: the EAXReverb state shapes are
# rate-dependent, so sharing the rate shares their compiled graphs.
RATE = 44100


def _scene():
    dev = api.alcLoopbackOpenDeviceSOFT(frequency=RATE, capacity=16)
    ctx = api.alcCreateContext(dev)
    api.alcMakeContextCurrent(ctx)
    bid = api.alGenBuffers(1)
    t = np.arange(RATE // 4) / RATE
    api.alBufferData(bid, 0x10010,
                     (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32),
                     RATE)
    sid = api.alGenSources(1)
    api.alSourcei(sid, 0x1009, bid)          # AL_BUFFER
    api.alSourcei(sid, 0x1007, 1)            # AL_LOOPING
    return dev, ctx, sid


def test_eax2_reverb_renders_through_efx():
    dev, ctx, sid = _scene()
    # Environment select: hangar (long decay) then a listener prop tweak.
    api.EAXSet(DSPROPSETID_EAX20_ListenerProperties, L20_ENVIRONMENT, 0, 10)
    assert api.EAXGet(DSPROPSETID_EAX20_ListenerProperties,
                      L20_ENVIRONMENT, 0) == 10
    api.EAXSet(DSPROPSETID_EAX20_ListenerProperties, L20_DECAYTIME, 0, 4.3)
    st = eax.get_eax(ctx)
    assert st.slot_effect_type[0] == "eaxreverb"
    assert abs(st.slots[0]._eax_effect.get("decay_time") - 4.3) < 1e-6

    # Room level in mB -> reverb gain.
    api.EAXSet(DSPROPSETID_EAX20_ListenerProperties, L20_ROOM, 0, -600)
    assert abs(st.slots[0]._eax_effect.get("gain")
               - 10.0 ** (-600 / 2000.0)) < 1e-6

    # Source occlusion attaches send 0 to slot 0 and scales filter gains.
    api.EAXSet(DSPROPSETID_EAX20_BufferProperties, B20_OCCLUSION, sid, -1200)
    api.EAXSet(DSPROPSETID_EAX20_BufferProperties, B20_DIRECT, sid, -300)
    src = ctx.sources[sid]
    assert src.props.send[0].slot is st.slots[0]
    # direct: -300 mB + occlusion*direct_ratio contributions
    p = st.source_props[sid]
    want_lf = eax.level_mb_to_gain(
        eax._occlusion_mb(p.occlusion, p.occlusion_direct_ratio,
                          p.occlusion_lf_ratio) + p.direct)
    assert abs(src.props.direct_gain - want_lf) < 1e-6

    api.alSourcePlay(sid)
    out = dev.render_samples(2048)
    assert np.isfinite(out).all()
    # The wet path contributes: output differs from a dry-only render.
    dev2, ctx2, sid2 = _scene()
    api.alSourcePlay(sid2)
    dry = dev2.render_samples(2048)
    assert np.abs(out - dry).max() > 1e-5


def test_eax_fxslot_load_and_primary():
    dev, ctx, sid = _scene()
    api.EAXSet(eax.EAXPROPERTYID_EAX40_FXSlot1, eax.FXSLOT_LOADEFFECT, 0,
               eax.EAX_CHORUS_EFFECT)
    st = eax.get_eax(ctx)
    assert st.slot_effect_type[1] == "chorus"
    api.EAXSet(eax.EAXPROPERTYID_EAX40_Context, 2, 0,
               eax.EAXPROPERTYID_EAX40_FXSlot1)
    assert st.primary_fx_slot == 1


def test_eax2_environment_size_and_flags():
    """ENVIRONMENTSIZE scales decay/reflection/reverb per the listener
    flags (EnvironmentSizeDeferrer2, al/effects/reverb.cpp:829-884); FLAGS
    and a full ALLPARAMETERS struct set must not raise."""
    from openal_soft_tpu.al.eax import (
        L20_ALL, L20_ENVIRONMENTSIZE, L20_FLAGS, get_eax)

    dev, ctx, sid = _scene()
    L = DSPROPSETID_EAX20_ListenerProperties
    api.EAXSet(L, L20_ENVIRONMENT, 0, 0)               # generic, size 7.5
    assert api.EAXGet(L, L20_ENVIRONMENTSIZE, 0) == 7.5
    st = get_eax(api._ctx())
    eff = st.slots[0]._eax_effect
    d0 = eff.get("decay_time")
    rg0 = eff.get("reflections_gain")
    rd0 = eff.get("reflections_delay")

    api.EAXSet(L, L20_ENVIRONMENTSIZE, 0, 15.0)        # double the room
    scale = 15.0 / 7.5
    assert api.EAXGet(L, L20_ENVIRONMENTSIZE, 0) == 15.0
    assert np.isclose(eff.get("decay_time"), min(d0 * scale, 20.0))
    assert np.isclose(eff.get("reflections_gain"), rg0 / scale)
    assert np.isclose(eff.get("reflections_delay"), min(rd0 * scale, 0.3))

    # FLAGS: clearing DECAYTIMESCALE freezes decay on further size changes.
    api.EAXSet(L, L20_FLAGS, 0, 0x3F & ~0x01)
    d1 = eff.get("decay_time")
    api.EAXSet(L, L20_ENVIRONMENTSIZE, 0, 30.0)
    assert np.isclose(eff.get("decay_time"), d1)

    # Whole-struct set including environment_size and flags: absolute, no
    # rescaling, no KeyError.
    api.EAXSet(L, L20_ALL, 0, {
        "environment": 2, "environment_size": 4.2, "flags": 0x3F,
        "decay_time": 0.9, "room": -500})
    assert api.EAXGet(L, L20_ENVIRONMENTSIZE, 0) == 4.2
    assert np.isclose(eff.get("decay_time"), 0.9)


def test_eax5_fxslot_reverb_properties():
    """EAX 4/5 fx-slot property sets: EAXREVERB parameters on a slot
    (al/eax/fx_slots.cpp + effects/reverb.cpp committers), EAX50 GUIDs,
    and the raw (byte-level) ABI the C shim uses."""
    import struct
    from openal_soft_tpu.al.eax import (
        EAXPROPERTYID_EAX50_Context, EAXPROPERTYID_EAX50_FXSlot0,
        FXSLOT_LOADEFFECT, FXSLOT_VOLUME, RV_ALL, RV_DECAYTIME,
        RV_ENVIRONMENT, RV_ENVIRONMENTSIZE, CTX_MACROFXFACTOR,
        CTX_SPEAKERCONFIG, eax_get_raw, eax_set_raw, get_eax)

    dev, ctx, sid = _scene()
    st = eax.get_eax(ctx)
    S0 = EAXPROPERTYID_EAX50_FXSlot0

    # Environment select + size scaling on slot 0 through the EAX50 GUID.
    api.EAXSet(S0, RV_ENVIRONMENT, 0, 10)              # hangar
    assert api.EAXGet(S0, RV_ENVIRONMENT, 0) == 10
    d0 = api.EAXGet(S0, RV_DECAYTIME, 0)
    assert d0 > 2.0
    api.EAXSet(S0, RV_ENVIRONMENTSIZE, 0,
               2.0 * api.EAXGet(S0, RV_ENVIRONMENTSIZE, 0))
    assert api.EAXGet(S0, RV_DECAYTIME, 0) > d0        # decay scaled up
    assert api.EAXGet(S0, RV_ENVIRONMENT, 0) == 26     # UNDEFINED now

    # Slot volume in mB.
    api.EAXSet(S0, FXSLOT_VOLUME, 0, -600)
    assert abs(st.slots[0].gain - 10 ** (-600 / 2000)) < 1e-6

    # EAX50 context properties.
    api.EAXSet(EAXPROPERTYID_EAX50_Context, CTX_SPEAKERCONFIG, 0, 1)
    api.EAXSet(EAXPROPERTYID_EAX50_Context, CTX_MACROFXFACTOR, 0, 0.5)
    assert api.EAXGet(EAXPROPERTYID_EAX50_Context, CTX_MACROFXFACTOR,
                      0) == 0.5

    # Raw ABI: whole EAXREVERBPROPERTIES struct roundtrip.
    raw = eax_get_raw(ctx, S0, RV_ALL, 0, 112)
    assert raw is not None and len(raw) == 112
    env, size = struct.unpack_from("<Lf", raw, 0)
    assert env == 26
    rc = eax_set_raw(ctx, S0, RV_ALL, 0, raw)
    assert rc == 0
    rc = eax_set_raw(ctx, S0, RV_DECAYTIME, 0, struct.pack("<f", 4.25))
    assert rc == 0
    back = struct.unpack("<f", eax_get_raw(ctx, S0, RV_DECAYTIME, 0, 4))[0]
    assert abs(back - 4.25) < 1e-6


def test_eax5_source_property_set():
    """EAX5.0 source property set (api.h:448-486 numbering — NOT the EAX2
    buffer enum): scalars, the occlusion/exclusion param structs, speaker
    levels, macro-FX factor, and the ALL struct roundtrip."""
    import struct
    from openal_soft_tpu.al.eax import (
        EAXPROPERTYID_EAX50_Source, SRC_ALL, SRC_DIRECT, SRC_EXCLUSIONPARAMS,
        SRC_MACROFXFACTOR, SRC_OCCLUSIONPARAMS, SRC_ROOM, SRC_SPEAKERLEVELS,
        eax_get_raw, eax_set_raw)

    dev, ctx, sid = _scene()
    st = eax.get_eax(ctx)
    S = EAXPROPERTYID_EAX50_Source

    # Scalars use the EAX3+ numbering: SRC_DIRECT is pid 5.
    assert eax_set_raw(ctx, S, SRC_DIRECT, sid, struct.pack("<l", -300)) == 0
    assert struct.unpack(
        "<l", eax_get_raw(ctx, S, SRC_DIRECT, sid, 4))[0] == -300
    assert st.source_props[sid].direct == -300

    # Occlusion params apply to the direct + room filter gains.
    assert eax_set_raw(ctx, S, SRC_OCCLUSIONPARAMS, sid,
                       struct.pack("<lfff", -1200, 0.3, 1.2, 0.8)) == 0
    p = st.source_props[sid]
    assert (p.occlusion, p.occlusion_lf_ratio) == (-1200, np.float32(0.3))
    src = ctx.sources[sid]
    assert src.props.direct_gain < 10.0 ** (-300 / 2000.0) + 1e-6

    # Exclusion attenuates the room send only.
    g_before = src.props.send[0].gain
    assert eax_set_raw(ctx, S, SRC_EXCLUSIONPARAMS, sid,
                       struct.pack("<lf", -900, 1.0)) == 0
    assert src.props.send[0].gain < g_before
    assert src.props.direct_gain == ctx.sources[sid].props.direct_gain

    # EAX50 speaker levels: per-speaker dB table stored and returned.
    levels = b"".join(struct.pack("<ll", i + 1, -100 * (i + 1))
                      for i in range(9))
    assert eax_set_raw(ctx, S, SRC_SPEAKERLEVELS, sid, levels) == 0
    back = eax_get_raw(ctx, S, SRC_SPEAKERLEVELS, sid, 72)
    assert back == levels
    assert st.source_props[sid].speaker_levels[4] == -500

    # Macro-FX factor (EAX50 scalar).
    assert eax_set_raw(ctx, S, SRC_MACROFXFACTOR, sid,
                       struct.pack("<f", 0.25)) == 0
    assert struct.unpack(
        "<f", eax_get_raw(ctx, S, SRC_MACROFXFACTOR, sid, 4))[0] == \
        np.float32(0.25)

    # ALL struct roundtrip (EAX50 layout = EAX30 + flMacroFXFactor).
    raw = eax_get_raw(ctx, S, SRC_ALL, sid, 80)
    assert raw is not None and len(raw) == 76
    assert eax_set_raw(ctx, S, SRC_ALL, sid, raw) == 0
    assert struct.unpack_from("<l", raw, 0)[0] == -300


def test_eax5_context_commit_paths():
    """EAX50 context macro-FX factor + speaker config through the raw ABI
    (EAXCONTEXT_PROPERTY, api.h:326-339), with clamped range checks."""
    import struct
    from openal_soft_tpu.al.eax import (
        CTX_MACROFXFACTOR, CTX_SPEAKERCONFIG, EAXPROPERTYID_EAX50_Context,
        eax_get_raw, eax_set_raw)

    dev, ctx, sid = _scene()
    C = EAXPROPERTYID_EAX50_Context
    assert eax_set_raw(ctx, C, CTX_SPEAKERCONFIG, 0,
                       struct.pack("<L", 5)) == 0
    assert struct.unpack(
        "<L", eax_get_raw(ctx, C, CTX_SPEAKERCONFIG, 0, 4))[0] == 5
    assert eax_set_raw(ctx, C, CTX_MACROFXFACTOR, 0,
                       struct.pack("<f", 0.75)) == 0
    assert struct.unpack(
        "<f", eax_get_raw(ctx, C, CTX_MACROFXFACTOR, 0, 4))[0] == \
        np.float32(0.75)
