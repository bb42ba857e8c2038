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

RATE = 48000


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
    out = dev.render_samples(8192)
    assert np.isfinite(out).all()
    # The wet path contributes: output differs from a dry-only render.
    dev2, ctx2, sid2 = _scene()
    api.alSourcePlay(sid2)
    dry = dev2.render_samples(8192)
    assert np.abs(out - dry).max() > 1e-5


def test_eax_fxslot_load_and_primary():
    dev, ctx, sid = _scene()
    api.EAXSet(eax.EAXPROPERTYID_EAX40_FXSlot1, 1, 0, eax.EAX_CHORUS_EFFECT)
    st = eax.get_eax(ctx)
    assert st.slot_effect_type[1] == "chorus"
    api.EAXSet(eax.EAXPROPERTYID_EAX40_Context, 2, 0,
               eax.EAXPROPERTYID_EAX40_FXSlot1)
    assert st.primary_fx_slot == 1
