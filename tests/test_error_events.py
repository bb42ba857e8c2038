"""AL error model (al/error.cpp) + AL_SOFT_events dispatch + ext queries."""

import time

import numpy as np

from openal_soft_tpu.al import api

f32 = np.float32


def _fresh_context():
    dev = api.alcLoopbackOpenDeviceSOFT(48000, "stereo", "float32",
                                        capacity=8)
    ctx = api.alcCreateContext(dev)
    api.alcMakeContextCurrent(ctx)
    return dev, ctx


def test_first_error_sticks_and_pops():
    _fresh_context()
    assert api.alGetError() == api.AL_NO_ERROR
    api.alSourcePlay(9999)            # no such source -> AL_INVALID_NAME
    api.alSourcef(9999, api.AL_GAIN, 1.0)  # would be another error
    assert api.alGetError() == api.AL_INVALID_NAME  # first sticks
    assert api.alGetError() == api.AL_NO_ERROR      # popped


def test_invalid_enum_error():
    _fresh_context()
    sid = api.alGenSources(1)
    api.alSourcei(sid, 0xDEAD, 1)
    assert api.alGetError() == api.AL_INVALID_ENUM


def test_entry_points_do_not_raise():
    _fresh_context()
    assert api.alGetSourcei(12345, api.AL_SOURCE_STATE) == 0
    assert api.alGetError() == api.AL_INVALID_NAME


def test_extension_queries():
    dev, _ = _fresh_context()
    assert "AL_SOFT_events" in api.alGetString(api.AL_EXTENSIONS)
    assert api.alIsExtensionPresent("AL_EXT_FLOAT32")
    assert not api.alIsExtensionPresent("AL_NOT_A_THING")
    assert api.alcIsExtensionPresent(dev, "ALC_SOFT_loopback")
    assert "ALSOFT-TPU" in api.alGetString(api.AL_VERSION)


def test_event_callback_dispatch():
    dev, ctx = _fresh_context()
    got = []
    api.alEventCallbackSOFT(lambda kind, oid, param: got.append(
        (kind, oid, param)))
    api.alEventControlSOFT([api.AL_EVENT_TYPE_SOURCE_STATE_CHANGED_SOFT],
                           True)

    bid = api.alGenBuffers(1)
    tone = (0.25 * np.sin(np.arange(4800) * 0.05)).astype(f32)
    api.alBufferData(bid, api.AL_FORMAT_MONO_FLOAT32, tone, 48000)
    sid = api.alGenSources(1)
    api.alSourcei(sid, api.AL_BUFFER, bid)
    api.alSourcePlay(sid)
    api.alcRenderSamplesSOFT(dev, 256)   # processes the play voice-change

    deadline = time.time() + 5.0
    while not got and time.time() < deadline:
        time.sleep(0.01)
    assert got and got[0][0] == "source_state" and got[0][1] == sid

    # disabled kinds don't dispatch
    api.alEventControlSOFT([api.AL_EVENT_TYPE_SOURCE_STATE_CHANGED_SOFT],
                           False)
    n = len(got)
    api.alSourceStop(sid)
    api.alcRenderSamplesSOFT(dev, 256)
    time.sleep(0.05)
    assert len(got) == n


def test_latency_clock_queries():
    """AL_SOFT_source_latency + ALC_SOFT_device_clock surfaces."""
    dev, ctx = _fresh_context()
    assert api.alcGetInteger64vSOFT(dev, api.ALC_DEVICE_CLOCK_SOFT) == 0
    bid = api.alGenBuffers(1)
    tone = (0.25 * np.sin(np.arange(48000) * 0.05)).astype(f32)
    api.alBufferData(bid, api.AL_FORMAT_MONO_FLOAT32, tone, 48000)
    sid = api.alGenSources(1)
    api.alSourcei(sid, api.AL_BUFFER, bid)
    api.alSourcePlay(sid)
    api.alcRenderSamplesSOFT(dev, 1024)

    clk = api.alcGetInteger64vSOFT(dev, api.ALC_DEVICE_CLOCK_SOFT)
    assert clk == 1024 * 1_000_000_000 // 48000

    off, lat = api.alGetSourcei64vSOFT(sid, api.AL_SAMPLE_OFFSET_LATENCY_SOFT)
    assert (off >> 32) == 1024 and lat >= 0
    soff, slat = api.alGetSourcedvSOFT(sid, api.AL_SEC_OFFSET_LATENCY_SOFT)
    assert abs(soff - 1024 / 48000) < 1e-9

    # odd-size render leaves carry -> positive reported latency
    api.alcRenderSamplesSOFT(dev, 100)
    _, lat = api.alGetSourcei64vSOFT(sid, api.AL_SAMPLE_OFFSET_LATENCY_SOFT)
    assert lat > 0
    _, dlat = api.alcGetInteger64vSOFT(dev, api.ALC_DEVICE_CLOCK_LATENCY_SOFT)
    assert dlat == lat
