"""AL_SOFT_callback_buffer: streamed pulls equal a static-buffer render."""

import numpy as np

from openal_soft_tpu.al import api

f32 = np.float32
RATE = 48000
TOTAL = RATE  # 1 second of source material


def _signal():
    t = np.arange(TOTAL) / RATE
    return (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * np.sin(2 * np.pi * 1321 * t)).astype(f32)


def _render(use_callback, frames, pitch=1.0):
    dev = api.alcLoopbackOpenDeviceSOFT(RATE, "stereo", "float32",
                                        capacity=8)
    ctx = api.alcCreateContext(dev)
    api.alcMakeContextCurrent(ctx)
    sig = _signal()
    bid = api.alGenBuffers(1)
    if use_callback:
        state = {"pos": 0}

        def cb(want):
            pos = state["pos"]
            chunk = sig[pos:pos + want]
            state["pos"] = pos + len(chunk)
            return chunk

        api.alBufferCallbackSOFT(bid, api.AL_FORMAT_MONO_FLOAT32, RATE, cb)
    else:
        api.alBufferData(bid, api.AL_FORMAT_MONO_FLOAT32, sig, RATE)
    sid = api.alGenSources(1)
    api.alSourcei(sid, api.AL_BUFFER, bid)
    api.alSourcef(sid, api.AL_PITCH, pitch)
    api.alSource3f(sid, api.AL_POSITION, 0.5, 0.0, -1.0)
    api.alSourcePlay(sid)
    out = api.alcRenderSamplesSOFT(dev, frames)
    state_v = api.alGetSourcei(sid, api.AL_SOURCE_STATE)
    return out, state_v


def test_callback_matches_static():
    want, _ = _render(False, 8192)
    got, _ = _render(True, 8192)
    np.testing.assert_array_equal(got, want)


def test_callback_pitch_and_end():
    """Pitched playback (larger pull-ahead) + end-of-stream stops the
    source once the callback runs dry."""
    want, _ = _render(False, 4096, pitch=1.5)
    got, _ = _render(True, 4096, pitch=1.5)
    np.testing.assert_array_equal(got, want)

    # render past the end: source ends like a static buffer does
    frames = int(TOTAL / 1.5) + 4096
    got, state = _render(True, frames, pitch=1.5)
    assert state == api.AL_STOPPED
    assert np.abs(got[-1024:]).max() == 0.0