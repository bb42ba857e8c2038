"""AL-named function API smoke: a tone plays through the enum surface."""

import numpy as np

from openal_soft_tpu.al import api as al


def test_al_named_surface():
    dev = al.alcLoopbackOpenDeviceSOFT(44100, "stereo", "float32", capacity=8)
    ctx = al.alcCreateContext(dev)
    al.alcMakeContextCurrent(ctx)

    buf = al.alGenBuffers()
    t = np.arange(22050) / 44100
    tone = (0.4 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    al.alBufferData(buf, al.AL_FORMAT_MONO16, tone, 44100)

    src = al.alGenSources()
    al.alSourcei(src, al.AL_BUFFER, buf)
    al.alSourcei(src, al.AL_LOOPING, al.AL_TRUE)
    al.alSourcef(src, al.AL_GAIN, 0.8)
    al.alSource3f(src, al.AL_POSITION, 1.0, 0.0, -1.0)
    al.alListenerfv(al.AL_ORIENTATION, [0, 0, -1, 0, 1, 0])
    al.alDistanceModel(al.AL_INVERSE_DISTANCE_CLAMPED)
    al.alSourcePlay(src)
    assert al.alGetSourcei(src, al.AL_SOURCE_STATE) == al.AL_PLAYING

    out = al.alcRenderSamplesSOFT(dev, 2048)
    assert out.shape == (2048, 2)
    assert np.abs(out).max() > 0.01
    assert al.alGetSourcei(src, al.AL_SAMPLE_OFFSET) > 0

    al.alSourceStop(src)
    al.alcRenderSamplesSOFT(dev, 2048)
    assert al.alGetSourcei(src, al.AL_SOURCE_STATE) == al.AL_STOPPED
