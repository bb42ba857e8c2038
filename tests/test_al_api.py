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


def test_streaming_queue_roundtrip():
    """The standard streaming loop: poll AL_BUFFERS_PROCESSED, unqueue,
    refill, requeue (alSourceUnqueueBuffers removes entries; al/source.cpp).
    Two successive unqueues must return different buffers, and requeued
    buffers must reach the live voice."""
    dev = al.alcLoopbackOpenDeviceSOFT(44100, "stereo", "float32", capacity=8)
    ctx = al.alcCreateContext(dev)
    al.alcMakeContextCurrent(ctx)

    n = 2048
    bufs = [al.alGenBuffers() for _ in range(3)]
    for i, b in enumerate(bufs):
        tone = (0.2 * np.sin(2 * np.pi * (220 + 110 * i)
                             * np.arange(n) / 44100)).astype(np.float32)
        al.alBufferData(b, al.AL_FORMAT_MONO_FLOAT32, tone, 44100)
    src = al.alGenSources()
    al.alSourceQueueBuffers(src, bufs)
    assert al.alGetSourcei(src, al.AL_BUFFERS_QUEUED) == 3
    assert al.alGetSourcei(src, al.AL_BUFFERS_PROCESSED) == 0
    al.alSourcePlay(src)

    # Render through the first two queue entries.
    al.alcRenderSamplesSOFT(dev, 2 * n + 256)
    assert al.alGetSourcei(src, al.AL_SOURCE_STATE) == al.AL_PLAYING
    assert al.alGetSourcei(src, al.AL_BUFFERS_PROCESSED) == 2

    got1 = al.alSourceUnqueueBuffers(src, 1)
    got2 = al.alSourceUnqueueBuffers(src, 1)
    assert got1 == bufs[0] and got2 == bufs[1]        # no double-pop
    assert al.alGetSourcei(src, al.AL_BUFFERS_QUEUED) == 1
    assert al.alGetSourcei(src, al.AL_BUFFERS_PROCESSED) == 0

    # Refill + requeue both; the live voice keeps streaming through them.
    for b in (got1, got2):
        al.alSourceQueueBuffers(src, [b])
    assert al.alGetSourcei(src, al.AL_BUFFERS_QUEUED) == 3
    out = al.alcRenderSamplesSOFT(dev, 2 * n)
    assert np.abs(out).max() > 0.01
    assert al.alGetSourcei(src, al.AL_BUFFERS_PROCESSED) == 2
    assert al.alGetSourcei(src, al.AL_SOURCE_STATE) == al.AL_PLAYING

    # Drain to the end: everything processed, source stops.
    al.alcRenderSamplesSOFT(dev, 2 * n)
    assert al.alGetSourcei(src, al.AL_SOURCE_STATE) == al.AL_STOPPED
    assert al.alGetSourcei(src, al.AL_BUFFERS_PROCESSED) == 3


def test_buffer_subdata_and_map():
    """AL_SOFT_buffer_sub_data / AL_SOFT_map_buffer: splice a byte range of
    the original payload, map/patch/unmap, and verify the decoded pool data
    follows (al/buffer.cpp:900-998)."""
    dev = al.alcLoopbackOpenDeviceSOFT(44100, "stereo", "float32", capacity=8)
    ctx = al.alcCreateContext(dev)
    al.alcMakeContextCurrent(ctx)

    buf = al.alGenBuffers()
    first = (np.arange(100, dtype=np.int16) * 100)
    al.alBufferDataRaw(buf, al.AL_FORMAT_MONO16, first.tobytes(), 44100)
    b = ctx.buffers[buf]
    assert b.sample_len == 100

    # Sub-data splice: overwrite samples 10..19 with a constant.
    patch = np.full(10, 31000, np.int16)
    al.alBufferSubDataRawSOFT(buf, al.AL_FORMAT_MONO16, patch.tobytes(),
                              10 * 2)
    np.testing.assert_allclose(b.data[0, 10:20], 31000 / 32768.0, atol=1e-6)
    np.testing.assert_allclose(b.data[0, :10], first[:10] / 32768.0,
                               atol=1e-6)

    # Map / write through the view / unmap re-decodes.
    view = al.alMapBufferSOFT(buf, 0, 4)
    view[:4] = np.array([-32768, 0], np.int16).tobytes()
    al.alUnmapBufferSOFT(buf)
    np.testing.assert_allclose(b.data[0, :2], [-1.0, 0.0], atol=1e-6)
    # The spliced region survives the re-decode.
    np.testing.assert_allclose(b.data[0, 10:20], 31000 / 32768.0, atol=1e-6)

    # X-RAM storage-mode stubs round-trip.
    assert al.alEAXGetBufferMode(buf) == al.AL_STORAGE_AUTOMATIC
    assert al.alEAXSetBufferMode([buf], al.AL_STORAGE_HARDWARE)
    assert al.alEAXGetBufferMode(buf) == al.AL_STORAGE_HARDWARE
