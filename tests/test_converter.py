"""SampleConverter/ChannelConverter/capture tests (core/converter.cpp).

The reference has no OS-free capture harness, so the strategy is
self-consistency (chunk-split invariance: streaming == one-shot, the
property the prep/frac bookkeeping exists to guarantee) plus exact-value
checks of the load/store quantizers and channel mixers.
"""

import numpy as np
import pytest

from openal_soft_tpu.alc.capture import (ArrayCaptureBackend, CaptureDevice,
                                         WavCaptureBackend)
from openal_soft_tpu.constants import Resampler
from openal_soft_tpu.core.converter import (ChannelConverter, SampleConverter,
                                            load_samples, store_samples)
from openal_soft_tpu.core.devformat import DevFmtType

f32 = np.float32


def test_load_store_exact_values():
    # store: fastf2i(clamp(v*scale, lo, hi)) with ties-even rounding
    x = np.array([0.0, 0.5, -1.0, 1.0, 0.25, 1.0 / 65536], f32)
    s16 = store_samples(x, DevFmtType.SHORT)
    assert s16.tolist() == [0, 16384, -32768, 32767, 8192, 0]
    u8 = store_samples(np.array([0.0, -1.0, 1.0], f32), DevFmtType.UBYTE)
    assert u8.tolist() == [128, 0, 255]
    i32 = store_samples(np.array([1.0, -1.0], f32), DevFmtType.INT)
    assert i32.tolist() == [2147483520, -2147483648]
    # ties-even: 0.5/32768 * 32768 = 0.5 -> rounds to 0; 1.5 -> 2
    t = store_samples(np.array([0.5 / 32768, 1.5 / 32768], f32),
                      DevFmtType.SHORT)
    assert t.tolist() == [0, 2]

    # load inverts store scaling
    for typ in (DevFmtType.BYTE, DevFmtType.UBYTE, DevFmtType.SHORT,
                DevFmtType.USHORT, DevFmtType.INT, DevFmtType.UINT):
        v = store_samples(np.array([0.5, -0.25, 0.0], f32), typ)
        back = load_samples(v, typ)
        np.testing.assert_allclose(back, [0.5, -0.25, 0.0], atol=2e-2)
    np.testing.assert_array_equal(
        load_samples(np.array([16384], np.int16), DevFmtType.SHORT),
        np.array([0.5], f32))


def test_channel_converters():
    mono = np.array([8192, -16384, 32767], np.int16)
    cc = ChannelConverter(DevFmtType.SHORT, 1, 0x1, "stereo")
    out = cc.convert(mono, 3)
    want = (mono.astype(f32) / 32768 * f32(0.707106781187)).astype(f32)
    np.testing.assert_array_equal(out[0::2], want)
    np.testing.assert_array_equal(out[1::2], want)

    stereo = np.array([[100, 200], [300, -400]], np.int16).ravel()
    cc = ChannelConverter(DevFmtType.SHORT, 2, 0x3, "mono")
    out = cc.convert(stereo, 2)
    scale = f32(np.sqrt(f32(0.5)))
    want = ((stereo.reshape(2, 2).astype(f32) / 32768).sum(1).astype(f32)
            * scale).astype(f32)
    np.testing.assert_allclose(out, want, atol=1e-7)


@pytest.mark.parametrize("resampler", [Resampler.POINT, Resampler.LINEAR,
                                       Resampler.SPLINE, Resampler.GAUSSIAN,
                                       Resampler.BSINC24,
                                       Resampler.FAST_BSINC12])
@pytest.mark.parametrize("rates", [(44100, 48000), (48000, 22050)])
def test_streaming_equals_oneshot(resampler, rates):
    """Chunk-split invariance: the property the prep history guarantees."""
    src_rate, dst_rate = rates
    rng = np.random.default_rng(0)
    n = 7000
    sig = (rng.standard_normal((n, 2)) * 0.5).astype(f32)

    one = SampleConverter(DevFmtType.FLOAT, DevFmtType.FLOAT, 2,
                          src_rate, dst_rate, resampler)
    total = one.available_out(n)
    want, used = one.convert(sig, total)
    assert used == n and want.shape[0] == total

    chunked = SampleConverter(DevFmtType.FLOAT, DevFmtType.FLOAT, 2,
                              src_rate, dst_rate, resampler)
    outs, pos = [], 0
    for size in [1, 7, 13, 400, 1500, 23, 2048, 9, 3000]:
        take = min(size, n - pos)
        if take == 0:
            break
        chunk = sig[pos:pos + take]
        pos += take
        m = chunked.available_out(take)
        y, used = chunked.convert(chunk, max(m, 1))
        assert used == take
        outs.append(y)
    got = np.concatenate(outs)
    assert got.shape == want[:got.shape[0]].shape
    np.testing.assert_array_equal(got, want[:got.shape[0]])


def test_unity_rate_is_copy_with_format_conversion():
    sig = (np.sin(np.arange(500) * 0.01) * 0.7).astype(f32).reshape(-1, 1)
    conv = SampleConverter(DevFmtType.FLOAT, DevFmtType.SHORT, 1,
                           48000, 48000, Resampler.SPLINE)
    out, used = conv.convert(sig, conv.available_out(500))
    assert used == 500
    # MaxResamplerPadding zero-prep delays the stream by MaxResamplerEdge
    want = store_samples(sig[:out.shape[0] - 24, 0], DevFmtType.SHORT)
    np.testing.assert_array_equal(out[24:, 0], want)
    assert (out[:24] == 0).all()


def test_capture_device_end_to_end():
    """int16 stereo 44.1k mic -> mono float32 48k capture."""
    rng = np.random.default_rng(1)
    mic = (rng.standard_normal((10000, 2)) * 8000).astype(np.int16)
    backend = ArrayCaptureBackend(mic, 44100, "int16", "stereo")
    dev = CaptureDevice(backend, 48000, "mono", "float32",
                        buffer_frames=16384)
    dev.start()
    avail = dev.available_samples()
    assert avail > 10000  # upsampled
    got = dev.capture_samples(avail)
    dev.stop()

    # manual chain: Multi2Mono then a one-shot SampleConverter
    cc = ChannelConverter(DevFmtType.SHORT, 2, 0x3, "mono")
    monof = cc.convert(mic.ravel(), 10000).reshape(-1, 1)
    sc = SampleConverter(DevFmtType.FLOAT, DevFmtType.FLOAT, 1,
                         44100, 48000, Resampler.SPLINE)
    want, _ = sc.convert(monof, sc.available_out(10000))
    np.testing.assert_array_equal(got[:, 0], want[:avail, 0])

    # over-read raises (ALC_INVALID_VALUE analog, alc.cpp:3374)
    with pytest.raises(ValueError):
        dev.capture_samples(1)


def test_capture_wav_backend(tmp_path):
    import struct

    rate, n = 22050, 3000
    sig = (np.sin(np.arange(n) * 0.05) * 12000).astype(np.int16)
    path = tmp_path / "mic.wav"
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + 2 * n) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                       rate * 2, 2, 16))
        fh.write(b"data" + struct.pack("<I", 2 * n))
        fh.write(sig.tobytes())

    backend = WavCaptureBackend(str(path))
    dev = CaptureDevice(backend, 22050, "mono", "int16", buffer_frames=8192)
    dev.start()
    avail = dev.available_samples()
    got = dev.capture_samples(avail)
    # unity-rate same-format capture: pure copy of the file contents
    np.testing.assert_array_equal(got[:, 0], sig[:avail])


def test_capture_api_surface():
    from openal_soft_tpu.al import api

    mic = (np.sin(np.arange(4000) * 0.02) * 0.5).astype(f32)
    backend = ArrayCaptureBackend(mic, 48000, "float32", "mono")
    dev = api.alcCaptureOpenDevice(backend, 48000,
                                   api.AL_FORMAT_MONO_FLOAT32, 4096)
    api.alcCaptureStart(dev)
    n = dev.available_samples()
    out = api.alcCaptureSamples(dev, n)
    api.alcCaptureStop(dev)
    api.alcCaptureCloseDevice(dev)
    np.testing.assert_array_equal(out[:, 0], mic[:n])
