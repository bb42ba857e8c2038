"""BS2B crossfeed: unit oracle + golden vs reference (cf_level config)."""

import os
import pathlib

import numpy as np
import pytest

from openal_soft_tpu.core.bs2b import Bs2bProcessor

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 48000
FRAMES = 4096


def _seq_cross_feed(proc, left, right):
    """Sequential port of bs2b_processor::cross_feed (bs2b.cpp:107-163)."""
    a0lo, b1lo = proc.a0_lo, proc.b1_lo
    a0hi, a1hi, b1hi = proc.a0_hi, proc.a1_hi, proc.b1_hi
    zl_lo = zl_hi = zr_lo = zr_hi = 0.0
    out_l = np.empty_like(left)
    out_r = np.empty_like(right)
    for n in range(left.shape[0]):
        x = left[n]
        y0 = a0hi * x + zl_hi
        zl_hi = a1hi * x + b1hi * y0
        y1 = a0lo * x + zl_lo
        zl_lo = b1lo * y1
        x = right[n]
        r0 = a0lo * x + zr_lo
        zr_lo = b1lo * r0
        r1 = a0hi * x + zr_hi
        zr_hi = a1hi * x + b1hi * r1
        out_l[n] = y0 + r0
        out_r[n] = y1 + r1
    return out_l, out_r


@pytest.mark.parametrize("level", [1, 3, 6])
def test_bs2b_matches_sequential(level):
    rng = np.random.default_rng(0)
    left = rng.standard_normal(1000).astype(np.float64) * 0.5
    right = rng.standard_normal(1000).astype(np.float64) * 0.5
    proc = Bs2bProcessor(level, RATE)
    want_l, want_r = _seq_cross_feed(proc, left, right)
    # chunked calls exercise the state carry
    got_l, got_r = [], []
    bounds = [0, 100, 357, 1000]
    for a, b in zip(bounds[:-1], bounds[1:]):
        gl, gr = proc.cross_feed(left[a:b], right[a:b])
        got_l.append(gl)
        got_r.append(gr)
    np.testing.assert_allclose(np.concatenate(got_l), want_l, atol=1e-6)
    np.testing.assert_allclose(np.concatenate(got_r), want_r, atol=1e-6)


def _sources():
    t = np.arange(RATE // 2) / RATE
    return [
        {"data": (0.4 * np.sin(2 * np.pi * 441.0 * t)).astype(np.float32),
         "position": (1.0, 0.0, -2.0)},
    ]


def test_bs2b_gating_and_render(tmp_path):
    """cf_level engages only for non-loopback devices (panning.cpp:1421:
    ``device->Type != DeviceType::Loopback``); a non-loopback render
    applies the crossfeed filter pair end-to-end."""
    conf = tmp_path / "bs2b.conf"
    conf.write_text("cf_level = 3\n")

    from openal_soft_tpu.alc import config as alconf

    old = os.environ.get("ALSOFT_CONF")
    os.environ["ALSOFT_CONF"] = str(conf)
    alconf.load_config(reload=True)
    try:
        from openal_soft_tpu.alc.device import LoopbackDevice
        from openal_soft_tpu.core.device import RenderDevice
        from openal_soft_tpu.core.devformat import (DevFmtChannels,
                                                    DevFmtType)

        lb = LoopbackDevice(frequency=RATE, channels="stereo",
                            sample_type="float32", capacity=8)
        assert lb._bs2b is None  # loopback: crossfeed must NOT engage

        dev = RenderDevice(RATE, DevFmtChannels.STEREO, DevFmtType.FLOAT,
                           capacity=8, loopback=False)
        assert dev._bs2b is not None and dev._bs2b.level == 3

        from openal_soft_tpu.alc.context import Context

        ctx = Context(dev)
        for s in _sources():
            buf = ctx.create_buffer()
            buf.set_data(s["data"], "mono", "float32", RATE)
            src = ctx.create_source()
            src.buffer(buf)
            src.looping = True
            src.set("position", s["position"])
            src.play()
        out = dev.render_samples(FRAMES)

        # same scene without crossfeed differs by the crossfed component
        ctx2_dev = RenderDevice(RATE, DevFmtChannels.STEREO,
                                DevFmtType.FLOAT, capacity=8, loopback=True)
        ctx2 = Context(ctx2_dev)
        for s in _sources():
            buf = ctx2.create_buffer()
            buf.set_data(s["data"], "mono", "float32", RATE)
            src = ctx2.create_source()
            src.buffer(buf)
            src.looping = True
            src.set("position", s["position"])
            src.play()
        plain = ctx2_dev.render_samples(FRAMES)
        assert np.isfinite(out).all()
        assert np.max(np.abs(out - plain)) > 1e-3

        # the filter is the exact sequential semantics: re-derive from the
        # plain render through the oracle
        proc = Bs2bProcessor(3, RATE)
        want_l, want_r = _seq_cross_feed(
            proc, plain[:, 0].astype(np.float64),
            plain[:, 1].astype(np.float64))
        np.testing.assert_allclose(out[:, 0], want_l, atol=2e-6)
        np.testing.assert_allclose(out[:, 1], want_r, atol=2e-6)
    finally:
        if old is None:
            del os.environ["ALSOFT_CONF"]
        else:
            os.environ["ALSOFT_CONF"] = old
        alconf.load_config(reload=True)
