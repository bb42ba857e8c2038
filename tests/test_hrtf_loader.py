"""HRTF set management: shipped data, enumeration, rate resampling, HOA bake.

The reference resamples whole sets on a device-rate mismatch
(core/hrtf.cpp:537-605) with its own offline Kaiser resampler; ours uses
utils/polyphase with slightly different transition-band parameters, so the
checks here are structural/energy invariants, not golden diffs.
"""

import numpy as np

from openal_soft_tpu.core import hrtf

f32 = np.float32


def test_shipped_default_set_loads():
    path = hrtf.default_hrtf_path()
    assert path is not None and "openal_soft_tpu/data/hrtf" in path.replace(
        "\\", "/")
    store = hrtf.load_mhr(path)
    assert store.sample_rate == 48000
    assert store.coeffs.shape[1] == 128 and store.coeffs.shape[2] == 2
    assert (store.delays >> 2).max() <= hrtf.MAX_HRIR_DELAY


def test_enumerate_lists_shipped_set():
    sets = hrtf.enumerate_hrtf()
    names = [n for n, _ in sets]
    assert "Default HRTF" in names
    assert hrtf.find_hrtf("Default HRTF") is not None
    assert hrtf.find_hrtf("no-such-set") is None


def test_rate_resample_invariants():
    store = hrtf.load_mhr(hrtf.default_hrtf_path())
    rs = hrtf.resample_hrtf_store(store, 44100)
    assert rs.sample_rate == 44100
    assert rs.coeffs.shape == store.coeffs.shape
    # delays scale by the rate ratio (then 2.6 fixed-point re-quantized)
    ratio = 44100 / 48000
    want = np.round(store.delays.astype(np.float64) * ratio)
    got = rs.delays.astype(np.float64)
    assert np.abs(got - want).max() <= 1.0
    # ir_size shrinks with the rate
    assert rs.ir_size == round(store.ir_size * ratio)
    # energy preserved within a few percent for a band-limited downsample
    e0 = float((store.coeffs.astype(np.float64) ** 2).sum())
    e1 = float((rs.coeffs.astype(np.float64) ** 2).sum())
    assert 0.8 * e0 < e1 * (48000 / 44100) < 1.2 * e0

    same = hrtf.resample_hrtf_store(store, 48000)
    assert same is store


def test_hoa_bake_orders():
    store = hrtf.load_mhr(hrtf.default_hrtf_path())
    for order in (1, 2, 3, 4):
        st = hrtf.build_direct_hrtf(store, store.ir_size, order)
        n = (order + 1) ** 2
        assert st.coeffs.shape == (n, 128, 2)
        assert st.hf_scales.shape == (n,)
        assert np.isfinite(st.coeffs).all()
        # W channel response integrates to ~unity-scale sum of the fronts
        assert abs(float(st.coeffs[:, :, 0].sum())) > 0.0
    # per-order HF gains follow the reference normalization rows
    st3 = hrtf.build_direct_hrtf(store, store.ir_size, 3)
    np.testing.assert_array_equal(
        np.unique(st3.hf_scales), np.unique(hrtf.AMBI_HF_GAIN_3O))


def test_hrtf_device_rate_mismatch_renders():
    """A 44.1k HRTF device renders through the resampled 48k set."""
    from openal_soft_tpu.alc.device import LoopbackDevice

    dev = LoopbackDevice(frequency=44100, channels="stereo",
                         sample_type="float32", capacity=8, hrtf=True)
    assert dev.hrtf_store.sample_rate == 44100
    ctx = dev.create_context()
    t = np.arange(22050) / 44100.0
    buf = ctx.create_buffer()
    buf.set_data((0.5 * np.sin(2 * np.pi * 440 * t)).astype(f32),
                 "mono", "float32", 44100)
    src = ctx.create_source()
    src.buffer(buf)
    src.looping = True
    src.set("position", (1.0, 0.0, -1.0))
    src.play()
    out = dev.render_samples(512)
    assert out.shape == (512, 2)
    assert np.isfinite(out).all() and np.abs(out).max() > 1e-4


def _legacy_payload(rng, ev_az, ir_size):
    """Mono 16-bit HRIRs + whole-sample delays shared by MinPHR00/01/02."""
    ir_total = sum(ev_az)
    coeffs = rng.integers(-20000, 20000, (ir_total, ir_size), np.int16)
    delays = rng.integers(0, 40, ir_total, dtype=np.uint8)
    return coeffs, delays


def test_legacy_mhr01_matches_mhr02(tmp_path):
    """MinPHR01 loads into the same store as an equivalent mono MinPHR02
    (hrtf_loader.cpp:278-343 vs :346-580)."""
    import struct

    rng = np.random.default_rng(5)
    ev_az = [1, 9, 16, 9, 1]
    ir_size = 16
    coeffs, delays = _legacy_payload(rng, ev_az, ir_size)

    p1 = tmp_path / "a.mhr"
    blob = b"MinPHR01" + struct.pack("<IBB", 44100, ir_size, len(ev_az))
    blob += bytes(ev_az) + coeffs.astype("<i2").tobytes() + delays.tobytes()
    p1.write_bytes(blob)

    p2 = tmp_path / "b.mhr"
    blob2 = b"MinPHR02" + struct.pack("<IBBBB", 44100, 0, 0, ir_size, 1)
    blob2 += struct.pack("<HB", 0, len(ev_az)) + bytes(ev_az)
    blob2 += coeffs.astype("<i2").tobytes() + delays.tobytes()
    p2.write_bytes(blob2)

    a = hrtf.load_mhr(str(p1))
    b = hrtf.load_mhr(str(p2))
    np.testing.assert_array_equal(a.coeffs, b.coeffs)
    np.testing.assert_array_equal(a.delays, b.delays)
    np.testing.assert_array_equal(a.elev_az_counts, b.elev_az_counts)
    assert a.sample_rate == 44100 and a.ir_size == ir_size


def test_legacy_mhr00_loads(tmp_path):
    """MinPHR00's explicit IR-offset table (hrtf_loader.cpp:192-276)."""
    import struct

    rng = np.random.default_rng(6)
    ev_az = [1, 9, 16, 9, 1]
    ir_size = 16
    ir_total = sum(ev_az)
    coeffs, delays = _legacy_payload(rng, ev_az, ir_size)
    offsets = np.concatenate([[0], np.cumsum(ev_az)[:-1]]).astype("<u2")

    p0 = tmp_path / "c.mhr"
    blob = b"MinPHR00" + struct.pack("<IHHB", 44100, ir_total, ir_size,
                                     len(ev_az))
    blob += offsets.tobytes() + coeffs.astype("<i2").tobytes() + delays.tobytes()
    p0.write_bytes(blob)

    st = hrtf.load_mhr(str(p0))
    assert list(st.elev_az_counts) == ev_az
    # Mirrored: the right-ear response of azimuth j equals the left ear of
    # azimuth (azn-j)%azn within the elevation.
    off, azn = 1, 9   # second elevation row
    np.testing.assert_array_equal(st.coeffs[off + 2, :, 1],
                                  st.coeffs[off + (azn - 2) % azn, :, 0])


def test_search_data_files(tmp_path, monkeypatch):
    """SearchDataFiles chain (core/helpers.cpp:316-350): XDG dirs +
    shipped data; relative names resolve through it."""
    from openal_soft_tpu.core import helpers

    d = tmp_path / "openal" / "presets"
    d.mkdir(parents=True)
    (d / "custom.ambdec").write_text("/description test\n")
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path))
    files = helpers.search_data_files(".ambdec", "presets")
    assert str(d / "custom.ambdec") in files
    # Shipped presets are on the chain too.
    assert any("openal_soft_tpu/data/presets" in f.replace("\\", "/")
               for f in files)
    # Relative name resolution (with and without the extension).
    assert helpers.find_data_file("custom", ".ambdec", "presets") == \
        str(d / "custom.ambdec")
    assert helpers.find_data_file("itu5.1", ".ambdec", "presets") is not None
