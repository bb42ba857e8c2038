"""makemhr pipeline: SOFA/array HRIR sets compile into loadable mhr files.

Structural round-trips (the reference ships no golden mhr outputs to diff
against; utils/makemhr/makemhr.cpp is the spec, cited per stage in
utils/makemhr.py).
"""

import numpy as np
import pytest

from openal_soft_tpu.core import hrtf
from openal_soft_tpu.utils import makemhr

RATE = 44100


def _grid_set(rng, ir_size=64, stereo=True):
    az_counts = [1, 8, 12, 8, 1]
    n = sum(az_counts)
    c = 2 if stereo else 1
    irs = np.zeros((n, c, ir_size))
    t = np.arange(ir_size)
    for i in range(n):
        for ch in range(c):
            onset = 3 + (i + ch) % 9
            env = np.exp(-np.maximum(t - onset, 0) / 6.0) * (t >= onset)
            irs[i, ch] = env * rng.standard_normal(ir_size) * 0.5
            irs[i, ch, onset] = 1.0
    return makemhr.HrirSet(RATE, [(1.2, az_counts)], irs)


def test_pipeline_produces_loadable_mhr(tmp_path):
    rng = np.random.default_rng(9)
    hset = _grid_set(rng)
    out = tmp_path / "set.mhr"
    makemhr.process_hrir_set(hset, str(out), fft_size=1024, trunc_size=32)

    st = hrtf.load_mhr(str(out))
    assert st.sample_rate == RATE
    assert st.ir_size == 32
    assert st.coeffs.shape[0] == 30 and st.coeffs.shape[2] == 2
    assert list(st.elev_az_counts) == [1, 8, 12, 8, 1]
    assert np.abs(st.field_distances[0] - 1.2) < 1e-6
    # Normalized: samples within ±1, nonzero energy.
    assert np.abs(st.coeffs).max() <= 1.0
    assert np.abs(st.coeffs).max() > 0.01
    # Delays are 2.6 fixed point within the 63-sample cap.
    assert (st.delays >> 2).max() <= 63


def test_minimum_phase_preserves_magnitude():
    """Min-phase reconstruction keeps the magnitude response (the phase is
    discarded, the energy moves to the front; makemhr.cpp:240-262)."""
    rng = np.random.default_rng(10)
    n_fft = 512
    ir = rng.standard_normal(128) * np.exp(-np.arange(128) / 20.0)
    mags = makemhr.calc_magnitudes(ir[None, None], n_fft)
    rec = makemhr.minimum_phase(mags[0], n_fft, n_fft)[0]
    got = np.abs(np.fft.rfft(rec, n_fft))
    want = np.maximum(mags[0, 0], makemhr.EPSILON)
    np.testing.assert_allclose(got[1:], want[1:], rtol=1e-6)
    # Energy concentrates at the front (min-phase property).
    e_front = np.sum(rec[:32] ** 2)
    assert e_front > 0.8 * np.sum(rec ** 2)


def test_sphere_delay_model_is_symmetric():
    rng = np.random.default_rng(11)
    hset = _grid_set(rng)
    onsets = np.zeros((hset.irs.shape[0], 2))
    d = makemhr.calc_hrtds(hset, onsets, model="sphere")
    assert d.min() == 0.0 and d.max() <= makemhr.MAX_HRTD
    # Left-right symmetry: at the middle elevation, azimuth j's left delay
    # equals azimuth (azn-j)'s right delay.
    off, azn = 9, 12
    for j in range(1, azn):
        assert abs(d[off + j, 0] - d[off + (azn - j) % azn, 1]) < 1e-9


def test_sofa_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(12)
    # 3 elevations x 4 azimuths at one distance.
    pos = []
    for el in (-30.0, 0.0, 30.0):
        for az in (0.0, 90.0, 180.0, 270.0):
            pos.append((az, el, 1.5))
    m = len(pos)
    ir = rng.standard_normal((m, 2, 48)) * 0.3
    p = tmp_path / "tiny.sofa"
    with h5py.File(p, "w") as f:
        f.create_dataset("Data.IR", data=ir)
        f.create_dataset("Data.SamplingRate", data=np.array([RATE], float))
        f.create_dataset("SourcePosition", data=np.array(pos, float))
    hset = makemhr.load_sofa(str(p))
    assert hset.rate == RATE
    assert hset.fields == [(1.5, [4, 4, 4])]
    out = tmp_path / "tiny.mhr"
    makemhr.process_hrir_set(hset, str(out), fft_size=512, trunc_size=16)
    st = hrtf.load_mhr(str(out))
    assert st.coeffs.shape[0] == 12 and st.ir_size == 16


def _write_wav16(path, data, rate):
    import struct

    pcm = np.clip(np.asarray(data) * 32767.0, -32768, 32767).astype("<i2")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + pcm.nbytes) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                      rate * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", pcm.nbytes) + pcm.tobytes())


def test_def_file_compiles_with_synthesis(tmp_path):
    """A definition file with WAV sources and a missing bottom elevation
    compiles into a loadable mhr; the missing elevation is synthesized
    (loaddef.cpp grammar; SynthesizeOnsets/SynthesizeHrirs,
    makemhr.cpp:586-830)."""
    rng = np.random.default_rng(12)
    az_counts = [1, 4, 6, 4, 1]
    ir_size = 64
    lines = [
        "# synthetic set", "rate = 44100", "type = mono",
        f"points = {ir_size}", "radius = 0.09", "distance = 1.0",
        "azimuths = " + ", ".join(map(str, az_counts)),
    ]
    t = np.arange(ir_size)
    for ei in range(1, len(az_counts)):        # elevation 0 left missing
        for ai in range(az_counts[ei]):
            onset = 3 + (ei * 3 + ai) % 9
            ir = np.exp(-np.maximum(t - onset, 0) / 6.0) * (t >= onset)
            ir = ir * (0.4 + 0.1 * rng.standard_normal(ir_size))
            ir[onset] = 0.9
            name = f"e{ei}a{ai}.wav"
            _write_wav16(tmp_path / name, ir, RATE)
            lines.append(f'[ {ei}, {ai} ] = wave (0) : "./{name}"')
    (tmp_path / "set.def").write_text("\n".join(lines) + "\n")

    hset = makemhr.load_def(str(tmp_path / "set.def"))
    assert hset.channels == 1 and hset.ev_starts == [1]
    out = tmp_path / "set.mhr"
    makemhr.process_hrir_set(hset, str(out), fft_size=1024, trunc_size=32)

    st = hrtf.load_mhr(str(out))
    assert st.sample_rate == RATE
    assert list(st.elev_az_counts) == az_counts
    # The synthesized bottom pole carries real (nonzero) energy.
    assert np.abs(st.coeffs[0]).max() > 1e-3
    assert np.abs(st.coeffs).max() <= 1.0


def test_def_stereo_ascii_sources(tmp_path):
    """ascii(fp) sources with left/right ear tags build a stereo set
    (CIAIR.def style)."""
    az_counts = [1, 4, 1]
    ir_size = 32
    lines = ["rate = 44100", "type = stereo", f"points = {ir_size}",
             "distance = 1.4",
             "azimuths = " + ", ".join(map(str, az_counts))]
    rng = np.random.default_rng(13)
    n = 0
    for ei in range(len(az_counts)):
        for ai in range(az_counts[ei]):
            for tag in ("left", "right"):
                ir = rng.standard_normal(ir_size) * 0.3
                ir[4 + n % 7] = 0.8
                name = f"s{ei}_{ai}_{tag}.dat"
                (tmp_path / name).write_text(
                    " ".join(f"{v:.6f}" for v in ir))
                n += 1
            lines.append(
                f'[ {ei}, {ai} ] = ascii (fp) : "./s{ei}_{ai}_left.dat" '
                f'left + ascii (fp) : "./s{ei}_{ai}_right.dat" right')
    (tmp_path / "set.def").write_text("\n".join(lines) + "\n")
    hset = makemhr.load_def(str(tmp_path / "set.def"))
    assert hset.channels == 2 and hset.ev_starts == [0]
    out = tmp_path / "st.mhr"
    makemhr.process_hrir_set(hset, str(out), fft_size=512, trunc_size=16)
    st = hrtf.load_mhr(str(out))
    assert st.coeffs.shape[2] == 2
