"""Custom ambdec decoder presets + distance compensation vs reference.

A dual-band FuMa 2D preset (matrix rows from the stock itu5.1 preset) with
unequal speaker distances drives a surround51 device through config
``decoder/surround51``, exercising: the .ambdec parser (core/ambdec.cpp),
MakeDecoderView channel mapping/ACN reindex (panning.cpp:396-541), the
custom dual-band decode, NFC-less InitNearFieldCtrl defaults, and
InitDistanceComp's per-speaker delay+gain (panning.cpp:301-360).
"""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 48000
FRAMES = 4096

AMBDEC = """\
# test preset (matrix rows from presets/itu5.1.ambdec)
/description     test_itu50
/version         3
/dec/chan_mask   11b
/dec/freq_bands  2
/dec/speakers    5
/dec/coeff_scale fuma
/opt/xover_freq  400.000000
/opt/xover_ratio 0.000000
/speakers/{
add_spkr 	LS	 2.000000	 110.000000	 0.000000
add_spkr 	LF	 1.500000	  30.000000	 0.000000
add_spkr 	CE	 1.800000	   0.000000	 0.000000
add_spkr 	RF	 1.500000	 -30.000000	 0.000000
add_spkr 	RS	 2.000000	-110.000000	 0.000000
/}
/lfmatrix/{
order_gain	1.000000	1.000000	1.000000	0.000000
add_row 	 4.9010985e-1  3.7730501e-1 -3.7310699e-1 -1.2591453e-1  1.4513300e-2
add_row 	 1.4908573e-1  3.0356168e-1  1.5329006e-1  2.4511248e-1 -1.5075313e-1
add_row 	 1.3765492e-1  0.0000000e+0  4.4941794e-1  0.0000000e+0  2.5784407e-1
add_row 	 1.4908573e-1 -3.0356168e-1  1.5329006e-1 -2.4511248e-1 -1.5075313e-1
add_row 	 4.9010985e-1 -3.7730501e-1 -3.7310699e-1  1.2591453e-1  1.4513300e-2
/}
/hfmatrix/{
order_gain	1.000000	1.000000	1.000000	0.000000
add_row 	 5.6731600e-1  4.2292000e-1 -3.1549500e-1 -6.3449000e-2 -2.9238000e-2
add_row 	 3.6858400e-1  2.7234900e-1  3.2161600e-1  1.9264500e-1  4.8260000e-2
add_row 	 1.8357900e-1  0.0000000e+0  1.9958800e-1  0.0000000e+0  9.6282000e-2
add_row 	 3.6858400e-1 -2.7234900e-1  3.2161600e-1 -1.9264500e-1  4.8260000e-2
add_row 	 5.6731600e-1 -4.2292000e-1 -3.1549500e-1  6.3449000e-2 -2.9238000e-2
/}
/end
"""


def _sources():
    t = np.arange(RATE // 2) / RATE
    return [
        {"data": (0.4 * np.sin(2 * np.pi * 441.0 * t)).astype(np.float32),
         "position": (1.0, 0.0, -2.0)},
        {"data": (0.3 * np.sin(2 * np.pi * 277.0 * t)).astype(np.float32),
         "position": (-2.0, 0.0, 1.0)},
    ]


def _write_conf(dirpath) -> str:
    preset = os.path.join(dirpath, "test51.ambdec")
    with open(preset, "w") as fh:
        fh.write(AMBDEC)
    conf = os.path.join(dirpath, "ambdec.conf")
    with open(conf, "w") as fh:
        fh.write(f"[decoder]\nsurround51 = {preset}\n")
    return conf


def _render_ref_subprocess(path: pathlib.Path, conf: str) -> None:
    env = dict(os.environ, ALSOFT_CONF=conf)
    code = f"""
import sys
sys.path.insert(0, {json.dumps(str(pathlib.Path(__file__).parent.parent))})
import numpy as np
from tests import refdriver
from tests.test_e2e_ambdec import _sources, RATE, FRAMES
ref = refdriver.RefLoopback(RATE, "surround51", "float32", hrtf=False)
for s in _sources():
    buf = ref.gen_buffer()
    ref.buffer_data(buf, refdriver.AL_FORMAT_MONO_FLOAT32, s["data"], RATE)
    src = ref.gen_source()
    ref.source_i(src, refdriver.AL_BUFFER, buf)
    ref.source_i(src, refdriver.AL_LOOPING, 1)
    ref.source_3f(src, refdriver.AL_POSITION, *s["position"])
    ref.play(src)
out = ref.render(FRAMES)
ref.close()
np.savez_compressed({json.dumps(str(path))}, out=out)
"""
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   timeout=300)


def _render_ours(conf: str) -> np.ndarray:
    from openal_soft_tpu.alc import config as alconf

    old = os.environ.get("ALSOFT_CONF")
    os.environ["ALSOFT_CONF"] = conf
    alconf.load_config(reload=True)
    try:
        from openal_soft_tpu.alc.device import LoopbackDevice

        dev = LoopbackDevice(frequency=RATE, channels="surround51",
                             sample_type="float32", capacity=16)
        assert dev._dist_comp is not None
        ctx = dev.create_context()
        for s in _sources():
            buf = ctx.create_buffer()
            buf.set_data(s["data"], "mono", "float32", RATE)
            src = ctx.create_source()
            src.buffer(buf)
            src.looping = True
            src.set("position", s["position"])
            src.play()
        return dev.render_samples(FRAMES)
    finally:
        if old is None:
            del os.environ["ALSOFT_CONF"]
        else:
            os.environ["ALSOFT_CONF"] = old
        alconf.load_config(reload=True)


def test_ambdec_custom_decoder(tmp_path):
    from tests import refdriver

    conf = _write_conf(str(tmp_path))
    path = GOLDEN / "ambdec_itu51.npz"
    if refdriver.available():
        GOLDEN.mkdir(exist_ok=True)
        _render_ref_subprocess(path, conf)
    if not path.exists():
        pytest.skip("no reference library and no cached golden output")
    want = np.load(path)["out"]
    got = _render_ours(conf)
    # The reference's distance-comp delay buffers are *uninitialized*
    # (FlexArray's `new T[size]`, common/flexarray.h:34): its first
    # `delay` samples per delayed channel are heap garbage.  We zero-fill;
    # compare after the longest delay (70 samples here) has flushed.
    err = np.max(np.abs(got[128:] - want[128:]))
    assert err <= 1.0e-4, f"max deviation {err:.3e}"
    assert np.max(np.abs(got[:128])) < 1.0  # ours is garbage-free


def test_ambdec_parser_fields(tmp_path):
    from openal_soft_tpu.core import ambdec
    from openal_soft_tpu.core.devformat import AmbiScaling, Channel
    from openal_soft_tpu.core.devformat import DevFmtChannels

    preset = tmp_path / "p.ambdec"
    preset.write_text(AMBDEC)
    conf = ambdec.load_ambdec(str(preset))
    assert conf.version == 3 and conf.freq_bands == 2
    assert conf.chan_mask == 0x11B
    assert conf.coeff_scale == AmbiScaling.FUMA
    assert [s.name for s in conf.speakers] == ["LS", "LF", "CE", "RF", "RS"]

    dec = ambdec.make_decoder(conf, DevFmtChannels.X51)
    assert dec.order == 2 and not dec.periphonic
    # X51 maps LS/RS names to side channels directly
    assert dec.channels == [Channel.SIDE_LEFT, Channel.FRONT_LEFT,
                            Channel.FRONT_CENTER, Channel.FRONT_RIGHT,
                            Channel.SIDE_RIGHT]
    assert dec.coeffs.shape == (5, 5)   # 2D order-2 -> 5 coeffs
    np.testing.assert_allclose(dec.speaker_dists,
                               [2.0, 1.5, 1.8, 1.5, 2.0])


AMBDEC_NOCENTER = """\
/description     test_itu50_nocenter
/version         3
/dec/chan_mask   11b
/dec/freq_bands  1
/dec/speakers    5
/dec/coeff_scale fuma
/opt/xover_freq  400.000000
/opt/xover_ratio 0.000000
/speakers/{
add_spkr    LS  1.000000   110.000000  0.000000
add_spkr    LF  1.000000    30.000000  0.000000
add_spkr    CE  1.000000     0.000000  0.000000
add_spkr    RF  1.000000   -30.000000  0.000000
add_spkr    RS  1.000000  -110.000000  0.000000
/}
/matrix/{
order_gain  1.00000000e+00 8.66025404e-01 5.00000000e-01 0.000000
add_row  4.70934222e-01  3.78169605e-01 -4.00084750e-01 -8.22264454e-02 -4.43765986e-02
add_row  2.66639870e-01  2.55418584e-01  3.32591390e-01  2.82949132e-01  8.16816772e-02
add_row  0.00000000e+00  0.00000000e+00  0.00000000e+00  0.00000000e+00  0.00000000e+00
add_row  2.66634915e-01 -2.55421639e-01  3.32586482e-01 -2.82947688e-01  8.16782588e-02
add_row  4.70935891e-01 -3.78173080e-01 -4.00080588e-01  8.22279700e-02 -4.43716394e-02
/}
/end
"""


def _write_conf_stab(dirpath) -> str:
    preset = os.path.join(dirpath, "nocenter.ambdec")
    with open(preset, "w") as fh:
        fh.write(AMBDEC_NOCENTER)
    conf = os.path.join(dirpath, "stab.conf")
    with open(conf, "w") as fh:
        fh.write(f"front-stablizer = true\n[decoder]\nsurround51 = {preset}\n")
    return conf


def test_front_stabilizer(tmp_path):
    """Front stabilizer (alu.cpp:329-405): no-center decoder + config on."""
    from tests import refdriver

    conf = _write_conf_stab(str(tmp_path))
    path = GOLDEN / "ambdec_stab.npz"
    if refdriver.available():
        GOLDEN.mkdir(exist_ok=True)
        _render_ref_subprocess(path, conf)
    if not path.exists():
        pytest.skip("no reference library and no cached golden output")
    want = np.load(path)["out"]

    from openal_soft_tpu.alc import config as alconf

    old = os.environ.get("ALSOFT_CONF")
    os.environ["ALSOFT_CONF"] = conf
    alconf.load_config(reload=True)
    try:
        from openal_soft_tpu.alc.device import LoopbackDevice

        dev = LoopbackDevice(frequency=RATE, channels="surround51",
                             sample_type="float32", capacity=16)
        assert dev._stab is not None
        ctx = dev.create_context()
        for s in _sources():
            buf = ctx.create_buffer()
            buf.set_data(s["data"], "mono", "float32", RATE)
            src = ctx.create_source()
            src.buffer(buf)
            src.looping = True
            src.set("position", s["position"])
            src.play()
        got = dev.render_samples(FRAMES)
    finally:
        if old is None:
            del os.environ["ALSOFT_CONF"]
        else:
            os.environ["ALSOFT_CONF"] = old
        alconf.load_config(reload=True)
    err = np.max(np.abs(got - want))
    assert err <= 1.0e-4, f"max deviation {err:.3e}"
    # center channel actually receives stabilized content
    ci = 2  # FC position in the surround51 interleave
    assert np.abs(got[:, ci]).max() > 1e-4
