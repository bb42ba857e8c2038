"""UHJ/TSME quality tiers vs the reference: FIR256/FIR512 decode + encode,
and the TSME Super Stereo decoder.

Covers the uhj/decode-filter, uhj/encode-filter, tsme/decode-filter and
tsme/encode-filter config keys (alc/alc.cpp:548-585) across
core/uhjfilter.cpp's three quality types and core/tsmefilter.cpp's decode
half.  The reference renders in a subprocess because it latches the config
at first library init.
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 48000
FRAMES = 4096


def _stereo_prog():
    t = np.arange(RATE // 2) / RATE
    left = 0.4 * np.sin(2 * np.pi * 441.0 * t)
    right = 0.3 * np.sin(2 * np.pi * 307.0 * t + 0.7)
    return np.stack([left, right], axis=1).ravel().astype(np.float32)


def _mono_tone():
    t = np.arange(RATE // 2) / RATE
    return (0.4 * np.sin(2 * np.pi * 441.0 * t)).astype(np.float32)


AL_FORMAT_UHJ2CHN_FLOAT32_SOFT = 0x19A4
# Super Stereo = a stereo buffer + AL_STEREO_MODE_SOFT source property
# (AL_SOFT_UHJ, alext.h).
AL_STEREO_MODE_SOFT = 0x19B0
AL_SUPER_STEREO_SOFT = 0x0001


def _render_ref(path, conf_text, fmt, data, super_stereo=False):
    conf = pathlib.Path(tempfile.mkstemp(suffix=".conf")[1])
    conf.write_text(conf_text)
    env = dict(os.environ, ALSOFT_CONF=str(conf))
    code = f"""
import sys
sys.path.insert(0, {json.dumps(str(pathlib.Path(__file__).parent.parent))})
import numpy as np
from tests import refdriver
from tests.test_e2e_codec_tiers import RATE, FRAMES, _stereo_prog, _mono_tone
ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
buf = ref.gen_buffer()
data = {"_stereo_prog()" if fmt != 0 else "_mono_tone()"}
fmt = {fmt if fmt else "refdriver.AL_FORMAT_MONO_FLOAT32"}
ref.buffer_data(buf, fmt, data, RATE)
src = ref.gen_source()
ref.source_i(src, refdriver.AL_BUFFER, buf)
ref.source_i(src, refdriver.AL_LOOPING, 1)
if {super_stereo}:
    ref.source_i(src, {AL_STEREO_MODE_SOFT}, {AL_SUPER_STEREO_SOFT})
ref.source_3f(src, refdriver.AL_POSITION, 0.4, 0.0, -1.0)
ref.play(src)
out = ref.render(FRAMES)
ref.close()
np.savez_compressed({json.dumps(str(path))}, out=out)
"""
    try:
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       timeout=300)
    finally:
        conf.unlink()


def _render_ours(conf_text, kind, data):
    from openal_soft_tpu.alc import config as alconf

    with tempfile.NamedTemporaryFile("w", suffix=".conf",
                                     delete=False) as fh:
        fh.write(conf_text)
        conf_path = fh.name
    old = os.environ.get("ALSOFT_CONF")
    os.environ["ALSOFT_CONF"] = conf_path
    alconf.load_config(reload=True)
    try:
        from openal_soft_tpu.alc.device import LoopbackDevice

        dev = LoopbackDevice(frequency=RATE, channels="stereo",
                             sample_type="float32", capacity=16)
        ctx = dev.create_context()
        buf = ctx.create_buffer()
        if kind == "uhj2":
            buf.set_data(data, "uhj2", "float32", RATE)
        elif kind == "ss":
            buf.set_data(data, "superstereo", "float32", RATE)
        else:
            buf.set_data(data, "mono", "float32", RATE)
        src = ctx.create_source()
        src.buffer(buf)
        src.looping = True
        src.set("position", (0.4, 0.0, -1.0))
        src.play()
        return dev.render_samples(FRAMES)
    finally:
        if old is None:
            del os.environ["ALSOFT_CONF"]
        else:
            os.environ["ALSOFT_CONF"] = old
        alconf.load_config(reload=True)
        os.unlink(conf_path)


def _compare(name, conf_text, kind, data, fmt, tol, super_stereo=False):
    from tests import refdriver

    path = GOLDEN / f"{name}.npz"
    if refdriver.available():
        GOLDEN.mkdir(exist_ok=True)
        _render_ref(path, conf_text, fmt, data, super_stereo)
    if not path.exists():
        pytest.skip("no reference library and no cached golden output")
    want = np.load(path)["out"]
    got = _render_ours(conf_text, kind, data)
    err = np.max(np.abs(got - want))
    assert err <= tol, f"max deviation {err:.3e} > {tol:g}"


@pytest.mark.parametrize("tier", ["fir256", "fir512"])
def test_uhj2_decode_fir(tier):
    _compare(f"uhj2_dec_{tier}", f"[uhj]\ndecode-filter = {tier}\n",
             "uhj2", _stereo_prog(), AL_FORMAT_UHJ2CHN_FLOAT32_SOFT, 1e-4)


@pytest.mark.parametrize("tier", ["fir256", "fir512"])
def test_uhj_output_encode_fir(tier):
    _compare(f"uhj_out_{tier}",
             f"stereo-encoding = uhj\n[uhj]\nencode-filter = {tier}\n",
             "mono", _mono_tone(), 0, 1e-4)


def test_super_stereo_tsme_decode():
    """Super Stereo decode through the TSME decoder (TSME output device)."""
    _compare("ss_tsme_dec_iir", "stereo-encoding = tsme\n",
             "ss", _stereo_prog(), refdriver_stereo_fmt(), 1e-4,
             super_stereo=True)


@pytest.mark.parametrize("tier", ["fir256"])
def test_tsme_output_encode_fir(tier):
    _compare(f"tsme_out_{tier}",
             f"stereo-encoding = tsme\n[tsme]\nencode-filter = {tier}\n",
             "mono", _mono_tone(), 0, 1e-4)


def refdriver_stereo_fmt():
    from tests import refdriver
    return refdriver.AL_FORMAT_STEREO_FLOAT32
