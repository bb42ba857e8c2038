"""UHJ stereo output encoding vs reference (stereo-encoding=uhj).

Covers InitUhjPanning's FuMa2D FOA bus (panning.cpp:1140-1162) and the
default IIR UhjEncoder (uhjfilter.cpp:231-277) as the output post-process.
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


def _sources():
    t = np.arange(RATE // 2) / RATE
    return [
        {"data": (0.4 * np.sin(2 * np.pi * 441.0 * t)).astype(np.float32),
         "position": (1.0, 0.0, -2.0)},
        {"data": (0.25 * np.sin(2 * np.pi * 307.0 * t)).astype(np.float32),
         "position": (-1.5, 0.0, 0.5)},
    ]


def _render_ref_subprocess(path: pathlib.Path) -> None:
    conf = path.parent / f"{path.stem}.conf"
    conf.write_text("stereo-encoding = uhj\n")
    env = dict(os.environ, ALSOFT_CONF=str(conf))
    code = f"""
import sys
sys.path.insert(0, {json.dumps(str(pathlib.Path(__file__).parent.parent))})
import numpy as np
from tests import refdriver
from tests.test_e2e_uhj_out import _sources, RATE, FRAMES
ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
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
    conf.unlink()


def _render_ours() -> np.ndarray:
    import tempfile

    from openal_soft_tpu.alc import config as alconf

    with tempfile.NamedTemporaryFile("w", suffix=".conf", delete=False) as fh:
        fh.write("stereo-encoding = uhj\n")
        conf_path = fh.name
    old = os.environ.get("ALSOFT_CONF")
    os.environ["ALSOFT_CONF"] = conf_path
    alconf.load_config(reload=True)
    try:
        from openal_soft_tpu.alc.device import LoopbackDevice

        dev = LoopbackDevice(frequency=RATE, channels="stereo",
                             sample_type="float32", capacity=16)
        assert dev.layout.uhj_output
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
        os.unlink(conf_path)


def test_uhj_stereo_output():
    from tests import refdriver

    path = GOLDEN / "uhj_out.npz"
    if refdriver.available():
        GOLDEN.mkdir(exist_ok=True)
        _render_ref_subprocess(path)
    if not path.exists():
        pytest.skip("no reference library and no cached golden output")
    want = np.load(path)["out"]
    got = _render_ours()
    err = np.max(np.abs(got - want))
    assert err <= 1.0e-4, f"max deviation {err:.3e}"


def _render_ref_tsme(path: pathlib.Path) -> None:
    conf = path.parent / f"{path.stem}.conf"
    conf.write_text("stereo-encoding = tsme\n")
    env = dict(os.environ, ALSOFT_CONF=str(conf))
    code = f"""
import sys
sys.path.insert(0, {json.dumps(str(pathlib.Path(__file__).parent.parent))})
import numpy as np
from tests import refdriver
from tests.test_e2e_uhj_out import _sources, RATE, FRAMES
ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
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
    conf.unlink()


def test_tsme_stereo_output():
    """TSME output encoding (tsmefilter.cpp:280-329, panning.cpp:1164)."""
    import tempfile

    from tests import refdriver

    path = GOLDEN / "tsme_out.npz"
    if refdriver.available():
        GOLDEN.mkdir(exist_ok=True)
        _render_ref_tsme(path)
    if not path.exists():
        pytest.skip("no reference library and no cached golden output")
    want = np.load(path)["out"]

    from openal_soft_tpu.alc import config as alconf

    with tempfile.NamedTemporaryFile("w", suffix=".conf", delete=False) as fh:
        fh.write("stereo-encoding = tsme\n")
        conf_path = fh.name
    old = os.environ.get("ALSOFT_CONF")
    os.environ["ALSOFT_CONF"] = conf_path
    alconf.load_config(reload=True)
    try:
        from openal_soft_tpu.alc.device import LoopbackDevice

        dev = LoopbackDevice(frequency=RATE, channels="stereo",
                             sample_type="float32", capacity=16)
        assert dev.layout.tsme_output
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
        os.unlink(conf_path)
    err = np.max(np.abs(got - want))
    assert err <= 1.0e-4, f"max deviation {err:.3e}"
