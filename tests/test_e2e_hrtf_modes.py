"""hrtf-mode=ambiN: normal panning onto an order-N bus, baked HRIR decode.

Config-gated like NFC (panning.cpp:1062-1094), so goldens render in a
subprocess with ALSOFT_CONF; covers the 2nd/3rd-order t-design bakes
(AmbiPoints/Matrix/HFGain 2O/3O) and the perHrirMin behavior at order 3.
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
         "position": (1.0, 0.5, -2.0)},
        {"data": (0.3 * np.sin(2 * np.pi * 333.0 * t)).astype(np.float32),
         "position": (-2.0, -0.3, -0.5)},
    ]


def _render_ref_subprocess(path: pathlib.Path, mode: str) -> None:
    conf = path.parent / f"{path.stem}.conf"
    conf.write_text(f"hrtf-mode = {mode}\n")
    env = dict(os.environ, ALSOFT_CONF=str(conf))
    code = f"""
import sys
sys.path.insert(0, {json.dumps(str(pathlib.Path(__file__).parent.parent))})
import numpy as np
from tests import refdriver
from tests.test_e2e_hrtf_modes import _sources, RATE, FRAMES
ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=True)
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


def _render_ours(mode: str) -> np.ndarray:
    import tempfile

    from openal_soft_tpu.alc import config as alconf

    with tempfile.NamedTemporaryFile("w", suffix=".conf", delete=False) as fh:
        fh.write(f"hrtf-mode = {mode}\n")
        conf_path = fh.name
    old = os.environ.get("ALSOFT_CONF")
    os.environ["ALSOFT_CONF"] = conf_path
    alconf.load_config(reload=True)
    try:
        from openal_soft_tpu.alc.device import LoopbackDevice

        dev = LoopbackDevice(frequency=RATE, channels="stereo",
                             sample_type="float32", capacity=16, hrtf=True)
        assert dev.layout.hrtf_full is False
        assert dev.layout.ambi_order == int(mode[-1])
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


@pytest.mark.parametrize("mode", ["ambi2", "ambi3"])
def test_hrtf_ambi_mode(mode):
    from tests import refdriver

    path = GOLDEN / f"hrtf_{mode}.npz"
    if refdriver.available():
        GOLDEN.mkdir(exist_ok=True)
        _render_ref_subprocess(path, mode)
    if not path.exists():
        pytest.skip("no reference library and no cached golden output")
    want = np.load(path)["out"]
    got = _render_ours(mode)
    err = np.max(np.abs(got - want))
    assert err <= 1.0e-4, f"max deviation {err:.3e}"
