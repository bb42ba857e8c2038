"""Config-key parity: alsoftrc.sample vs the keys the code actually reads.

The sample's contract is "every key this implementation reads, with its
default" (reference doc: /root/reference/alsoftrc.sample, reader:
alc/alconfig.cpp).  The round-trip test scans the package source for
config_value_* call sites and asserts the documented and honored sets
agree; the functional tests exercise a slice of the newly wired keys.
"""

import os
import pathlib
import re
import tempfile

import pytest

REPO = pathlib.Path(__file__).parent.parent
PKG = REPO / "openal_soft_tpu"

# Call sites whose key argument is a variable (layout names, codec tiers)
# — enumerated by hand; keep in sync with the code.
DYNAMIC_KEYS = {
    ("decoder", "quad"), ("decoder", "surround51"), ("decoder", "surround61"),
    ("decoder", "surround71"), ("decoder", "surround714"),
    ("decoder", "surround7144"), ("decoder", "3d71"),
    ("uhj", "decode-filter"), ("uhj", "encode-filter"),
    ("tsme", "decode-filter"), ("tsme", "encode-filter"),
}
# Documented keys that gate behavior but have no config_value_* literal
# (doc-only pseudo keys).
DOC_ONLY = set()


def sample_keys() -> set:
    keys = set()
    section = ""
    for line in (REPO / "alsoftrc.sample").read_text().splitlines():
        line = line.strip()
        m = re.match(r"^\[([a-z_0-9]+)\]$", line)
        if m:
            section = m.group(1)
            if section == "general":
                section = ""
            continue
        m = re.match(r"^#([a-z_0-9][\w-]*)\s*=", line)
        if m and not line.startswith("##"):
            keys.add((section, m.group(1)))
    return keys


def honored_keys() -> set:
    keys = set(DYNAMIC_KEYS)
    pat = re.compile(
        r'config_value_(?:str|int|float|bool)\(\s*"([^"]*)"\s*,\s*"([^"]+)"')
    for path in PKG.rglob("*.py"):
        for block, key in pat.findall(path.read_text()):
            keys.add((block, key))
    return keys


def test_sample_documents_every_honored_key():
    missing = honored_keys() - sample_keys() - DOC_ONLY
    assert not missing, f"keys read but undocumented: {sorted(missing)}"


def test_sample_has_no_phantom_keys():
    phantom = sample_keys() - honored_keys() - DOC_ONLY
    assert not phantom, f"keys documented but never read: {sorted(phantom)}"


def test_sample_key_count():
    assert len(sample_keys()) >= 45


# --- functional slices --------------------------------------------------------

@pytest.fixture
def conf(monkeypatch):
    """Write a config file, point ALSOFT_CONF at it, reload."""
    from openal_soft_tpu.alc import config as alconf

    created = []

    def apply(text: str):
        fh = tempfile.NamedTemporaryFile("w", suffix=".conf", delete=False)
        fh.write(text)
        fh.close()
        created.append(fh.name)
        monkeypatch.setenv("ALSOFT_CONF", fh.name)
        alconf.load_config(reload=True)

    yield apply
    for p in created:
        os.unlink(p)
    monkeypatch.delenv("ALSOFT_CONF", raising=False)
    alconf.load_config(reload=True)


def test_resampler_key(conf):
    from openal_soft_tpu.constants import Resampler
    from openal_soft_tpu.core.voice import VoiceProps, default_resampler

    conf("resampler = bsinc24\n")
    assert default_resampler() == Resampler.BSINC24
    assert VoiceProps().resampler == Resampler.BSINC24
    conf("resampler = nonsense\n")
    assert default_resampler() == Resampler.SPLINE


def test_excludefx_key(conf):
    from openal_soft_tpu.al.effect import Effect

    conf("excludefx = eaxreverb,pshifter\n")
    with pytest.raises(ValueError):
        Effect(1, "eaxreverb")
    with pytest.raises(ValueError):
        Effect(2, "pitch_shifter")
    Effect(3, "reverb")        # not excluded
    conf("")
    Effect(4, "eaxreverb")


def test_reverb_boost_key(conf):
    from openal_soft_tpu.effects.reverb import _reverb_boost

    conf("[reverb]\nboost = 6.0\n")
    assert abs(_reverb_boost() - 10.0 ** 0.3) < 1e-6
    conf("")
    assert _reverb_boost() == 1.0


def test_eax_enable_key(conf):
    from openal_soft_tpu.al import api

    conf("[eax]\nenable = false\n")
    assert not api.alIsExtensionPresent("EAX5.0")
    conf("")
    assert api.alIsExtensionPresent("EAX5.0")


def test_slots_limit_key(conf):
    from openal_soft_tpu.al.error import ALError
    from openal_soft_tpu.alc.device import LoopbackDevice

    conf("slots = 2\n")
    dev = LoopbackDevice(frequency=48000, channels="stereo",
                         sample_type="float32", capacity=16)
    ctx = dev.create_context()
    ctx.create_aux_slot()
    ctx.create_aux_slot()
    with pytest.raises(ALError):
        ctx.create_aux_slot()


def test_output_stage_keys(conf):
    from openal_soft_tpu.alc.device import LoopbackDevice

    conf("dither = false\nvolume-adjust = -6\noutput-limiter = false\n")
    dev = LoopbackDevice(frequency=48000, channels="stereo",
                         sample_type="int16", capacity=16)
    assert dev.dither is None
    assert dev.limiter is None
    assert abs(dev._volume_scale - 10.0 ** (-6.0 / 20.0)) < 1e-6
    conf("dither-depth = 12\n")
    dev2 = LoopbackDevice(frequency=48000, channels="stereo",
                          sample_type="int16", capacity=16)
    assert dev2.dither is not None
    assert float(dev2.dither.quant_scale) == float(1 << 11)
    assert dev2.limiter is not None


def test_sources_key(conf):
    from openal_soft_tpu.alc import lifecycle

    conf("sources = 100\n")
    dev = lifecycle.PlaybackDevice(lifecycle.NULL_DEVICE_NAME)
    try:
        assert dev.render.capacity == 112      # rounded to the kernel grain
    finally:
        dev.close()
