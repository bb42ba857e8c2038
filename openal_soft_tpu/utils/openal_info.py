"""Device/extension lister (utils/openal-info.c analog) — smoke tool.

Run: python -m openal_soft_tpu.utils.openal_info
"""

from __future__ import annotations


def main() -> None:
    import jax

    from .. import __version__
    from ..alc.device import LoopbackDevice
    from ..effects import effect_registry
    from ..ops import tables

    print(f"openal_soft_tpu {__version__}")
    print(f"jax backend: {jax.default_backend()}, devices: {jax.devices()}")
    dev = LoopbackDevice(frequency=48000, channels="stereo", capacity=16)
    print(f"default output: {dev.sample_rate} Hz, {dev.fmt_channels.value}, "
          f"render mode {dev.layout.mode.value}")
    print(f"dry bus channels: {dev.n_dry} (ambi order {dev.layout.ambi_order})")
    print("resamplers:", ", ".join(
        n for n in ("point", "linear", "spline", "gaussian", "bsinc12",
                    "fast_bsinc12", "bsinc24", "fast_bsinc24", "bsinc48",
                    "fast_bsinc48")))
    print("effects:", ", ".join(sorted(effect_registry)))
    from ..al import api
    from ..core import hrtf as hrtf_mod

    print("AL extensions:", api.alGetString(api.AL_EXTENSIONS))
    print("ALC extensions:", api.alcGetString(None, api.ALC_EXTENSIONS))
    sets = hrtf_mod.enumerate_hrtf()
    print(f"hrtf data sets ({len(sets)}):",
          ", ".join(n for n, _ in sets) or "(none)")
    hdev = LoopbackDevice(frequency=48000, channels="stereo", hrtf=True,
                          capacity=16)
    hs = hdev.hrtf_store
    print(f"hrtf: {hs.sample_rate} Hz, irSize {hs.ir_size}, "
          f"{len(hs.field_distances)} field(s), {hs.coeffs.shape[0]} HRIRs")
    from ..al.presets import REVERB_PRESETS
    print(f"reverb presets: {len(REVERB_PRESETS)}")


if __name__ == "__main__":
    main()
