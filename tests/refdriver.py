"""ctypes driver for the reference OpenAL Soft built on CPU.

Renders golden outputs through the reference's loopback device
(alcLoopbackOpenDeviceSOFT / alcRenderSamplesSOFT) for bit-comparison
against the TPU build.  Used at golden-generation time only; generated
vectors are cached under tests/golden/ so CI does not require the
reference build.
"""

from __future__ import annotations

import ctypes as ct
import os

REF_LIB = os.environ.get("OPENAL_REF_LIB", "/tmp/refbuild/libopenal.so")

ALC_FORMAT_CHANNELS_SOFT = 0x1990
ALC_FORMAT_TYPE_SOFT = 0x1991
ALC_FREQUENCY = 0x1007
ALC_MONO_SOURCES = 0x1010
ALC_STEREO_SOURCES = 0x1011
ALC_HRTF_SOFT = 0x1992

ALC_MONO_SOFT = 0x1500
ALC_STEREO_SOFT = 0x1501
ALC_QUAD_SOFT = 0x1503
ALC_5POINT1_SOFT = 0x1504
ALC_6POINT1_SOFT = 0x1505
ALC_7POINT1_SOFT = 0x1506

ALC_BFORMAT3D_SOFT = 0x1507
ALC_AMBISONIC_LAYOUT_SOFT = 0x1997
ALC_AMBISONIC_SCALING_SOFT = 0x1998
ALC_AMBISONIC_ORDER_SOFT = 0x1999
ALC_ACN_SOFT = 0x0001
ALC_N3D_SOFT = 0x0002

ALC_BYTE_SOFT = 0x1400
ALC_UNSIGNED_BYTE_SOFT = 0x1401
ALC_SHORT_SOFT = 0x1402
ALC_INT_SOFT = 0x1404
ALC_FLOAT_SOFT = 0x1406

AL_FORMAT_MONO8 = 0x1100
AL_FORMAT_MONO16 = 0x1101
AL_FORMAT_STEREO8 = 0x1102
AL_FORMAT_STEREO16 = 0x1103
AL_FORMAT_MONO_FLOAT32 = 0x10010
AL_FORMAT_STEREO_FLOAT32 = 0x10011

AL_BUFFER = 0x1009
AL_LOOPING = 0x1007
AL_GAIN = 0x100A
AL_PITCH = 0x1003
AL_POSITION = 0x1004
AL_VELOCITY = 0x1006
AL_DIRECTION = 0x1005
AL_ORIENTATION = 0x100F
AL_SOURCE_RELATIVE = 0x202
AL_REFERENCE_DISTANCE = 0x1020
AL_ROLLOFF_FACTOR = 0x1021
AL_MAX_DISTANCE = 0x1023
AL_CONE_INNER_ANGLE = 0x1001
AL_CONE_OUTER_ANGLE = 0x1002
AL_CONE_OUTER_GAIN = 0x1022
AL_SOURCE_SPATIALIZE_SOFT = 0x1214

# EFX
AL_FILTER_TYPE = 0x8001
AL_FILTER_LOWPASS = 0x0001
AL_FILTER_HIGHPASS = 0x0002
AL_LOWPASS_GAIN = 0x0001
AL_LOWPASS_GAINHF = 0x0002
AL_HIGHPASS_GAIN = 0x0001
AL_HIGHPASS_GAINLF = 0x0002
AL_DIRECT_FILTER = 0x20005
AL_AUXILIARY_SEND_FILTER = 0x20006
AL_EFFECT_TYPE = 0x8001
AL_EFFECTSLOT_EFFECT = 0x0001

_CHANNELS = {"mono": ALC_MONO_SOFT, "stereo": ALC_STEREO_SOFT,
             "quad": ALC_QUAD_SOFT, "surround51": ALC_5POINT1_SOFT,
             "surround61": ALC_6POINT1_SOFT, "surround71": ALC_7POINT1_SOFT}
_CHANNEL_COUNTS = {"mono": 1, "stereo": 2, "quad": 4, "surround51": 6,
                   "surround61": 7, "surround71": 8}
_TYPES = {"float32": ALC_FLOAT_SOFT, "int16": ALC_SHORT_SOFT,
          "uint8": ALC_UNSIGNED_BYTE_SOFT, "int32": ALC_INT_SOFT}


def available() -> bool:
    return os.path.exists(REF_LIB)


class RefLoopback:
    """Reference loopback render device."""

    def __init__(self, frequency: int, channels: str = "stereo",
                 sample_type: str = "float32", hrtf: bool | None = None,
                 ambi_order: int = 1):
        self.al = ct.CDLL(REF_LIB)
        al = self.al
        al.alcLoopbackOpenDeviceSOFT.restype = ct.c_void_p
        al.alcLoopbackOpenDeviceSOFT.argtypes = [ct.c_char_p]
        al.alcCreateContext.restype = ct.c_void_p
        al.alcCreateContext.argtypes = [ct.c_void_p, ct.POINTER(ct.c_int)]
        al.alcMakeContextCurrent.argtypes = [ct.c_void_p]
        al.alcRenderSamplesSOFT.argtypes = [ct.c_void_p, ct.c_void_p, ct.c_int]
        al.alGenBuffers.argtypes = [ct.c_int, ct.POINTER(ct.c_uint)]
        al.alGenSources.argtypes = [ct.c_int, ct.POINTER(ct.c_uint)]
        al.alBufferData.argtypes = [ct.c_uint, ct.c_int, ct.c_void_p, ct.c_int, ct.c_int]

        self.dev = al.alcLoopbackOpenDeviceSOFT(None)
        assert self.dev, "failed to open reference loopback device"
        if channels == "ambi3d":
            attrs = [ALC_FORMAT_CHANNELS_SOFT, ALC_BFORMAT3D_SOFT,
                     ALC_AMBISONIC_LAYOUT_SOFT, ALC_ACN_SOFT,
                     ALC_AMBISONIC_SCALING_SOFT, ALC_N3D_SOFT,
                     ALC_AMBISONIC_ORDER_SOFT, ambi_order,
                     ALC_FORMAT_TYPE_SOFT, _TYPES[sample_type],
                     ALC_FREQUENCY, frequency]
            n_channels = (ambi_order + 1) ** 2
        else:
            attrs = [ALC_FORMAT_CHANNELS_SOFT, _CHANNELS[channels],
                     ALC_FORMAT_TYPE_SOFT, _TYPES[sample_type],
                     ALC_FREQUENCY, frequency]
            n_channels = _CHANNEL_COUNTS[channels]
        if hrtf is not None:
            attrs += [ALC_HRTF_SOFT, int(hrtf)]
        attrs += [0]
        arr = (ct.c_int * len(attrs))(*attrs)
        self.ctx = al.alcCreateContext(self.dev, arr)
        assert self.ctx, "failed to create reference context"
        al.alcMakeContextCurrent(self.ctx)
        self.frequency = frequency
        self.n_channels = n_channels
        self.sample_type = sample_type

    def gen_buffer(self) -> int:
        b = ct.c_uint()
        self.al.alGenBuffers(1, ct.byref(b))
        return b.value

    def buffer_data(self, buf: int, fmt: int, data, freq: int) -> None:
        import numpy as np

        arr = np.ascontiguousarray(data)
        self.al.alBufferData(buf, fmt, arr.ctypes.data_as(ct.c_void_p),
                             arr.nbytes, freq)

    def gen_source(self) -> int:
        s = ct.c_uint()
        self.al.alGenSources(1, ct.byref(s))
        return s.value

    def source_i(self, src: int, param: int, value: int) -> None:
        self.al.alSourcei(src, param, value)

    def source_f(self, src: int, param: int, value: float) -> None:
        self.al.alSourcef(src, param, ct.c_float(value))

    def source_3f(self, src: int, param: int, x, y, z) -> None:
        self.al.alSource3f(src, param, ct.c_float(x), ct.c_float(y), ct.c_float(z))

    def listener_f(self, param: int, value: float) -> None:
        self.al.alListenerf(param, ct.c_float(value))

    def listener_3f(self, param: int, x, y, z) -> None:
        self.al.alListener3f(param, ct.c_float(x), ct.c_float(y), ct.c_float(z))

    def listener_fv(self, param: int, values) -> None:
        arr = (ct.c_float * len(values))(*values)
        self.al.alListenerfv(param, arr)

    def gen_filter(self) -> int:
        f = ct.c_uint()
        self.al.alGenFilters(1, ct.byref(f))
        return f.value

    def filter_i(self, flt: int, param: int, value: int) -> None:
        self.al.alFilteri(flt, param, value)

    def filter_f(self, flt: int, param: int, value: float) -> None:
        self.al.alFilterf(flt, param, ct.c_float(value))

    def lowpass_direct(self, src: int, gain: float, gainhf: float) -> None:
        """Attach a lowpass direct filter to a source."""
        flt = self.gen_filter()
        self.filter_i(flt, AL_FILTER_TYPE, AL_FILTER_LOWPASS)
        self.filter_f(flt, AL_LOWPASS_GAIN, gain)
        self.filter_f(flt, AL_LOWPASS_GAINHF, gainhf)
        self.source_i(src, AL_DIRECT_FILTER, flt)

    def play(self, src: int) -> None:
        self.al.alSourcePlay(src)

    def render(self, num_frames: int):
        import numpy as np

        dtype = {"float32": np.float32, "int16": np.int16,
                 "uint8": np.uint8, "int32": np.int32}[self.sample_type]
        out = np.empty((num_frames, self.n_channels), dtype)
        self.al.alcRenderSamplesSOFT(self.dev, out.ctypes.data_as(ct.c_void_p),
                                     num_frames)
        return out

    def close(self) -> None:
        self.al.alcMakeContextCurrent(None)
        self.al.alcDestroyContext.argtypes = [ct.c_void_p]
        self.al.alcCloseDevice.argtypes = [ct.c_void_p]
        self.al.alcDestroyContext(self.ctx)
        self.al.alcCloseDevice(self.dev)


AL_EFFECT_NULL = 0x0000
AL_EFFECT_REVERB = 0x0001
AL_EFFECT_CHORUS = 0x0002
AL_EFFECT_DISTORTION = 0x0003
AL_EFFECT_ECHO = 0x0004
AL_EFFECT_FLANGER = 0x0005
AL_EFFECT_RING_MODULATOR = 0x0009
AL_EFFECT_EQUALIZER = 0x000C
AL_EFFECT_EAXREVERB = 0x8000
AL_ECHO_DELAY = 0x0001
AL_ECHO_LRDELAY = 0x0002
AL_ECHO_DAMPING = 0x0003
AL_ECHO_FEEDBACK = 0x0004
AL_ECHO_SPREAD = 0x0005
AL_EFFECTSLOT_GAIN = 0x0002


def efx_slot_with_effect(ref, effect_type: int, fprops: dict):
    """Create (slot, effect) on the reference, set float props, attach."""
    import ctypes as ct

    eff = ct.c_uint()
    ref.al.alGenEffects(1, ct.byref(eff))
    ref.al.alEffecti(eff, AL_EFFECT_TYPE, effect_type)
    for param, value in fprops.items():
        ref.al.alEffectf(eff, param, ct.c_float(value))
    slot = ct.c_uint()
    ref.al.alGenAuxiliaryEffectSlots(1, ct.byref(slot))
    ref.al.alAuxiliaryEffectSloti(slot, AL_EFFECTSLOT_EFFECT, eff.value)
    return slot.value, eff.value


def attach_send(ref, src: int, slot: int, send: int = 0):
    ref.al.alSource3i(src, AL_AUXILIARY_SEND_FILTER, slot, send, 0)
