"""AL/ALC-named function API over the object layer.

Provides the classic C-style entry points (alGenSources, alSourcei,
alSourcePlay, alcLoopbackOpenDeviceSOFT, alcRenderSamplesSOFT, ...) against
a current-context model, mirroring the export surface of al/*.cpp and
alc/alc.cpp so reference-oriented code ports line by line.  Integer object
ids map to the context's object stores; enums carry the AL numeric values.
"""

from __future__ import annotations

import threading

import numpy as np

from ..alc.device import LoopbackDevice
from ..core.voice import DistanceModel

# --- AL enums (al/alc headers) ----------------------------------------------
AL_NONE = 0
AL_FALSE, AL_TRUE = 0, 1
AL_SOURCE_RELATIVE = 0x202
AL_CONE_INNER_ANGLE = 0x1001
AL_CONE_OUTER_ANGLE = 0x1002
AL_PITCH = 0x1003
AL_POSITION = 0x1004
AL_DIRECTION = 0x1005
AL_VELOCITY = 0x1006
AL_LOOPING = 0x1007
AL_BUFFER = 0x1009
AL_GAIN = 0x100A
AL_MIN_GAIN = 0x100D
AL_MAX_GAIN = 0x100E
AL_ORIENTATION = 0x100F
AL_SOURCE_STATE = 0x1010
AL_INITIAL, AL_PLAYING, AL_PAUSED, AL_STOPPED = 0x1011, 0x1012, 0x1013, 0x1014
AL_REFERENCE_DISTANCE = 0x1020
AL_ROLLOFF_FACTOR = 0x1021
AL_CONE_OUTER_GAIN = 0x1022
AL_MAX_DISTANCE = 0x1023
AL_SEC_OFFSET = 0x1024
AL_SAMPLE_OFFSET = 0x1025
AL_BYTE_OFFSET = 0x1026
AL_SOURCE_TYPE = 0x1027

AL_FORMAT_MONO8 = 0x1100
AL_FORMAT_MONO16 = 0x1101
AL_FORMAT_STEREO8 = 0x1102
AL_FORMAT_STEREO16 = 0x1103
AL_FORMAT_MONO_FLOAT32 = 0x10010
AL_FORMAT_STEREO_FLOAT32 = 0x10011

AL_INVERSE_DISTANCE = 0xD001
AL_INVERSE_DISTANCE_CLAMPED = 0xD002
AL_LINEAR_DISTANCE = 0xD003
AL_LINEAR_DISTANCE_CLAMPED = 0xD004
AL_EXPONENT_DISTANCE = 0xD005
AL_EXPONENT_DISTANCE_CLAMPED = 0xD006

AL_DIRECT_FILTER = 0x20005
AL_AUXILIARY_SEND_FILTER = 0x20006

_FORMATS = {
    AL_FORMAT_MONO8: ("mono", "uint8"),
    AL_FORMAT_MONO16: ("mono", "int16"),
    AL_FORMAT_STEREO8: ("stereo", "uint8"),
    AL_FORMAT_STEREO16: ("stereo", "int16"),
    AL_FORMAT_MONO_FLOAT32: ("mono", "float32"),
    AL_FORMAT_STEREO_FLOAT32: ("stereo", "float32"),
}

_DIST_MODELS = {
    AL_NONE: DistanceModel.DISABLE,
    AL_INVERSE_DISTANCE: DistanceModel.INVERSE,
    AL_INVERSE_DISTANCE_CLAMPED: DistanceModel.INVERSE_CLAMPED,
    AL_LINEAR_DISTANCE: DistanceModel.LINEAR,
    AL_LINEAR_DISTANCE_CLAMPED: DistanceModel.LINEAR_CLAMPED,
    AL_EXPONENT_DISTANCE: DistanceModel.EXPONENT,
    AL_EXPONENT_DISTANCE_CLAMPED: DistanceModel.EXPONENT_CLAMPED,
}

_tls = threading.local()


def _ctx():
    ctx = getattr(_tls, "context", None)
    if ctx is None:
        raise RuntimeError("no current context (alcMakeContextCurrent)")
    return ctx


# --- ALC ----------------------------------------------------------------------

def alcLoopbackOpenDeviceSOFT(frequency: int = 48000, channels: str = "stereo",
                              sample_type: str = "float32", **kw) -> LoopbackDevice:
    return LoopbackDevice(frequency=frequency, channels=channels,
                          sample_type=sample_type, **kw)


def alcCreateContext(device: LoopbackDevice, attrs=None):
    return device.create_context()


def alcMakeContextCurrent(context) -> None:
    _tls.context = context


def alcGetCurrentContext():
    return getattr(_tls, "context", None)


def alcRenderSamplesSOFT(device: LoopbackDevice, num_frames: int) -> np.ndarray:
    return device.render_samples(num_frames)


def alcCaptureOpenDevice(backend, frequency: int, fmt: int, samples: int):
    """alc.cpp:3175: a capture device over a pull-model backend.

    ``backend`` replaces the OS device name: an ArrayCaptureBackend /
    WavCaptureBackend (alc/capture.py) acting as the microphone stream."""
    from ..alc.capture import CaptureDevice

    channels, styp = _FORMATS[fmt]
    return CaptureDevice(backend, frequency, channels, styp,
                         buffer_frames=samples)


def alcCaptureCloseDevice(device) -> None:
    device.close()


def alcCaptureStart(device) -> None:
    device.start()


def alcCaptureStop(device) -> None:
    device.stop()


def alcCaptureSamples(device, samples: int) -> np.ndarray:
    return device.capture_samples(samples)


# --- buffers ------------------------------------------------------------------

def alGenBuffers(n: int = 1):
    ids = [(_ctx().create_buffer()).id for _ in range(n)]
    return ids[0] if n == 1 else ids


def alBufferData(bid: int, fmt: int, data, freq: int) -> None:
    channels, styp = _FORMATS[fmt]
    _ctx().buffers[bid].set_data(np.asarray(data), channels, styp, freq)


def alBufferCallbackSOFT(bid: int, fmt: int, freq: int, callback) -> None:
    """AL_SOFT_callback_buffer: ``callback(frames) -> samples`` streams the
    buffer on demand; a short return ends the stream (al/buffer.cpp:874)."""
    channels, styp = _FORMATS[fmt]
    _ctx().buffers[bid].set_callback(callback, channels, styp, freq)


def alBufferDataRaw(bid: int, fmt: int, data: bytes, freq: int) -> None:
    """C-ABI variant: raw little-endian sample bytes (native/alc_shim.cpp)."""
    channels, styp = _FORMATS[fmt]
    dtype = {"uint8": np.uint8, "int16": np.int16,
             "float32": np.float32}[styp]
    _ctx().buffers[bid].set_data(np.frombuffer(data, dtype), channels,
                                 styp, freq)


# --- sources ------------------------------------------------------------------

def alGenSources(n: int = 1):
    ids = [(_ctx().create_source()).id for _ in range(n)]
    return ids[0] if n == 1 else ids


_SOURCE_F = {
    AL_PITCH: "pitch", AL_GAIN: "gain", AL_MIN_GAIN: "min_gain",
    AL_MAX_GAIN: "max_gain", AL_REFERENCE_DISTANCE: "ref_distance",
    AL_ROLLOFF_FACTOR: "rolloff_factor", AL_MAX_DISTANCE: "max_distance",
    AL_CONE_INNER_ANGLE: "inner_angle", AL_CONE_OUTER_ANGLE: "outer_angle",
    AL_CONE_OUTER_GAIN: "outer_gain",
}
_SOURCE_3F = {AL_POSITION: "position", AL_VELOCITY: "velocity",
              AL_DIRECTION: "direction"}


def alSourcef(sid: int, param: int, value: float) -> None:
    _ctx().sources[sid].set(_SOURCE_F[param], float(value))


def alSource3f(sid: int, param: int, x: float, y: float, z: float) -> None:
    _ctx().sources[sid].set(_SOURCE_3F[param], (float(x), float(y), float(z)))


def alSourcei(sid: int, param: int, value: int) -> None:
    ctx = _ctx()
    src = ctx.sources[sid]
    if param == AL_BUFFER:
        src.buffer(ctx.buffers[value] if value else None)
    elif param == AL_LOOPING:
        src.looping = bool(value)
    elif param == AL_SOURCE_RELATIVE:
        src.set("head_relative", bool(value))
    elif param == AL_DIRECT_FILTER:
        src.direct_filter(ctx.filters.get(value))
    elif param == AL_SAMPLE_OFFSET:
        src.offset = int(value)
    else:
        raise ValueError(f"alSourcei param {param:#x}")


def alSource3i(sid: int, param: int, v1: int, v2: int, v3: int) -> None:
    ctx = _ctx()
    if param == AL_AUXILIARY_SEND_FILTER:
        ctx.sources[sid].send(ctx.aux_slots.get(v1), v2,
                              ctx.filters.get(v3))
    else:
        raise ValueError(f"alSource3i param {param:#x}")


def alSourcePlay(sid: int) -> None:
    _ctx().sources[sid].play()


def alSourceStop(sid: int) -> None:
    _ctx().sources[sid].stop()


def alSourcePause(sid: int) -> None:
    _ctx().sources[sid].pause()


def alSourceRewind(sid: int) -> None:
    _ctx().sources[sid].rewind()


def alSourceQueueBuffers(sid: int, buffer_ids) -> None:
    ctx = _ctx()
    ctx.sources[sid].queue_buffers(*[ctx.buffers[b] for b in buffer_ids])


def alGetSourcei(sid: int, param: int) -> int:
    from .source import SourceState

    src = _ctx().sources[sid]
    if param == AL_SOURCE_STATE:
        return {SourceState.INITIAL: AL_INITIAL, SourceState.PLAYING: AL_PLAYING,
                SourceState.PAUSED: AL_PAUSED,
                SourceState.STOPPED: AL_STOPPED}[src.state]
    if param == AL_SAMPLE_OFFSET:
        return src.sample_offset()
    raise ValueError(f"alGetSourcei param {param:#x}")


# --- listener ------------------------------------------------------------------

def alListenerf(param: int, value: float) -> None:
    ctx = _ctx()
    if param == AL_GAIN:
        ctx.listener.gain = float(value)
    ctx.listener_dirty()


def alListener3f(param: int, x: float, y: float, z: float) -> None:
    ctx = _ctx()
    if param == AL_POSITION:
        ctx.listener.position = (x, y, z)
    elif param == AL_VELOCITY:
        ctx.listener.velocity = (x, y, z)
    ctx.listener_dirty()


def alListenerfv(param: int, values) -> None:
    ctx = _ctx()
    if param == AL_ORIENTATION:
        ctx.listener.orient_at = tuple(values[:3])
        ctx.listener.orient_up = tuple(values[3:6])
    elif param == AL_POSITION:
        ctx.listener.position = tuple(values[:3])
    elif param == AL_VELOCITY:
        ctx.listener.velocity = tuple(values[:3])
    ctx.listener_dirty()


def alDistanceModel(model: int) -> None:
    ctx = _ctx()
    ctx.listener.distance_model = _DIST_MODELS[model]
    ctx.listener_dirty()


def alDopplerFactor(value: float) -> None:
    ctx = _ctx()
    ctx.listener.doppler_factor = float(value)
    ctx.listener_dirty()


def alSpeedOfSound(value: float) -> None:
    ctx = _ctx()
    ctx.listener.speed_of_sound = float(value)
    ctx.listener_dirty()


# --- EFX ------------------------------------------------------------------------

def alGenEffects(n: int = 1):
    ids = [(_ctx().create_effect()).id for _ in range(n)]
    return ids[0] if n == 1 else ids


def alGenFilters(n: int = 1):
    ids = [(_ctx().create_filter()).id for _ in range(n)]
    return ids[0] if n == 1 else ids


def alGenAuxiliaryEffectSlots(n: int = 1):
    ids = [(_ctx().create_aux_slot()).id for _ in range(n)]
    return ids[0] if n == 1 else ids


# --- AL_SOFT_source_latency / ALC_SOFT_device_clock -----------------------------

AL_SAMPLE_OFFSET_LATENCY_SOFT = 0x1200
AL_SEC_OFFSET_LATENCY_SOFT = 0x1201
AL_SAMPLE_OFFSET_CLOCK_SOFT = 0x1202
AL_SEC_OFFSET_CLOCK_SOFT = 0x1203
ALC_DEVICE_CLOCK_SOFT = 0x1600
ALC_DEVICE_LATENCY_SOFT = 0x1601
ALC_DEVICE_CLOCK_LATENCY_SOFT = 0x1602


def alGetSourcei64vSOFT(sid: int, param: int):
    src = _ctx().sources[sid]
    if param == AL_SAMPLE_OFFSET_LATENCY_SOFT:
        return src.sample_offset_latency()
    if param == AL_SAMPLE_OFFSET_CLOCK_SOFT:
        return src.sample_offset_clock()
    raise ValueError(f"alGetSourcei64vSOFT param {param:#x}")


def alGetSourcedvSOFT(sid: int, param: int):
    src = _ctx().sources[sid]
    if param == AL_SEC_OFFSET_LATENCY_SOFT:
        return src.sec_offset_latency()
    if param == AL_SEC_OFFSET_CLOCK_SOFT:
        off, clk = src.sample_offset_clock()
        rate = src.queue[0].sample_rate if src.queue else \
            src.context.device.sample_rate
        return off / 4294967296.0 / float(rate), clk / 1e9
    raise ValueError(f"alGetSourcedvSOFT param {param:#x}")


def alcGetInteger64vSOFT(device, param: int):
    if param == ALC_DEVICE_CLOCK_SOFT:
        return device.clock_ns()
    if param == ALC_DEVICE_LATENCY_SOFT:
        return device.clock_latency_ns()[1]
    if param == ALC_DEVICE_CLOCK_LATENCY_SOFT:
        return device.clock_latency_ns()
    raise ValueError(f"alcGetInteger64vSOFT param {param:#x}")


# --- error model (al/error.cpp) -------------------------------------------------

from .error import (AL_INVALID_ENUM, AL_INVALID_NAME, AL_INVALID_OPERATION,
                    AL_INVALID_VALUE, AL_NO_ERROR, AL_OUT_OF_MEMORY, ALError)


def alGetError() -> int:
    """Pop the context's sticky first error (error.cpp:59-67)."""
    ctx = getattr(_tls, "context", None)
    if ctx is None:
        return AL_INVALID_OPERATION
    return ctx.get_error()


def _al_entry(fn):
    """Entry-point shield: AL never throws; errors go to alGetError.

    ALError keeps its code; unknown object ids (KeyError on the id stores)
    map to AL_INVALID_NAME; bad param enums (ValueError raises in this
    module) map to AL_INVALID_ENUM (error.cpp:70-98)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        ctx = getattr(_tls, "context", None)
        try:
            return fn(*args, **kwargs)
        except ALError as e:
            if ctx is not None:
                ctx.set_error(e.code, str(e))
        except KeyError as e:
            if ctx is not None:
                ctx.set_error(AL_INVALID_NAME, f"invalid id {e}")
        except ValueError as e:
            if ctx is not None:
                ctx.set_error(AL_INVALID_ENUM, str(e))
        return 0
    return wrapper


def _install_entry_shields() -> None:
    """Wrap every al* (not alc*) entry point in this module."""
    g = globals()
    for name, fn in list(g.items()):
        if (name.startswith("al") and not name.startswith("alc")
                and callable(fn) and fn.__module__ == __name__
                and name not in ("alGetError",)):
            g[name] = _al_entry(fn)


# --- extension queries (alc/alc.cpp:335-368, alc/context.cpp:64-109) -------------

AL_EXTENSIONS = 0xB004
AL_VERSION = 0xB002
AL_RENDERER = 0xB003
AL_VENDOR = 0xB001
ALC_EXTENSIONS = 0x1006

# The AL extensions this implementation actually provides (subset of the
# reference's list at alc/context.cpp:65-109: entries whose feature exists
# here; grown as the surface grows).
_AL_EXTENSION_LIST = (
    "AL_EXT_ALAW AL_EXT_BFORMAT AL_EXT_DOUBLE AL_EXT_EXPONENT_DISTANCE "
    "AL_EXT_FLOAT32 AL_EXT_IMA4 AL_EXT_LINEAR_DISTANCE AL_EXT_MCFORMATS "
    "AL_EXT_MULAW AL_EXT_MULAW_BFORMAT AL_EXT_OFFSET "
    "AL_EXT_SOURCE_RADIUS AL_EXT_STEREO_ANGLES "
    "AL_SOFT_bformat_ex AL_SOFT_block_alignment AL_SOFT_callback_buffer "
    "AL_SOFT_deferred_updates "
    "AL_SOFT_direct_channels AL_SOFT_events AL_SOFT_gain_clamp_ex "
    "AL_SOFT_loop_points AL_SOFT_MSADPCM AL_SOFT_source_latency "
    "AL_SOFT_source_length AL_SOFT_source_resampler "
    "AL_SOFT_source_spatialize AL_SOFT_UHJ AL_SOFT_UHJ_ex"
)
_ALC_EXTENSION_LIST = (
    "ALC_ENUMERATE_ALL_EXT ALC_ENUMERATION_EXT ALC_EXT_CAPTURE "
    "ALC_EXT_DEDICATED ALC_EXT_EFX ALC_EXT_thread_local_context "
    "ALC_SOFT_HRTF ALC_SOFT_loopback ALC_SOFT_loopback_bformat "
    "ALC_SOFT_output_limiter ALC_SOFT_pause_device"
)


def alGetString(param: int) -> str:
    if param == AL_EXTENSIONS:
        return _AL_EXTENSION_LIST
    if param == AL_VERSION:
        return "1.1 ALSOFT-TPU"
    if param == AL_RENDERER:
        return "OpenAL Soft TPU"
    if param == AL_VENDOR:
        return "openal_soft_tpu"
    raise ValueError(f"alGetString param {param:#x}")


def alIsExtensionPresent(name: str) -> bool:
    return name.upper() in (s.upper() for s in _AL_EXTENSION_LIST.split())


def alcGetString(device, param: int) -> str:
    if param == ALC_EXTENSIONS:
        return _ALC_EXTENSION_LIST
    raise ValueError(f"alcGetString param {param:#x}")


def alcIsExtensionPresent(device, name: str) -> bool:
    return name.upper() in (s.upper() for s in _ALC_EXTENSION_LIST.split())


# --- AL_SOFT_events (al/event.cpp) ------------------------------------------------

AL_EVENT_TYPE_BUFFER_COMPLETED_SOFT = 0x19A4
AL_EVENT_TYPE_SOURCE_STATE_CHANGED_SOFT = 0x19A5
AL_EVENT_TYPE_DISCONNECTED_SOFT = 0x19A6

_EVENT_KINDS = {
    AL_EVENT_TYPE_BUFFER_COMPLETED_SOFT: "buffer_completed",
    AL_EVENT_TYPE_SOURCE_STATE_CHANGED_SOFT: "source_state",
    AL_EVENT_TYPE_DISCONNECTED_SOFT: "disconnected",
}


def alEventControlSOFT(event_types, enable: bool) -> None:
    kinds = [_EVENT_KINDS[t] for t in event_types]
    _ctx().control_events(kinds, bool(enable))


def alEventCallbackSOFT(callback) -> None:
    """callback(kind: str, object_id: int, param) on the event thread."""
    _ctx().set_event_callback(callback)


_install_entry_shields()
