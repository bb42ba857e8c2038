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


# --- buffers ------------------------------------------------------------------

def alGenBuffers(n: int = 1):
    ids = [(_ctx().create_buffer()).id for _ in range(n)]
    return ids[0] if n == 1 else ids


def alBufferData(bid: int, fmt: int, data, freq: int) -> None:
    channels, styp = _FORMATS[fmt]
    _ctx().buffers[bid].set_data(np.asarray(data), channels, styp, freq)


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
