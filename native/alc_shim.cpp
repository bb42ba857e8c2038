/* C ABI shim: the classic OpenAL export surface over the TPU renderer.
 *
 * Builds libopenal_tpu.so with the reference's entry-point names and C
 * signatures (alc/export_list.h subset), embedding CPython and forwarding
 * to openal_soft_tpu.al.api.  A C/C++ application written against
 * OpenAL Soft's headers links against this instead of libopenal.so and
 * renders through the TPU loopback device.
 *
 * Threading: entry points grab the GIL via PyGILState; the embedded
 * interpreter is initialized lazily on the first device open.
 */

#include <Python.h>

#include <dlfcn.h>

#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>

using ALCdevice = void;
using ALCcontext = void;
using ALenum = int;
using ALuint = unsigned int;
using ALint = int;
using ALsizei = int;
using ALfloat = float;
using ALboolean = char;
using ALCboolean = char;
using ALCenum = int;
using ALCint = int;
using ALCuint = unsigned int;
using ALCsizei = int;
using ALCchar = char;

namespace {

std::once_flag g_init_once;
PyObject *g_api = nullptr;          /* openal_soft_tpu.al.api module */
PyThreadState *g_main_tstate = nullptr;

void init_python()
{
    if(!Py_IsInitialized())
        Py_InitializeEx(0);
    PyGILState_STATE gil = PyGILState_Ensure();
    /* Make the package importable: $OPENAL_TPU_ROOT if set, else the
     * directory above this shared object (native/ lives in the repo). */
    {
        std::string root;
        if(const char *env = getenv("OPENAL_TPU_ROOT"))
            root = env;
        else {
            Dl_info info;
            if(dladdr(reinterpret_cast<void*>(&init_python), &info)
               && info.dli_fname) {
                root = info.dli_fname;             /* .../native/lib.so */
                auto slash = root.rfind('/');
                if(slash != std::string::npos) root.resize(slash);
                slash = root.rfind('/');
                if(slash != std::string::npos) root.resize(slash);
            }
        }
        if(!root.empty()) {
            PyObject *sys_path = PySys_GetObject("path");
            PyObject *p = PyUnicode_FromString(root.c_str());
            if(sys_path && p) PyList_Append(sys_path, p);
            Py_XDECREF(p);
        }
    }
    g_api = PyImport_ImportModule("openal_soft_tpu.al.api");
    if(!g_api)
        PyErr_Print();
    PyGILState_Release(gil);
    /* Release the GIL from this (main) thread so later entry points can
     * take it from any thread. */
    if(PyGILState_Check())
        g_main_tstate = PyEval_SaveThread();
}

struct Gil {
    PyGILState_STATE st;
    Gil() { st = PyGILState_Ensure(); }
    ~Gil() { PyGILState_Release(st); }
};

PyObject *call(const char *name, PyObject *args)
{
    if(!g_api) { Py_XDECREF(args); return nullptr; }
    PyObject *fn = PyObject_GetAttrString(g_api, name);
    if(!fn) { PyErr_Print(); Py_XDECREF(args); return nullptr; }
    PyObject *ret = PyObject_CallObject(fn, args);
    Py_DECREF(fn);
    Py_XDECREF(args);
    if(!ret) PyErr_Print();
    return ret;
}

long call_long(const char *name, PyObject *args, long dflt=0)
{
    PyObject *r = call(name, args);
    long v = dflt;
    if(r && PyLong_Check(r)) v = PyLong_AsLong(r);
    Py_XDECREF(r);
    return v;
}

void call_void(const char *name, PyObject *args)
{
    PyObject *r = call(name, args);
    Py_XDECREF(r);
}

} // namespace

extern "C" {

/* ---- ALC ---- */

ALCdevice *alcLoopbackOpenDeviceSOFT(const ALCchar * /*devname*/)
{
    std::call_once(g_init_once, init_python);
    Gil gil;
    /* Default 48 kHz stereo float; alcCreateContext attrs re-shape in the
     * reference, here the loopback defaults match the common case. */
    PyObject *dev = call("alcLoopbackOpenDeviceSOFT", PyTuple_New(0));
    return static_cast<ALCdevice*>(dev);
}

ALCcontext *alcCreateContext(ALCdevice *device, const ALCint * /*attrs*/)
{
    Gil gil;
    PyObject *args = Py_BuildValue("(O)", static_cast<PyObject*>(device));
    PyObject *ctx = call("alcCreateContext", args);
    return static_cast<ALCcontext*>(ctx);
}

ALCboolean alcMakeContextCurrent(ALCcontext *context)
{
    Gil gil;
    PyObject *args = Py_BuildValue("(O)",
        context ? static_cast<PyObject*>(context) : Py_None);
    call_void("alcMakeContextCurrent", args);
    return 1;
}

void alcRenderSamplesSOFT(ALCdevice *device, void *buffer, ALCsizei samples)
{
    Gil gil;
    PyObject *args = Py_BuildValue("(Oi)", static_cast<PyObject*>(device),
                                   static_cast<int>(samples));
    PyObject *out = call("alcRenderSamplesSOFT", args);
    if(!out) return;
    /* numpy array -> raw bytes via the buffer protocol */
    Py_buffer view;
    if(PyObject_GetBuffer(out, &view, PyBUF_CONTIG_RO) == 0) {
        memcpy(buffer, view.buf, static_cast<size_t>(view.len));
        PyBuffer_Release(&view);
    } else {
        PyErr_Print();
    }
    Py_DECREF(out);
}

ALCboolean alcCloseDevice(ALCdevice *device)
{
    Gil gil;
    Py_XDECREF(static_cast<PyObject*>(device));
    return 1;
}

void alcDestroyContext(ALCcontext *context)
{
    Gil gil;
    Py_XDECREF(static_cast<PyObject*>(context));
}

const ALCchar *alcGetString(ALCdevice *, ALCenum param)
{
    static char buf[1024];
    Gil gil;
    PyObject *args = Py_BuildValue("(Oi)", Py_None, param);
    PyObject *r = call("alcGetString", args);
    buf[0] = 0;
    if(r && PyUnicode_Check(r)) {
        const char *s = PyUnicode_AsUTF8(r);
        if(s) { strncpy(buf, s, sizeof(buf)-1); buf[sizeof(buf)-1] = 0; }
    }
    Py_XDECREF(r);
    return buf;
}

/* ---- AL buffers ---- */

void alGenBuffers(ALsizei n, ALuint *buffers)
{
    Gil gil;
    for(ALsizei i = 0; i < n; ++i)
        buffers[i] = static_cast<ALuint>(
            call_long("alGenBuffers", Py_BuildValue("(i)", 1)));
}

void alBufferData(ALuint buffer, ALenum format, const void *data,
                  ALsizei size, ALsizei freq)
{
    Gil gil;
    PyObject *bytes = PyBytes_FromStringAndSize(
        static_cast<const char*>(data), size);
    /* api.alBufferData accepts raw bytes via numpy frombuffer on the
     * Python side (alBufferDataRaw helper). */
    PyObject *args = Py_BuildValue("(IiNi)", buffer, format, bytes, freq);
    call_void("alBufferDataRaw", args);
}

/* ---- AL sources ---- */

void alGenSources(ALsizei n, ALuint *sources)
{
    Gil gil;
    for(ALsizei i = 0; i < n; ++i)
        sources[i] = static_cast<ALuint>(
            call_long("alGenSources", Py_BuildValue("(i)", 1)));
}

void alSourcei(ALuint source, ALenum param, ALint value)
{ Gil gil; call_void("alSourcei", Py_BuildValue("(Iii)", source, param, value)); }

void alSourcef(ALuint source, ALenum param, ALfloat value)
{ Gil gil; call_void("alSourcef", Py_BuildValue("(Iif)", source, param, value)); }

void alSource3f(ALuint source, ALenum param, ALfloat v1, ALfloat v2, ALfloat v3)
{ Gil gil; call_void("alSource3f", Py_BuildValue("(Iifff)", source, param, v1, v2, v3)); }

void alSource3i(ALuint source, ALenum param, ALint v1, ALint v2, ALint v3)
{ Gil gil; call_void("alSource3i", Py_BuildValue("(Iiiii)", source, param, v1, v2, v3)); }

void alSourcePlay(ALuint source)
{ Gil gil; call_void("alSourcePlay", Py_BuildValue("(I)", source)); }

void alSourceStop(ALuint source)
{ Gil gil; call_void("alSourceStop", Py_BuildValue("(I)", source)); }

void alSourcePause(ALuint source)
{ Gil gil; call_void("alSourcePause", Py_BuildValue("(I)", source)); }

void alSourceRewind(ALuint source)
{ Gil gil; call_void("alSourceRewind", Py_BuildValue("(I)", source)); }

void alGetSourcei(ALuint source, ALenum param, ALint *value)
{
    Gil gil;
    *value = static_cast<ALint>(
        call_long("alGetSourcei", Py_BuildValue("(Ii)", source, param)));
}

/* ---- AL listener / state ---- */

void alListenerf(ALenum param, ALfloat value)
{ Gil gil; call_void("alListenerf", Py_BuildValue("(if)", param, value)); }

void alListener3f(ALenum param, ALfloat v1, ALfloat v2, ALfloat v3)
{ Gil gil; call_void("alListener3f", Py_BuildValue("(ifff)", param, v1, v2, v3)); }

void alListenerfv(ALenum param, const ALfloat *values)
{
    Gil gil;
    int n = (param == 0x100F) ? 6 : 3;   /* AL_ORIENTATION : vectors */
    PyObject *lst = PyList_New(n);
    for(int i = 0; i < n; ++i)
        PyList_SET_ITEM(lst, i, PyFloat_FromDouble(values[i]));
    call_void("alListenerfv", Py_BuildValue("(iN)", param, lst));
}

void alDistanceModel(ALenum model)
{ Gil gil; call_void("alDistanceModel", Py_BuildValue("(i)", model)); }

void alDopplerFactor(ALfloat value)
{ Gil gil; call_void("alDopplerFactor", Py_BuildValue("(f)", value)); }

void alSpeedOfSound(ALfloat value)
{ Gil gil; call_void("alSpeedOfSound", Py_BuildValue("(f)", value)); }

ALenum alGetError(void)
{ Gil gil; return static_cast<ALenum>(call_long("alGetError", PyTuple_New(0))); }

const ALCchar *alGetString(ALenum param)
{
    static char buf[4096];
    Gil gil;
    PyObject *r = call("alGetString", Py_BuildValue("(i)", param));
    buf[0] = 0;
    if(r && PyUnicode_Check(r)) {
        const char *s = PyUnicode_AsUTF8(r);
        if(s) { strncpy(buf, s, sizeof(buf)-1); buf[sizeof(buf)-1] = 0; }
    }
    Py_XDECREF(r);
    return buf;
}

ALboolean alIsExtensionPresent(const ALCchar *extname)
{
    Gil gil;
    PyObject *r = call("alIsExtensionPresent", Py_BuildValue("(s)", extname));
    ALboolean v = (r == Py_True);
    Py_XDECREF(r);
    return v;
}

/* ---- source property matrix (al/source.cpp:1510/2086) ---- */

void alSourcefv(ALuint source, ALenum param, const ALfloat *values)
{
    Gil gil;
    int n = (param == 0x1004 || param == 0x1005 || param == 0x1006) ? 3 : 1;
    PyObject *lst = PyList_New(n);
    for(int i = 0; i < n; ++i)
        PyList_SET_ITEM(lst, i, PyFloat_FromDouble(values[i]));
    call_void("alSourcefv", Py_BuildValue("(IiN)", source, param, lst));
}

void alGetSourcef(ALuint source, ALenum param, ALfloat *value)
{
    Gil gil;
    PyObject *r = call("alGetSourcef", Py_BuildValue("(Ii)", source, param));
    *value = (r && PyFloat_Check(r)) ? (float)PyFloat_AsDouble(r) : 0.0f;
    Py_XDECREF(r);
}

void alGetSource3f(ALuint source, ALenum param, ALfloat *v1, ALfloat *v2,
                   ALfloat *v3)
{
    Gil gil;
    PyObject *r = call("alGetSource3f", Py_BuildValue("(Ii)", source, param));
    *v1 = *v2 = *v3 = 0.0f;
    if(r && PyTuple_Check(r) && PyTuple_GET_SIZE(r) == 3) {
        *v1 = (float)PyFloat_AsDouble(PyTuple_GET_ITEM(r, 0));
        *v2 = (float)PyFloat_AsDouble(PyTuple_GET_ITEM(r, 1));
        *v3 = (float)PyFloat_AsDouble(PyTuple_GET_ITEM(r, 2));
    }
    Py_XDECREF(r);
}

void alGetSourcefv(ALuint source, ALenum param, ALfloat *values)
{
    if(param == 0x1004 || param == 0x1005 || param == 0x1006) {
        alGetSource3f(source, param, values, values + 1, values + 2);
        return;
    }
    alGetSourcef(source, param, values);
}

void alSourcePlayv(ALsizei n, const ALuint *sources)
{ for(ALsizei i = 0; i < n; ++i) alSourcePlay(sources[i]); }

void alSourceStopv(ALsizei n, const ALuint *sources)
{ for(ALsizei i = 0; i < n; ++i) alSourceStop(sources[i]); }

void alSourcePausev(ALsizei n, const ALuint *sources)
{ for(ALsizei i = 0; i < n; ++i) alSourcePause(sources[i]); }

void alSourceRewindv(ALsizei n, const ALuint *sources)
{ for(ALsizei i = 0; i < n; ++i) alSourceRewind(sources[i]); }

/* ---- buffer queueing (al/source.cpp alSourceQueueBuffers) ---- */

void alSourceQueueBuffers(ALuint source, ALsizei nb, const ALuint *buffers)
{
    Gil gil;
    PyObject *lst = PyList_New(nb);
    for(ALsizei i = 0; i < nb; ++i)
        PyList_SET_ITEM(lst, i, PyLong_FromUnsignedLong(buffers[i]));
    call_void("alSourceQueueBuffers", Py_BuildValue("(IN)", source, lst));
}

void alSourceUnqueueBuffers(ALuint source, ALsizei nb, ALuint *buffers)
{
    Gil gil;
    PyObject *r = call("alSourceUnqueueBuffers",
                       Py_BuildValue("(Ii)", source, (int)nb));
    if(r && PyList_Check(r)) {
        Py_ssize_t got = PyList_GET_SIZE(r);
        for(Py_ssize_t i = 0; i < got && i < nb; ++i)
            buffers[i] = (ALuint)PyLong_AsUnsignedLong(PyList_GET_ITEM(r, i));
    } else if(r && PyLong_Check(r) && nb >= 1) {
        buffers[0] = (ALuint)PyLong_AsUnsignedLong(r);
    }
    Py_XDECREF(r);
}

void alDeleteSources(ALsizei n, const ALuint *sources)
{
    Gil gil;
    PyObject *lst = PyList_New(n);
    for(ALsizei i = 0; i < n; ++i)
        PyList_SET_ITEM(lst, i, PyLong_FromUnsignedLong(sources[i]));
    call_void("alDeleteSources", Py_BuildValue("(N)", lst));
}

void alDeleteBuffers(ALsizei n, const ALuint *buffers)
{
    Gil gil;
    PyObject *lst = PyList_New(n);
    for(ALsizei i = 0; i < n; ++i)
        PyList_SET_ITEM(lst, i, PyLong_FromUnsignedLong(buffers[i]));
    call_void("alDeleteBuffers", Py_BuildValue("(N)", lst));
}

void alGetBufferi(ALuint buffer, ALenum param, ALint *value)
{
    Gil gil;
    *value = (ALint)call_long("alGetBufferi",
                              Py_BuildValue("(Ii)", buffer, param));
}

void alBufferiv(ALuint buffer, ALenum param, const ALint *values)
{
    Gil gil;
    int n = (param == 0x2015) ? 2 : 1;   /* AL_LOOP_POINTS_SOFT */
    PyObject *lst = PyList_New(n);
    for(int i = 0; i < n; ++i)
        PyList_SET_ITEM(lst, i, PyLong_FromLong(values[i]));
    call_void("alBufferiv", Py_BuildValue("(IiN)", buffer, param, lst));
}

/* ---- EFX objects (alGenEffects, alEffect*, alGenFilters; efx.h) ---- */

void alGenEffects(ALsizei n, ALuint *effects)
{
    Gil gil;
    for(ALsizei i = 0; i < n; ++i)
        effects[i] = (ALuint)call_long("alGenEffects", Py_BuildValue("(i)", 1));
}

void alDeleteEffects(ALsizei n, const ALuint *effects)
{
    Gil gil;
    PyObject *lst = PyList_New(n);
    for(ALsizei i = 0; i < n; ++i)
        PyList_SET_ITEM(lst, i, PyLong_FromUnsignedLong(effects[i]));
    call_void("alDeleteEffects", Py_BuildValue("(N)", lst));
}

void alEffecti(ALuint effect, ALenum param, ALint value)
{ Gil gil; call_void("alEffecti", Py_BuildValue("(Iii)", effect, param, value)); }

void alEffectf(ALuint effect, ALenum param, ALfloat value)
{ Gil gil; call_void("alEffectf", Py_BuildValue("(Iif)", effect, param, value)); }

void alEffectfv(ALuint effect, ALenum param, const ALfloat *values)
{
    Gil gil;
    int n = (param == 0x000B || param == 0x000E) ? 3 : 1;  /* reverb pans */
    PyObject *lst = PyList_New(n);
    for(int i = 0; i < n; ++i)
        PyList_SET_ITEM(lst, i, PyFloat_FromDouble(values[i]));
    call_void("alEffectfv", Py_BuildValue("(IiN)", effect, param, lst));
}

void alGetEffecti(ALuint effect, ALenum param, ALint *value)
{
    Gil gil;
    *value = (ALint)call_long("alGetEffecti",
                              Py_BuildValue("(Ii)", effect, param));
}

void alGenFilters(ALsizei n, ALuint *filters)
{
    Gil gil;
    for(ALsizei i = 0; i < n; ++i)
        filters[i] = (ALuint)call_long("alGenFilters", Py_BuildValue("(i)", 1));
}

void alDeleteFilters(ALsizei n, const ALuint *filters)
{
    Gil gil;
    PyObject *lst = PyList_New(n);
    for(ALsizei i = 0; i < n; ++i)
        PyList_SET_ITEM(lst, i, PyLong_FromUnsignedLong(filters[i]));
    call_void("alDeleteFilters", Py_BuildValue("(N)", lst));
}

void alFilteri(ALuint filter, ALenum param, ALint value)
{ Gil gil; call_void("alFilteri", Py_BuildValue("(Iii)", filter, param, value)); }

void alFilterf(ALuint filter, ALenum param, ALfloat value)
{ Gil gil; call_void("alFilterf", Py_BuildValue("(Iif)", filter, param, value)); }

void alGenAuxiliaryEffectSlots(ALsizei n, ALuint *slots)
{
    Gil gil;
    for(ALsizei i = 0; i < n; ++i)
        slots[i] = (ALuint)call_long("alGenAuxiliaryEffectSlots",
                                     Py_BuildValue("(i)", 1));
}

void alDeleteAuxiliaryEffectSlots(ALsizei n, const ALuint *slots)
{
    Gil gil;
    PyObject *lst = PyList_New(n);
    for(ALsizei i = 0; i < n; ++i)
        PyList_SET_ITEM(lst, i, PyLong_FromUnsignedLong(slots[i]));
    call_void("alDeleteAuxiliaryEffectSlots", Py_BuildValue("(N)", lst));
}

void alAuxiliaryEffectSloti(ALuint slot, ALenum param, ALint value)
{ Gil gil; call_void("alAuxiliaryEffectSloti", Py_BuildValue("(Iii)", slot, param, value)); }

void alAuxiliaryEffectSlotf(ALuint slot, ALenum param, ALfloat value)
{ Gil gil; call_void("alAuxiliaryEffectSlotf", Py_BuildValue("(Iif)", slot, param, value)); }

/* ---- ALC device lifecycle (alc/alc.cpp:2995/3522/1922/3658) ---- */

ALCdevice *alcOpenDevice(const ALCchar *devname)
{
    std::call_once(g_init_once, init_python);
    Gil gil;
    PyObject *args = devname ? Py_BuildValue("(s)", devname) : PyTuple_New(0);
    return static_cast<ALCdevice*>(call("alcOpenDevice", args));
}

void alcDevicePauseSOFT(ALCdevice *device)
{
    Gil gil;
    call_void("alcDevicePauseSOFT",
              Py_BuildValue("(O)", static_cast<PyObject*>(device)));
}

void alcDeviceResumeSOFT(ALCdevice *device)
{
    Gil gil;
    call_void("alcDeviceResumeSOFT",
              Py_BuildValue("(O)", static_cast<PyObject*>(device)));
}

ALCboolean alcResetDeviceSOFT(ALCdevice *device, const ALCint * /*attribs*/)
{
    Gil gil;
    call_void("alcResetDeviceSOFT",
              Py_BuildValue("(O)", static_cast<PyObject*>(device)));
    return 1;
}

ALCboolean alcReopenDeviceSOFT(ALCdevice *device, const ALCchar *devname,
                               const ALCint * /*attribs*/)
{
    Gil gil;
    PyObject *args = Py_BuildValue("(Os)", static_cast<PyObject*>(device),
                                   devname ? devname : "");
    call_void("alcReopenDeviceSOFT", args);
    return 1;
}

void alcGetIntegerv(ALCdevice *device, ALCenum param, ALCsizei size,
                    ALCint *values)
{
    Gil gil;
    PyObject *args = Py_BuildValue("(Oi)",
        device ? static_cast<PyObject*>(device) : Py_None, param);
    PyObject *r = call("alcGetIntegerv", args);
    if(!r) return;
    if(PyLong_Check(r) && size >= 1)
        values[0] = (ALCint)PyLong_AsLong(r);
    else if(PyList_Check(r)) {
        Py_ssize_t got = PyList_GET_SIZE(r);
        for(Py_ssize_t i = 0; i < got && i < size; ++i)
            values[i] = (ALCint)PyLong_AsLong(PyList_GET_ITEM(r, i));
    }
    Py_XDECREF(r);
}

ALCenum alcGetError(ALCdevice * /*device*/)
{
    return 0;   /* ALC errors surface as AL errors in this build */
}

} /* extern "C" */
