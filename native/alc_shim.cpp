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

} /* extern "C" */
