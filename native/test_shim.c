/* C smoke test for libopenal_tpu.so: the reference's client patterns
 * against the TPU renderer through the classic C ABI.
 *
 * Scenario 1 (alplay): loopback open, static buffer, source, play, render.
 * Scenario 2 (alstream + alreverb): a streaming source fed by queued
 * buffers with unqueue-and-refill, routed through an EAXReverb effect
 * slot (alGenEffects/alEffecti/alGenAuxiliaryEffectSlots/alSource3i).
 *
 * Prints PEAK=<value> STREAM_PEAK=<value> and exits 0 on success.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define AL_BUFFER 0x1009
#define AL_LOOPING 0x1007
#define AL_POSITION 0x1004
#define AL_GAIN 0x100A
#define AL_SOURCE_STATE 0x1010
#define AL_PLAYING 0x1012
#define AL_FORMAT_MONO_FLOAT32 0x10010
#define AL_NO_ERROR 0
#define AL_EFFECT_TYPE 0x8001
#define AL_EFFECT_EAXREVERB 0x8000
#define AL_EAXREVERB_DECAY_TIME 0x0006
#define AL_EFFECTSLOT_EFFECT 0x0001
#define AL_AUXILIARY_SEND_FILTER 0x20006
#define AL_FILTER_TYPE 0x8001
#define AL_FILTER_LOWPASS 0x0001
#define AL_LOWPASS_GAINHF 0x0002
#define AL_DIRECT_FILTER 0x20005

typedef void ALCdevice;
typedef void ALCcontext;
extern ALCdevice *alcLoopbackOpenDeviceSOFT(const char *devname);
extern ALCcontext *alcCreateContext(ALCdevice *dev, const int *attrs);
extern char alcMakeContextCurrent(ALCcontext *ctx);
extern void alcRenderSamplesSOFT(ALCdevice *dev, void *buffer, int samples);
extern void alGenBuffers(int n, unsigned *buffers);
extern void alDeleteBuffers(int n, const unsigned *buffers);
extern void alBufferData(unsigned buffer, int format, const void *data,
                         int size, int freq);
extern void alGenSources(int n, unsigned *sources);
extern void alDeleteSources(int n, const unsigned *sources);
extern void alSourcei(unsigned source, int param, int value);
extern void alSourcef(unsigned source, int param, float value);
extern void alSource3f(unsigned source, int param, float x, float y, float z);
extern void alSource3i(unsigned source, int param, int a, int b, int c);
extern void alSourcePlay(unsigned source);
extern void alSourceStop(unsigned source);
extern void alSourceQueueBuffers(unsigned source, int n, const unsigned *b);
extern void alSourceUnqueueBuffers(unsigned source, int n, unsigned *b);
extern void alGetSourcei(unsigned source, int param, int *value);
extern void alGenEffects(int n, unsigned *effects);
extern void alEffecti(unsigned effect, int param, int value);
extern void alEffectf(unsigned effect, int param, float value);
extern void alGenAuxiliaryEffectSlots(int n, unsigned *slots);
extern void alAuxiliaryEffectSloti(unsigned slot, int param, int value);
extern void alGenFilters(int n, unsigned *filters);
extern void alFilteri(unsigned filter, int param, int value);
extern void alFilterf(unsigned filter, int param, float value);
extern int alGetError(void);

#define RATE 48000
#define FRAMES 4096

static float peak_of(const float *buf, int n)
{
    float peak = 0.0f;
    for(int i = 0; i < n; ++i) {
        float a = fabsf(buf[i]);
        if(a > peak) peak = a;
        if(a != a) return -1.0f;   /* NaN */
    }
    return peak;
}

static void fill_tone(float *data, int n, double freq, int phase0)
{
    for(int i = 0; i < n; ++i)
        data[i] = 0.4f * (float)sin(2.0 * M_PI * freq * (phase0 + i) / RATE);
}

int main(void)
{
    ALCdevice *dev = alcLoopbackOpenDeviceSOFT(NULL);
    if(!dev) { fprintf(stderr, "open failed\n"); return 1; }
    ALCcontext *ctx = alcCreateContext(dev, NULL);
    alcMakeContextCurrent(ctx);

    /* --- scenario 1: static looping source ---------------------------- */
    float *tone = malloc(sizeof(float) * RATE);
    fill_tone(tone, RATE, 440.0, 0);
    unsigned buf, src;
    alGenBuffers(1, &buf);
    alBufferData(buf, AL_FORMAT_MONO_FLOAT32, tone, RATE * 4, RATE);
    alGenSources(1, &src);
    alSourcei(src, AL_BUFFER, (int)buf);
    alSourcei(src, AL_LOOPING, 1);
    alSource3f(src, AL_POSITION, 0.5f, 0.0f, -1.0f);
    alSourcePlay(src);

    float *out = malloc(sizeof(float) * FRAMES * 2);
    alcRenderSamplesSOFT(dev, out, FRAMES);
    float peak = peak_of(out, FRAMES * 2);
    if(peak <= 0.0f || peak > 2.0f) {
        fprintf(stderr, "bad peak %f\n", peak);
        return 1;
    }
    int state = 0;
    alGetSourcei(src, AL_SOURCE_STATE, &state);
    if(state != AL_PLAYING) { fprintf(stderr, "not playing\n"); return 1; }
    alSourceStop(src);

    /* --- scenario 2: streaming queue + EAXReverb send + direct filter - */
    unsigned slot, effect, filter;
    alGenEffects(1, &effect);
    alEffecti(effect, AL_EFFECT_TYPE, AL_EFFECT_EAXREVERB);
    alEffectf(effect, AL_EAXREVERB_DECAY_TIME, 3.1f);
    alGenAuxiliaryEffectSlots(1, &slot);
    alAuxiliaryEffectSloti(slot, AL_EFFECTSLOT_EFFECT, (int)effect);
    alGenFilters(1, &filter);
    alFilteri(filter, AL_FILTER_TYPE, AL_FILTER_LOWPASS);
    alFilterf(filter, AL_LOWPASS_GAINHF, 0.3f);

    unsigned sbufs[3], ssrc;
    alGenBuffers(3, sbufs);
    float *chunk = malloc(sizeof(float) * 8192);
    int phase = 0;
    for(int i = 0; i < 3; ++i) {
        fill_tone(chunk, 8192, 330.0, phase);
        phase += 8192;
        alBufferData(sbufs[i], AL_FORMAT_MONO_FLOAT32, chunk, 8192 * 4, RATE);
    }
    alGenSources(1, &ssrc);
    alSourceQueueBuffers(ssrc, 3, sbufs);
    alSourcei(ssrc, AL_DIRECT_FILTER, (int)filter);
    alSource3i(ssrc, AL_AUXILIARY_SEND_FILTER, (int)slot, 0, 0);
    alSourcePlay(ssrc);

    float speak = 0.0f;
    for(int blocks = 0; blocks < 8; ++blocks) {
        alcRenderSamplesSOFT(dev, out, FRAMES);
        float p = peak_of(out, FRAMES * 2);
        if(p < 0.0f) { fprintf(stderr, "NaN in stream\n"); return 1; }
        if(p > speak) speak = p;
        unsigned done[3];
        alSourceUnqueueBuffers(ssrc, 1, done);
    }
    if(speak <= 0.0f) { fprintf(stderr, "silent stream\n"); return 1; }

    if(alGetError() != AL_NO_ERROR) {
        fprintf(stderr, "AL error\n");
        return 1;
    }
    alDeleteSources(1, &ssrc);
    alDeleteBuffers(3, sbufs);
    printf("PEAK=%.6f STREAM_PEAK=%.6f\n", peak, speak);
    return 0;
}
