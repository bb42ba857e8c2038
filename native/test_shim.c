/* C smoke test for libopenal_tpu.so: the reference's client pattern
 * (loopback open, buffer, source, play, render) against the TPU renderer
 * through the classic C ABI.  Prints PEAK=<value> and exits 0 on success.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define AL_BUFFER 0x1009
#define AL_LOOPING 0x1007
#define AL_POSITION 0x1004
#define AL_SOURCE_STATE 0x1010
#define AL_PLAYING 0x1012
#define AL_FORMAT_MONO_FLOAT32 0x10010
#define AL_NO_ERROR 0

typedef void ALCdevice;
typedef void ALCcontext;
extern ALCdevice *alcLoopbackOpenDeviceSOFT(const char *devname);
extern ALCcontext *alcCreateContext(ALCdevice *dev, const int *attrs);
extern char alcMakeContextCurrent(ALCcontext *ctx);
extern void alcRenderSamplesSOFT(ALCdevice *dev, void *buffer, int samples);
extern void alGenBuffers(int n, unsigned *buffers);
extern void alBufferData(unsigned buffer, int format, const void *data,
                         int size, int freq);
extern void alGenSources(int n, unsigned *sources);
extern void alSourcei(unsigned source, int param, int value);
extern void alSource3f(unsigned source, int param, float x, float y, float z);
extern void alSourcePlay(unsigned source);
extern void alGetSourcei(unsigned source, int param, int *value);
extern int alGetError(void);

int main(void)
{
    ALCdevice *dev = alcLoopbackOpenDeviceSOFT(NULL);
    if(!dev) { fprintf(stderr, "no device\n"); return 1; }
    ALCcontext *ctx = alcCreateContext(dev, NULL);
    alcMakeContextCurrent(ctx);

    enum { N = 24000, RATE = 48000, FRAMES = 4096 };
    static float tone[N];
    for(int i = 0; i < N; ++i)
        tone[i] = 0.4f * (float)sin(2.0 * 3.14159265358979 * 440.0 * i / RATE);

    unsigned buf, src;
    alGenBuffers(1, &buf);
    alBufferData(buf, AL_FORMAT_MONO_FLOAT32, tone, sizeof(tone), RATE);
    alGenSources(1, &src);
    alSourcei(src, AL_BUFFER, (int)buf);
    alSourcei(src, AL_LOOPING, 1);
    alSource3f(src, AL_POSITION, 1.0f, 0.0f, -1.0f);
    alSourcePlay(src);
    if(alGetError() != AL_NO_ERROR) { fprintf(stderr, "AL error\n"); return 1; }

    static float out[FRAMES * 2];
    alcRenderSamplesSOFT(dev, out, FRAMES);

    float peak = 0.0f;
    for(int i = 0; i < FRAMES * 2; ++i) {
        float a = fabsf(out[i]);
        if(a > peak) peak = a;
    }
    int state = 0;
    alGetSourcei(src, AL_SOURCE_STATE, &state);
    printf("PEAK=%.6f STATE=%s\n", (double)peak,
           state == AL_PLAYING ? "playing" : "other");
    return (peak > 1e-4f && peak < 1.0f && state == AL_PLAYING) ? 0 : 1;
}
