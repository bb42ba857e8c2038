/* Fake libasound for backend testing without hardware.
 *
 * Implements just the PCM surface the AlsaBackend binds
 * (openal_soft_tpu/alc/alsa.py): opened streams capture every
 * snd_pcm_writei frame to the file named by $FAKE_ALSA_CAPTURE, so tests
 * can assert the exact PCM stream the mixer loop produced.
 *
 * Built at test time:  gcc -shared -fPIC -o libfakeasound.so fake_alsa.c
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    FILE *cap;
    int channels;
    int sample_bytes;
} fake_pcm;

static int fmt_bytes(int fmt)
{
    switch (fmt) {
    case 0: case 1: return 1;   /* S8 / U8 */
    case 2: return 2;           /* S16_LE */
    case 10: case 14: return 4; /* S32_LE / FLOAT_LE */
    }
    return 4;
}

int snd_pcm_open(void **pcmp, const char *name, int stream, int mode)
{
    (void)name; (void)stream; (void)mode;
    fake_pcm *p = calloc(1, sizeof(fake_pcm));
    if (!p) return -12;
    const char *path = getenv("FAKE_ALSA_CAPTURE");
    p->cap = path ? fopen(path, "wb") : NULL;
    p->channels = 2;
    p->sample_bytes = 4;
    *pcmp = p;
    return 0;
}

int snd_pcm_set_params(void *pcm, int format, int access,
                       unsigned channels, unsigned rate, int soft_resample,
                       unsigned latency_us)
{
    (void)access; (void)rate; (void)soft_resample; (void)latency_us;
    fake_pcm *p = pcm;
    p->channels = (int)channels;
    p->sample_bytes = fmt_bytes(format);
    return 0;
}

long snd_pcm_writei(void *pcm, const void *buf, unsigned long frames)
{
    fake_pcm *p = pcm;
    if (p->cap) {
        fwrite(buf, (size_t)p->channels * p->sample_bytes, frames, p->cap);
        fflush(p->cap);
    }
    return (long)frames;
}

int snd_pcm_recover(void *pcm, int err, int silent)
{
    (void)pcm; (void)err; (void)silent;
    return 0;
}

int snd_pcm_drain(void *pcm) { (void)pcm; return 0; }

int snd_pcm_close(void *pcm)
{
    fake_pcm *p = pcm;
    if (p->cap) fclose(p->cap);
    free(p);
    return 0;
}
