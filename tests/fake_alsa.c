/* Fake libasound for backend testing without hardware.
 *
 * Implements just the PCM surface the AlsaBackend / AlsaCaptureBackend
 * bind (openal_soft_tpu/alc/alsa.py):
 *  - playback streams capture every snd_pcm_writei frame to the file
 *    named by $FAKE_ALSA_CAPTURE, so tests can assert the exact PCM
 *    stream the mixer loop produced;
 *  - capture streams serve S16 frames from the raw file named by
 *    $FAKE_ALSA_SOURCE (interleaved, matching set_params channels), or a
 *    deterministic ramp when unset, accruing in fixed chunks per
 *    avail_update poll like a driver period clock.
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
    /* capture side */
    int is_capture;
    int started;
    short *src;          /* source frames (interleaved) */
    long src_frames;
    long read_pos;
    long avail;          /* frames accrued but not yet read */
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
    (void)name; (void)mode;
    fake_pcm *p = calloc(1, sizeof(fake_pcm));
    if (!p) return -12;
    p->channels = 2;
    p->sample_bytes = 4;
    p->is_capture = (stream == 1);
    if (p->is_capture) {
        const char *src = getenv("FAKE_ALSA_SOURCE");
        if (src) {
            FILE *f = fopen(src, "rb");
            if (f) {
                fseek(f, 0, SEEK_END);
                long bytes = ftell(f);
                fseek(f, 0, SEEK_SET);
                p->src = malloc((size_t)bytes);
                if (p->src && fread(p->src, 1, (size_t)bytes, f)
                        == (size_t)bytes)
                    p->src_frames = bytes / 2;   /* per-channel split in
                                                    set_params */
                fclose(f);
            }
        }
    } else {
        const char *path = getenv("FAKE_ALSA_CAPTURE");
        p->cap = path ? fopen(path, "wb") : NULL;
    }
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
    if (p->is_capture && p->src)
        p->src_frames = p->src_frames / p->channels;
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

int snd_pcm_start(void *pcm)
{
    fake_pcm *p = pcm;
    p->started = 1;
    return 0;
}

int snd_pcm_drop(void *pcm)
{
    fake_pcm *p = pcm;
    p->started = 0;
    p->avail = 0;
    return 0;
}

long snd_pcm_avail_update(void *pcm)
{
    fake_pcm *p = pcm;
    if (!p->started) return 0;
    /* One driver period (256 frames) accrues per poll. */
    p->avail += 256;
    if (p->src && p->read_pos + p->avail > p->src_frames)
        p->avail = p->src_frames - p->read_pos;
    if (p->avail < 0) p->avail = 0;
    return p->avail;
}

long snd_pcm_readi(void *pcm, void *buf, unsigned long frames)
{
    fake_pcm *p = pcm;
    long n = (long)frames;
    if (n > p->avail) n = p->avail;
    if (n <= 0) return 0;
    short *out = buf;
    for (long i = 0; i < n; ++i) {
        for (int c = 0; c < p->channels; ++c) {
            long fr = p->read_pos + i;
            if (p->src)
                out[i * p->channels + c] =
                    p->src[(fr % p->src_frames) * p->channels + c];
            else   /* deterministic ramp: frame index mod 2^15, negated on
                      odd channels */
                out[i * p->channels + c] =
                    (short)((c & 1 ? -fr : fr) & 0x7fff);
        }
    }
    p->read_pos += n;
    p->avail -= n;
    return n;
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
    free(p->src);
    free(p);
    return 0;
}
