/* Fake libpulse-simple for backend testing without a sound server.
 *
 * Implements the pa_simple surface the PulseBackend / PulseCaptureBackend
 * bind (openal_soft_tpu/alc/pulse.py):
 *  - playback streams capture every pa_simple_write byte to the file
 *    named by $FAKE_PULSE_CAPTURE, so tests can assert the exact PCM
 *    stream the mixer loop produced;
 *  - record streams serve S16 frames from the raw file named by
 *    $FAKE_PULSE_SOURCE (interleaved, matching the sample spec), or a
 *    deterministic frame-index ramp when unset.
 *
 * Built at test time:  gcc -shared -fPIC -o libfakepulse.so fake_pulse.c
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    int format;
    unsigned rate;
    unsigned char channels;
} pa_sample_spec;

typedef struct {
    FILE *cap;
    int is_record;
    int channels;
    int sample_bytes;
    short *src;
    long src_frames;
    long read_pos;
} fake_stream;

static int fmt_bytes(int fmt)
{
    switch (fmt) {
    case 0: return 1;            /* U8 */
    case 3: return 2;            /* S16LE */
    case 5: case 7: return 4;    /* FLOAT32LE / S32LE */
    }
    return 4;
}

void *pa_simple_new(const char *server, const char *name, int dir,
                    const char *dev, const char *stream_name,
                    const pa_sample_spec *ss, const void *map,
                    const void *attr, int *error)
{
    (void)server; (void)name; (void)dev; (void)stream_name;
    (void)map; (void)attr;
    fake_stream *s = calloc(1, sizeof(*s));
    if (!s) { if (error) *error = -1; return NULL; }
    s->channels = ss->channels;
    s->sample_bytes = fmt_bytes(ss->format);
    if (dir == 2) {              /* PA_STREAM_RECORD */
        s->is_record = 1;
        const char *path = getenv("FAKE_PULSE_SOURCE");
        if (path) {
            FILE *f = fopen(path, "rb");
            if (f) {
                fseek(f, 0, SEEK_END);
                long bytes = ftell(f);
                fseek(f, 0, SEEK_SET);
                s->src_frames = bytes / (2 * s->channels);
                s->src = malloc((size_t)bytes);
                if (fread(s->src, 1, (size_t)bytes, f) != (size_t)bytes)
                    s->src_frames = 0;
                fclose(f);
            }
        }
    } else {
        const char *path = getenv("FAKE_PULSE_CAPTURE");
        if (path)
            s->cap = fopen(path, "wb");
    }
    if (error) *error = 0;
    return s;
}

int pa_simple_write(void *p, const void *data, size_t bytes, int *error)
{
    fake_stream *s = p;
    if (s->cap) {
        fwrite(data, 1, bytes, s->cap);
        fflush(s->cap);
    }
    if (error) *error = 0;
    return 0;
}

int pa_simple_read(void *p, void *data, size_t bytes, int *error)
{
    fake_stream *s = p;
    long frames = (long)(bytes / (2 * s->channels));
    short *out = data;
    for (long i = 0; i < frames; i++) {
        for (int c = 0; c < s->channels; c++) {
            if (s->src && s->read_pos < s->src_frames)
                out[i * s->channels + c] =
                    s->src[s->read_pos * s->channels + c];
            else
                out[i * s->channels + c] = (short)(s->read_pos & 0x7fff);
        }
        s->read_pos++;
    }
    if (error) *error = 0;
    return 0;
}

int pa_simple_drain(void *p, int *error)
{
    (void)p;
    if (error) *error = 0;
    return 0;
}

void pa_simple_free(void *p)
{
    fake_stream *s = p;
    if (!s) return;
    if (s->cap) fclose(s->cap);
    free(s->src);
    free(s);
}
