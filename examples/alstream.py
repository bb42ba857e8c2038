"""Queued-buffer streaming player (port of examples/alstream.c).

The reference's StreamPlayer (4 queued buffers x 200 ms each, refilled as
AL_BUFFERS_PROCESSED reports them consumed, /root/reference/examples/
alstream.c:47-320) mapped onto the TPU renderer: the WAV file is read
incrementally, each chunk uploaded into the next free queue buffer, and
the standard streaming loop (poll processed -> unqueue -> refill ->
requeue, restart on starvation) drives playback while the device renders
realtime-paced blocks.

    python examples/alstream.py input.wav [-o out.wav] [--realtime]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from openal_soft_tpu.al import api  # noqa: E402
from openal_soft_tpu.alc.capture import _read_wav  # noqa: E402
from examples.altonegen import _write_wav  # noqa: E402

RATE = 48000
NUM_BUFFERS = 4
BUFFER_MS = 200


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("-o", "--out", default="stream.wav")
    ap.add_argument("--realtime", action="store_true",
                    help="pace the render loop against the wall clock")
    ap.add_argument("--block-ms", type=int, default=100,
                    help="render cadence; every blocking render pays the "
                         "~24 ms tunnel completion+fetch floor "
                         "(PROFILE.md), so 100 ms blocks leave 4x "
                         "realtime headroom where 20 ms blocks cannot "
                         "keep up")
    args = ap.parse_args()

    in_rate, styp, chans, arr = _read_wav(args.input)
    nch = 2 if chans == "stereo" else 1
    fmt = {("mono", "int16"): api.AL_FORMAT_MONO16,
           ("stereo", "int16"): api.AL_FORMAT_STEREO16,
           ("mono", "float32"): api.AL_FORMAT_MONO_FLOAT32,
           ("stereo", "float32"): api.AL_FORMAT_STEREO_FLOAT32,
           ("mono", "uint8"): api.AL_FORMAT_MONO8,
           ("stereo", "uint8"): api.AL_FORMAT_STEREO8}[(chans, styp)]
    chunk_frames = in_rate * BUFFER_MS // 1000
    flat = arr.reshape(-1, nch) if arr.ndim == 1 and nch > 1 else arr
    flat = flat.reshape(-1, nch) if flat.ndim == 1 else flat
    total_frames = flat.shape[0]

    dev = api.alcLoopbackOpenDeviceSOFT(RATE, "stereo", "float32")
    ctx = api.alcCreateContext(dev)
    api.alcMakeContextCurrent(ctx)

    bufs = [api.alGenBuffers(1) for _ in range(NUM_BUFFERS)]
    src = api.alGenSources(1)

    read_pos = 0

    def fill(buf) -> bool:
        nonlocal read_pos
        if read_pos >= total_frames:
            return False
        chunk = flat[read_pos:read_pos + chunk_frames]
        read_pos += chunk.shape[0]
        api.alBufferData(buf, fmt, np.ascontiguousarray(chunk).reshape(-1),
                         in_rate)
        return True

    # Pre-roll the queue (alstream.c StartPlayer).
    queued = 0
    for b in bufs:
        if fill(b):
            api.alSourceQueueBuffers(src, [b])
            queued += 1
    api.alSourcePlay(src)

    out_blocks = []
    block = RATE * args.block_ms // 1000
    t0 = time.perf_counter()
    rendered = 0
    while True:
        out_blocks.append(api.alcRenderSamplesSOFT(dev, block))
        rendered += block
        if args.realtime:
            ahead = rendered / RATE - (time.perf_counter() - t0)
            if ahead > 0:
                time.sleep(ahead)

        processed = api.alGetSourcei(src, api.AL_BUFFERS_PROCESSED)
        while processed > 0:
            bid = api.alSourceUnqueueBuffers(src, 1)
            processed -= 1
            queued -= 1
            if fill(bid):
                api.alSourceQueueBuffers(src, [bid])
                queued += 1

        state = api.alGetSourcei(src, api.AL_SOURCE_STATE)
        if state != api.AL_PLAYING:
            if queued > 0 and read_pos < total_frames:
                # Starved mid-file: restart (alstream.c UpdatePlayer).
                api.alSourcePlay(src)
            else:
                break

    wall = time.perf_counter() - t0
    out = np.concatenate(out_blocks, axis=-1)
    _write_wav(args.out, out, RATE)
    audio_s = rendered / RATE
    print(f"streamed {args.input} ({chans}/{styp}@{in_rate}, "
          f"{total_frames / in_rate:.1f}s) -> {args.out}; "
          f"{audio_s:.1f}s audio in {wall:.1f}s wall "
          f"({audio_s / wall:.2f}x realtime"
          f"{', paced' if args.realtime else ''})")


if __name__ == "__main__":
    main()
