"""Capture demo (port of examples/alrecord.c).

Records from a capture device (a WAV file or synthetic tone acting as the
microphone stream) at a requested rate/format and writes the captured
samples to a WAV file — exercising the SampleConverter path.

    python examples/alrecord.py [-i mic.wav] [-r RATE] [-o out.wav]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from openal_soft_tpu.al import api  # noqa: E402
from openal_soft_tpu.alc.capture import (ArrayCaptureBackend,  # noqa: E402
                                         WavCaptureBackend)
from examples.altonegen import _write_wav  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", default=None,
                    help="WAV file to use as the microphone stream")
    ap.add_argument("-d", "--device", default=None,
                    help="OS capture device name (ALSA PCM); records from "
                         "the real microphone when libasound is available")
    ap.add_argument("-r", "--rate", type=int, default=44100)
    ap.add_argument("-s", "--seconds", type=float, default=2.0)
    ap.add_argument("-o", "--out", default="record.wav")
    args = ap.parse_args()

    want = int(args.rate * args.seconds)
    if args.device is not None:
        # Real OS capture (ALSA record loop -> converter -> ring).
        dev = api.alcCaptureOpenDeviceByName(args.device, args.rate,
                                             api.AL_FORMAT_MONO16, want)
    else:
        if args.input:
            backend = WavCaptureBackend(args.input)
        else:
            t = np.arange(48000 * 4) / 48000
            sig = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
            backend = ArrayCaptureBackend(sig, 48000, "float32", "mono")
        dev = api.alcCaptureOpenDevice(backend, args.rate,
                                       api.AL_FORMAT_MONO16, want)
    api.alcCaptureStart(dev)
    if args.device is not None:
        import time
        while dev.available_samples() < want:   # real capture fills in time
            time.sleep(0.05)
    n = min(dev.available_samples(), want)
    data = api.alcCaptureSamples(dev, n)
    api.alcCaptureStop(dev)
    api.alcCaptureCloseDevice(dev)

    _write_wav(args.out, data.astype(np.float32) / 32768.0, args.rate)
    print(f"captured {n} frames at {args.rate} Hz "
          f"({backend.native_rate} Hz source) -> {args.out}")


if __name__ == "__main__":
    main()
