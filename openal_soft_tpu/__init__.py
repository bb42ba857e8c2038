"""openal_soft_tpu — a TPU-native 3D spatial audio rendering framework.

A ground-up re-realization of the capabilities of OpenAL Soft (the reference
C++ implementation of the OpenAL 3D audio API) designed TPU-first:

* All per-block DSP — per-voice resampling, gain-ramped channel mixing, HRTF
  binaural FIR rendering, ambisonic encode/decode, EFX effects — runs on TPU
  as jitted XLA graphs / Pallas kernels over batched structure-of-arrays
  (SoA) voice state.  The voice axis (sequential in the reference,
  ``alu.cpp:2193``) is the TPU batch axis.
* Host side (Python, with C++ runtime components under ``native/``) manages
  AL/ALC objects, buffer upload/decoding, voice allocation, the voice-change
  queue and the async event queue — mirroring the reference's strict split
  between the API threads and the mixer thread (atomic prop swaps /
  voice-change lists, see SURVEY.md §1).

Layout:
  ``constants``  — structural constants (block size, fixed-point formats, …)
  ``ops``        — device kernels + table generation + numpy spec oracle
  ``core``       — render engine: device/context state, voices, panning, hrtf
  ``alc``        — device/context management, config, backends
  ``al``         — the AL API object layer (sources, buffers, effects, …)
  ``parallel``   — multi-chip sharding of the voice axis over a Mesh
  ``utils``      — wav io, mhr/ambdec parsers, info tools
"""

__version__ = "0.1.0"
