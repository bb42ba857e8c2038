"""Core render engine: device state, voices, panning, HRTF, decoding."""
