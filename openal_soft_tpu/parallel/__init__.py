"""Multi-chip scaling: voice-axis sharding over a jax Mesh."""

from .sharding import (VOICE_AXIS, device_step_inputs,
                       make_sharded_device_step)

__all__ = ["VOICE_AXIS", "device_step_inputs", "make_sharded_device_step"]
