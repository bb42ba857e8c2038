"""Multi-chip scaling: voice-axis sharding over a device mesh."""

from .sharding import make_sharded_render_step

__all__ = ["make_sharded_render_step"]
