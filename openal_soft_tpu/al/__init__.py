"""AL object layer: sources, buffers, listener, effects."""

from .buffer import Buffer
from .source import Source

__all__ = ["Buffer", "Source"]
