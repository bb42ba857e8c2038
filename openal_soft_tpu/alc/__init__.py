"""Device/context management layer (the ALC side of the API)."""

from .context import Context
from .device import LoopbackDevice

__all__ = ["Context", "LoopbackDevice"]
