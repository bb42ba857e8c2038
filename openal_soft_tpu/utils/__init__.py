"""Host utilities: resamplers, wav io, parsers, info tools."""
