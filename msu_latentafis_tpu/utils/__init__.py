from . import synthetic, timing, cache, logging

__all__ = ["synthetic", "timing", "cache", "logging"]
