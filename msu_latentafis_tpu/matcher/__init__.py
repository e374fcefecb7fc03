from .engine import MatchEngine, MatchResult
from . import reference_impl

__all__ = ["MatchEngine", "MatchResult", "reference_impl"]
