"""Structured logging and counters.

Replaces the reference's print-based observability (SURVEY.md §5) with a
structured logger: JSON-lines event records (stage timings, minutiae
counts, template sizes, score stats) suitable for production ingestion,
plus in-process counters.
"""
from __future__ import annotations

import json
import logging
import sys
import time
from collections import Counter
from typing import Any, Dict, Optional

_logger = logging.getLogger("msu_latentafis_tpu")
if not _logger.handlers:
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("%(message)s"))
    _logger.addHandler(h)
    _logger.setLevel(logging.INFO)

counters: Counter = Counter()


def event(kind: str, **fields: Any) -> None:
    """Emit one structured JSON event line."""
    rec: Dict[str, Any] = {"ts": round(time.time(), 3), "event": kind}
    rec.update(fields)
    _logger.info(json.dumps(rec, default=str))


def count(name: str, n: int = 1) -> None:
    counters[name] += n


def score_stats(scores) -> Dict[str, float]:
    import numpy as np
    s = np.asarray(scores, np.float64)
    valid = s[s >= 0]
    if len(valid) == 0:
        return {"n": 0}
    return {"n": int(len(valid)), "mean": float(valid.mean()),
            "max": float(valid.max()),
            "p99": float(np.percentile(valid, 99))}
