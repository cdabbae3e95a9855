"""Structured metrics logging — jsonl next to the reference's greppable
``syd:``/``sydall`` print lines (reference train_causal.py:55,108,142-160;
SURVEY.md §5 keeps the metric names observable)."""
from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


class MetricsLogger:
    """Append-only jsonl metrics sink; no-op when path is falsy."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._f = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)

    def log(self, event: str, **fields: Any) -> None:
        if self._f is None:
            return
        rec = {"ts": round(time.time(), 3), "event": event}
        rec.update(fields)
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None
