"""JSONL metrics logging (SURVEY.md §5 "Metrics/logging/observability")."""
from __future__ import annotations

import json
import sys
import time
from typing import Any, IO


class JsonlLogger:
    """Append one JSON object per event to a file (or stderr if path='')."""

    def __init__(self, path: str = "") -> None:
        self.path = path
        self._fh: IO[str] | None = None
        if path:
            self._fh = open(path, "a")

    def log(self, **fields: Any) -> None:
        fields.setdefault("ts", time.time())
        line = json.dumps(fields, default=float)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line, file=sys.stderr)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "JsonlLogger":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()
