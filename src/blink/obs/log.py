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


class TensorboardLogger:
    """Optional tensorboard scalars/images (SURVEY.md §5 'tensorboard
    scalars and rendered-image summaries'). Uses torch.utils.tensorboard
    (present in this environment); degrades to a no-op if unavailable."""

    def __init__(self, logdir: str = "") -> None:
        self._w = None
        if logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._w = SummaryWriter(logdir)
            except Exception:  # missing backend — metrics still in JSONL
                self._w = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def image(self, tag: str, hwc_image, step: int) -> None:
        """hwc_image: (H, W, 3) float array in linear radiance."""
        if self._w is not None:
            import numpy as np

            img = np.clip(np.asarray(hwc_image), 0.0, 1.0)
            self._w.add_image(tag, img.transpose(2, 0, 1), step)

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
            self._w = None
