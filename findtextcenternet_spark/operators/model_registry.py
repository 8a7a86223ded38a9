"""Per-worker model state (north rule: weights broadcast once per executor).

The reference loads its detector/transformer weights once in the processer
constructor (process_ocr_torch.py:12-41). The Spark equivalent is a
per-Python-worker singleton: the first batch of the first task on each
worker process materializes the model, every later task reuses it — zero
per-batch cost, no re-broadcast per stage.

The surrogate's "weights" are its deterministic stamp/decode parameters;
a real deployment replaces ``_load()`` with torch.load of a path shipped
via ``SparkFiles`` / a broadcast variable — the call sites don't change.
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def get_detector_model() -> dict:
    """Resolved once per Python worker process (lru_cache at module scope =
    per-process singleton; Spark reuses workers across tasks)."""
    from ..config import CUT_OFF, NMS_FILL, NMS_INTER, NMS_IOU

    return {
        "kind": "surrogate",
        "pid": os.getpid(),
        "cut_off": CUT_OFF,
        "nms": {"iou": NMS_IOU, "inter": NMS_INTER, "fill": NMS_FILL},
        # real path: torch.load(SparkFiles.get("model.pt"), map_location=...)
    }
