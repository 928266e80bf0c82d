"""Logging setup + structured JSON stats.

Parity with /root/reference/audio_slowfast/utils/logging.py:40-99: stdlib
logging configured once, non-primary processes silenced, ``log_json_stats``
emitting one JSON line per meter event (the schema downstream dashboards
parse). loguru is not a baked dependency; the stdlib logger carries the same
format.
"""

from __future__ import annotations

import json
import logging
import os
import sys
from typing import Any, Dict

_FORMAT = "[%(asctime)s][%(levelname)s] %(name)s: %(lineno)4d: %(message)s"


def setup_logging(output_dir: str | None = None, is_primary: bool = True) -> None:
    root = logging.getLogger("asf_tpu")
    root.setLevel(logging.INFO if is_primary else logging.ERROR)
    root.propagate = False
    if root.handlers:
        return
    formatter = logging.Formatter(_FORMAT, datefmt="%m/%d %H:%M:%S")
    if is_primary:
        sh = logging.StreamHandler(stream=sys.stdout)
        sh.setFormatter(formatter)
        root.addHandler(sh)
    if output_dir and is_primary:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "stdout.log"))
        fh.setFormatter(formatter)
        root.addHandler(fh)


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(f"asf_tpu.{name}")


def log_json_stats(stats: Dict[str, Any]) -> None:
    """One-line JSON stats record (parity with utils/logging.py:80-99)."""
    stats = {k: float(f"{v:.5f}") if isinstance(v, float) else v for k, v in stats.items()}
    json_stats = json.dumps(stats, sort_keys=True)
    logger = get_logger(__name__)
    logger.info("json_stats: {:s}".format(json_stats))
    if os.environ.get("TRAIN_STATS"):
        with open(os.environ["TRAIN_STATS"], "a") as f:
            f.write(json_stats + "\n")
