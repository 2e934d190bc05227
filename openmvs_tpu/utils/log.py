"""Logging + scoped wall-clock timing.

Equivalent of the reference's Log singleton + TD_TIMER scoped timers
(libs/Common/Log.h:41, Common.h:45-71): every pipeline stage logs a summary
line with its elapsed time; verbosity via the OPENMVS_TPU_VERBOSE env var.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

_FORMAT = "%(asctime)s %(name)s: %(message)s"
_configured = False


def get_logger(name: str) -> logging.Logger:
    global _configured
    if not _configured:
        level = logging.DEBUG if os.environ.get("OPENMVS_TPU_VERBOSE") else logging.INFO
        logging.basicConfig(level=level, format=_FORMAT, datefmt="%H:%M:%S")
        _configured = True
    return logging.getLogger(f"omvs.{name}")


@contextlib.contextmanager
def timed(log: logging.Logger, label: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log.info("%s (%.2fs)", label, time.perf_counter() - t0)
