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
        level = (logging.DEBUG
                 if (os.environ.get("OPENMVS_TPU_VERBOSE")
                     or os.environ.get("OMVS_VERBOSE", "2") not in ("", "0", "1", "2"))
                 else logging.INFO)
        logging.basicConfig(level=level, format=_FORMAT, datefmt="%H:%M:%S")
        _configured = True
    return logging.getLogger(f"omvs.{name}")


@contextlib.contextmanager
def timed(log: logging.Logger, label: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if os.environ.get("OMVS_LOG_RSS"):
            # ru_maxrss is the process PEAK (monotone): the per-stage print
            # identifies which stage grew it
            import resource

            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
            log.info("%s (%.2fs, peak_rss %.2f GB)", label,
                     time.perf_counter() - t0, rss)
        else:
            log.info("%s (%.2fs)", label, time.perf_counter() - t0)


# verbosity level gating extra artifact dumps (the reference's
# g_nVerbosityLevel, Common.h:17-41; levels >2 dump per-view depth/normal/
# confidence images, >4 per-view point clouds, SceneDensify.cpp:2099-2110).
# OMVS_VERBOSE and OPENMVS_TPU_VERBOSE are aliases (the larger wins) so one
# knob controls both log level and artifact dumps.
def verbosity() -> int:
    vals = [2]
    for var in ("OMVS_VERBOSE", "OPENMVS_TPU_VERBOSE"):
        try:
            vals.append(int(os.environ.get(var, "0")))
        except ValueError:
            pass
    return max(vals)


def dump_depth_artifacts(folder: str, view_id: int, depth, normal=None,
                         conf=None) -> None:
    """Write depthNNNN.png (+ normal/conf) visualizations when verbosity>2."""
    if verbosity() <= 2 or not folder:
        return
    import numpy as np

    try:
        import cv2
    except Exception:
        return
    os.makedirs(folder, exist_ok=True)
    d = np.asarray(depth)
    valid = d > 0
    if valid.any():
        lo, hi = np.percentile(d[valid], 2), np.percentile(d[valid], 98)
        vis = np.where(valid, np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1), 0)
        cv2.imwrite(os.path.join(folder, f"depth{view_id:04d}.png"),
                    cv2.applyColorMap((vis * 255).astype(np.uint8),
                                      cv2.COLORMAP_JET))
    if normal is not None:
        n = np.asarray(normal)
        cv2.imwrite(os.path.join(folder, f"normal{view_id:04d}.png"),
                    ((n * 0.5 + 0.5) * 255).astype(np.uint8)[..., ::-1])
    if conf is not None:
        c = np.clip(np.asarray(conf), 0, 1)
        cv2.imwrite(os.path.join(folder, f"conf{view_id:04d}.png"),
                    (c * 255).astype(np.uint8))


class profile_trace:
    """jax.profiler trace context gated by OMVS_PROFILE_DIR: a per-stage
    device-time breakdown lands as a TensorBoard trace (the structured
    analogue of the reference's TD_TIMER VERBOSE lines)."""

    def __init__(self, tag: str):
        self.dir = os.environ.get("OMVS_PROFILE_DIR", "")
        self.tag = tag
        self._cm = None

    def __enter__(self):
        if self.dir:
            import jax

            self._cm = jax.profiler.trace(
                os.path.join(self.dir, self.tag), create_perfetto_link=False)
            self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        if self._cm is not None:
            self._cm.__exit__(*exc)
        return False


class Progress:
    """ETA progress reporter (the reference's Util::Progress, Util.h:770):
    logs "k/n (p%%, ETA mm:ss)" at most once per `interval` seconds, plus a
    final summary line with the overall rate."""

    def __init__(self, log: logging.Logger, label: str, total: int,
                 interval: float = 5.0):
        self.log = log
        self.label = label
        self.total = max(int(total), 1)
        self.interval = interval
        self.done = 0
        self.t0 = time.perf_counter()
        self._last = 0.0

    @staticmethod
    def _fmt(s: float) -> str:
        s = int(max(s, 0))
        return f"{s // 3600}:{s % 3600 // 60:02d}:{s % 60:02d}" if s >= 3600 \
            else f"{s // 60}:{s % 60:02d}"

    def step(self, k: int = 1):
        self.done += k
        now = time.perf_counter()
        if now - self._last < self.interval and self.done < self.total:
            return
        self._last = now
        el = now - self.t0
        eta = el / self.done * (self.total - self.done) if self.done else 0.0
        self.log.info("%s: %d/%d (%.0f%%, %s elapsed, ETA %s)",
                      self.label, self.done, self.total,
                      100.0 * self.done / self.total,
                      self._fmt(el), self._fmt(eta))

    def close(self):
        el = time.perf_counter() - self.t0
        self.log.info("%s: %d done in %s (%.2f/s)", self.label, self.done,
                      self._fmt(el), self.done / max(el, 1e-9))
