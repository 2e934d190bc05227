"""openmvs_tpu — a TPU-native dense multi-view-stereo framework.

A ground-up JAX/XLA/Pallas re-design of the photogrammetry tail implemented by
the reference OpenMVS project (posed images + sparse cloud -> dense cloud ->
mesh -> refined mesh -> textured mesh), built TPU-first:

- dense per-pixel estimation (PatchMatch, SGM) as block-synchronous
  checkerboard sweeps over whole depth maps (vectorized XLA / Pallas kernels)
  instead of sequential zig-zag pixel loops;
- multi-view work sharded over a ``jax.sharding.Mesh`` (views x tile axes)
  with ICI collectives instead of event-queue worker threads;
- irreducibly pointer-chasing stages (Delaunay tetrahedralization, s-t
  min-cut, mesh decimation) in native C++ behind an array-in/array-out
  boundary (``openmvs_tpu.native``);
- bit-compatible ``.mvs`` (Interface v7), ``.dmap``, and PLY codecs so SfM
  frontends (COLMAP/OpenMVG) and existing data work unchanged.

Reference behavior contract: cdcseacave/openMVS (see SURVEY.md).
"""

__version__ = "0.1.0"

from openmvs_tpu.config import DenseOptions
from openmvs_tpu.scene import Scene

__all__ = ["DenseOptions", "Scene", "__version__"]


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (first-compile of the
    scoring kernels costs tens of seconds; cached reloads are ~ms).
    Opt out with OMVS_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("OMVS_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "OMVS_COMPILE_CACHE", os.path.expanduser("~/.cache/openmvs_tpu_xla")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compilation_cache()


def _install_safety_hooks() -> None:
    """Env-gated NaN/checkify debug hooks (SURVEY §5.2; utils/safety.py)."""
    from openmvs_tpu.utils import safety

    safety.install()


_install_safety_hooks()
