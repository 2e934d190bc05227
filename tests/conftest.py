import os

# The suite keeps BOTH backends live:
#   - the CPU platform gets 8 virtual devices so multi-chip sharding paths are
#     exercised without TPU hardware, and is the DEFAULT device so the bulk of
#     the suite is fast and deterministic;
#   - the accelerator platform (when present) stays initialized and reachable,
#     so TPU-capable tests (Pallas kernel parity, the gated full pipeline) run
#     for real instead of skipping.
# The gated full-pipeline test (OMVS_RUN_PIPELINE_TEST=1) keeps the native
# accelerator as the default device to exercise the production TPU path.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("OMVS_RUN_PIPELINE_TEST"):
    try:
        jax.config.update(
            "jax_default_device", jax.local_devices(backend="cpu")[0]
        )
    except RuntimeError:  # pragma: no cover - cpu platform always exists
        pass

# CPU-only runs exercise the Pallas kernels in INTERPRET mode, where the
# round-4 production defaults (25-texel grid chunks + hoisted source band)
# are ~25x slower to emulate than the minimal config — pin the small
# config there.  When a real accelerator is present the suite keeps the
# SHIPPING defaults so the hardware parity tests cover what users run.
try:
    _accel = any(d.platform != "cpu" for d in jax.devices())
except RuntimeError:  # pragma: no cover
    _accel = False
if not _accel:
    os.environ.setdefault("OMVS_TEXEL_CHUNK", "5")
    os.environ.setdefault("OMVS_HOIST", "0")

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/apps/Tests/data"


def tpu_devices():
    """Accelerator devices if any non-CPU platform is initialized, else []."""
    try:
        return [d for d in jax.devices() if d.platform != "cpu"]
    except RuntimeError:
        return []


@pytest.fixture(scope="session")
def test_scene_path():
    path = os.path.join(REFERENCE_DATA, "scene.mvs")
    if not os.path.exists(path):
        pytest.skip("bundled test scene not available")
    return path
