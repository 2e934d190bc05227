import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs them).
# Exception: the gated full-pipeline test (OMVS_RUN_PIPELINE_TEST=1) keeps
# the native backend so it exercises the real TPU path.
if not os.environ.get("OMVS_RUN_PIPELINE_TEST"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/apps/Tests/data"


@pytest.fixture(scope="session")
def test_scene_path():
    path = os.path.join(REFERENCE_DATA, "scene.mvs")
    if not os.path.exists(path):
        pytest.skip("bundled test scene not available")
    return path
