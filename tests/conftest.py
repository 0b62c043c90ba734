import os

# Tests run on a virtual 8-device CPU mesh.
#
# CRITICAL: the axon sitecustomize (/root/.axon_site, on PYTHONPATH) imports
# jax at interpreter startup with JAX_PLATFORMS=axon, so jax's config has
# already snapshotted the platform by the time any test code runs — setting
# the env var here (or via `env JAX_PLATFORMS=cpu`) is silently ignored and
# tests would run against the remote TPU tunnel.  jax.config.update is the
# only override that works.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode Mosaic kernel tests (~0.5-2 min each; the "
        "full suite runs them — deselect with -m 'not slow' for quick "
        "iteration, but ALWAYS run the full suite before committing)",
    )
