import os

# Tests run on a virtual 8-device CPU mesh.  NOTE: the axon sitecustomize
# (/root/.axon_site) sets JAX_PLATFORMS=axon at interpreter startup, so a
# plain setdefault (or even `env JAX_PLATFORMS=cpu`) is silently overridden —
# assign unconditionally BEFORE jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
