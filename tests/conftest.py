"""Test configuration: run the suite on CPU with 8 fake devices.

The container's sitecustomize preloads JAX with the remote-TPU ("axon")
backend in every Python process, so plain env vars are too late — we
override the already-imported jax config instead. Multi-chip sharding tests
then run against the virtual 8-device CPU mesh (the standard JAX substitute
for a pod slice); numerical solver tests use x64 on CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize — reconfigure)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
