"""Test configuration: run everything on an emulated 8-device CPU mesh.

SURVEY.md section 4: distributed behaviour is tested on emulated host devices
(``xla_force_host_platform_device_count``) instead of real chips.
"""

import os

# Must be set before jax initialises its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
