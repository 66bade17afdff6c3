"""Test config: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin registers itself via sitecustomize and wins backend
selection over the JAX_PLATFORMS env var, so we must force the platform
through jax.config before any backend initializes. Must run before any
test module imports jax-dependent code.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# pin the CLI/pipeline surface to the single-device path by default:
# with 8 virtual devices visible, auto-mesh would otherwise flip every
# test onto the sharded path. Mesh tests opt in via --devices=N.
os.environ.setdefault("PLOIDYFROST_DEVICES", "1")
