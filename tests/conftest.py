"""Test configuration: force CPU with an 8-device virtual mesh.

Sharding logic is validated on a virtual CPU mesh
(--xla_force_host_platform_device_count=8) since multi-chip TPU hardware is
not available in CI; see SURVEY.md §4.

NOTE: the environment's sitecustomize imports jax at interpreter boot with
JAX_PLATFORMS=axon (remote TPU tunnel), so env vars are too late here — we
must override via jax.config before any backend is initialized.  Running
unit tests over the tunnel would make every dispatch a network round trip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
