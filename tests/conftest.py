"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding
(`parallel/`) is exercised without TPU hardware, mirroring how the driver
validates `__graft_entry__.dryrun_multichip`.  The axon TPU plugin in this
image overrides `JAX_PLATFORMS`, so the platform is forced via
`jax.config.update` (env vars alone do not stick).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
