"""Test environment: virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated on
XLA's host-platform device emulation.  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
