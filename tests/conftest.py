"""Test environment: virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated on
XLA's host-platform device emulation.  The env vars alone are not enough in
environments whose sitecustomize pre-imports jax with a plugin platform, so
the platform is also forced through jax.config (which wins post-import).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Hermetic tests: never let a model constructor reach the network for a
# missing checkpoint (download-on-miss is exercised against a monkeypatched
# transport in test_download_wiring.py).
os.environ["GANSPACE_AUTO_DOWNLOAD"] = "0"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: production-shape runs (minutes); deselect with "
        "-m 'not slow'")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path covers it
