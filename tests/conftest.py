"""Test configuration: CPU backend, x64 for oracle parity, 8 virtual devices.

The 8 virtual CPU devices (xla_force_host_platform_device_count) are the
fake-backend analog for multi-chip tests (SURVEY §4): halo-exchange and
agglomeration logic runs on a real 8-device mesh without TPU hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def default_problem():
    """Reference default-problem fields at a given n (numpy, float64)."""

    def make(n):
        h = 1.0 / n
        idx = np.arange(n + 1) * h
        x = idx[:, None] * np.ones((1, n + 1))
        y = np.ones((n + 1, 1)) * idx[None, :]
        u0 = np.exp(-100.0 * ((x - 0.2) ** 2 + (y - 0.4) ** 2))
        u0[0, :] = 0.0
        u0[-1, :] = 0.0
        u0[:, 0] = 0.0
        u0[:, -1] = 0.0
        v1 = -np.pi * np.sin(np.pi * x) * np.cos(np.pi * y)
        v2 = np.pi * np.cos(np.pi * x) * np.sin(np.pi * y)
        return u0, v1, v2

    return make
