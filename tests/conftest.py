"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-device sharding tests exercise the halo-exchange path without TPUs
(SURVEY.md §4.3); numeric tests need complex128 for the reference's 1e-12
tolerances.

NOTE: jax may already be imported by the interpreter before this module
runs, so we use jax.config.update (effective until backends initialize)
rather than environment variables.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(4302529)
