"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4 test strategy). This must run
before any jax import: JAX_PLATFORMS is hard-set (the environment presets
JAX_PLATFORMS=axon for the TPU tunnel, which tests never want).
"""

import os

import pytest

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of XLA:CPU programs (8 virtual devices
    each); keeping them all live for the whole run intermittently crashes the
    interpreter (SIGSEGV/SIGABRT) deep into the workload tests. Per-module
    cache clearing keeps the live-executable set bounded; per-module (not
    per-test) so intra-module jit reuse still works.
    """
    yield
    import jax

    jax.clear_caches()

# make tests/ helpers (ref_stub_util, joint_trunk_util) importable as plain
# modules regardless of how pytest resolved rootdir/sys.path
import os as _os
import sys as _sys

_HERE = _os.path.dirname(_os.path.abspath(__file__))
if _HERE not in _sys.path:
    _sys.path.insert(0, _HERE)
