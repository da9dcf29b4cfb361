"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding paths are
validated on a virtual CPU mesh (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip). Must run before jax
is imported anywhere.
"""

import os

# NOTE: the axon TPU plugin self-registers from sitecustomize and the
# image env pins JAX_PLATFORMS=axon, so a setdefault is not enough —
# tests must force the CPU backend explicitly (the device tunnel adds
# tens of seconds of latency per compile, which makes TPU-backed test
# runs unusable; bit-exactness is identical on CPU). Set
# SNARKOS_TPU_TEST_PLATFORM=axon to run the suite on the real chip.
_platform = os.environ.get("SNARKOS_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the limb-arithmetic scan bodies are large
# (O(L^2) ops per mont_mul) and CPU XLA compiles them slowly; cache across
# test sessions.
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)  # wins over plugin re-registration
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Minimal async test support (pytest-asyncio is not in the image): run
# coroutine tests with asyncio.run.
import asyncio  # noqa: E402
import inspect  # noqa: E402


def pytest_pyfunc_call(pyfuncitem):
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        kwargs = {
            name: pyfuncitem.funcargs[name]
            for name in pyfuncitem._fixtureinfo.argnames
        }
        asyncio.run(fn(**kwargs))
        return True
    return None


def pytest_configure(config):
    config.addinivalue_line("markers", "asyncio: async test (run via asyncio.run)")
