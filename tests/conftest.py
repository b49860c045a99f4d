"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: the env var JAX_PLATFORMS can be clobbered by TPU plugin wrappers in
this environment, so we force the platform through jax.config, which wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Every compiled XLA:CPU executable pins ~6 anonymous memory mappings for the
# life of the jit cache; a full-suite session compiles enough programs to
# cross vm.max_map_count (65530 by default), at which point LLVM's next mmap
# fails and the process dies with a segfault mid-compile. Dropping the jit
# caches when the map count nears the limit keeps the session bounded at the
# cost of recompiling shared programs in later modules.
_MAPS_SOFT_LIMIT = 40_000


@pytest.fixture(autouse=True)
def _bound_memory_maps():
    yield
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > _MAPS_SOFT_LIMIT:
        jax.clear_caches()
