"""Test configuration.

Environment notes:
* In the axon harness, jax binds the REAL TPU chip at interpreter start
  (sitecustomize registers the 'axon' PJRT plugin before any conftest runs),
  so device tests exercise actual v5e Mosaic compilation. A persistent
  compilation cache makes repeat runs fast.
* Multi-chip sharding tests need a virtual CPU mesh, which requires a clean
  subprocess (PYTHONPATH="" PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu); see
  tests/test_multichip.py. The env defaults below cover non-axon
  environments where in-process forcing works.
* An EXPLICIT ``JAX_PLATFORMS=cpu`` in the caller's environment is honored
  even under axon: the sitecustomize overrides the env with
  ``jax_platforms="axon,cpu"`` at interpreter start, so without the guard
  below a tunnel outage makes the very first ``device_put`` block forever
  inside ``make_c_api_client`` (no timeout) and the whole suite hangs.
  ``JAX_PLATFORMS=cpu python -m pytest tests/`` must mean cpu.
"""

import os

_explicit_platforms = os.environ.get("JAX_PLATFORMS")
if _explicit_platforms and not any(
        p in _explicit_platforms for p in ("axon", "tpu")):
    try:
        import jax
        from jax._src import xla_bridge as _xb

        if "axon" in getattr(_xb, "_backend_factories", {}):
            _xb._backend_factories.pop("axon", None)
            jax.config.update("jax_platforms", _explicit_platforms)
    except Exception:
        pass

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_blazeseq")


def pytest_configure(config):
    # The persistent compilation cache is OPT-IN for test runs
    # (BLAZESEQ_TEST_CACHE=1): on the CPU backend, jax 0.9.0's cache
    # deserializer (compilation_cache.get_executable_and_time) segfaults
    # nondeterministically in long cold-cache processes — observed twice
    # at the same point of a full-suite run on this image, never in
    # smaller processes, never under ASan in our own native layer. Warm
    # re-runs that want the ~10x speedup can enable it explicitly; the
    # default favors a suite that cannot be killed by a cache artifact.
    if os.environ.get("BLAZESEQ_TEST_CACHE", "0") != "1":
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


import pytest  # noqa: E402  (env setup above must run before plugins)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap the number of live compiled executables in the suite process.

    The full suite compiles hundreds of kernel variants; with all of them
    held live, XLA:CPU segfaulted DETERMINISTICALLY at the same late test
    on this image (inside backend compile — and, when the persistent
    cache was on, inside its deserializer; 4/4 full cold runs, never in
    any subset run, never under ASan in our own native layer). Dropping
    jit caches at module boundaries keeps intra-module warmth while
    bounding cumulative executable state; measured overhead is small next
    to the per-module compile cost it already pays."""
    yield
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass


DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
