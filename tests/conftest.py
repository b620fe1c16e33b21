"""Test config: run everything on a simulated 8-device CPU mesh.

The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so we force the
CPU backend through jax.config before any backend is initialized (conftest
runs before test modules import jax code that touches devices).

Tiers (VERDICT r3 #3 — evidence that takes hours to check is evidence
nobody checks):

- ``pytest -m fast``  — the sub-10-minute tier: every subsystem covered,
  including one tp / one sp / one pp / one int8 case.  Any test not marked
  ``slow`` is ``fast``; a test explicitly marked ``fast`` stays fast even
  inside a slow module (module-level ``pytestmark = pytest.mark.slow``).
- ``pytest``          — the full suite (slow compile-heavy equality tests
  included); runtime documented in PARITY.md.

Every test gets a watchdog timeout (default 600 s, override with
``@pytest.mark.timeout(N)`` or ``PODT_TEST_TIMEOUT``) so a hang fails the
test instead of wedging the suite.
"""
import os
import signal

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: sub-10-minute tier (auto-added to everything not marked slow)")
    config.addinivalue_line("markers", "slow: compile-heavy / long tests, excluded from `-m fast`")
    config.addinivalue_line("markers", "timeout(seconds): per-test watchdog override")


def pytest_collection_modifyitems(config, items):
    for item in items:
        # function-level @pytest.mark.fast overrides a module-level slow mark
        explicit_fast = any(
            m.name == "fast"
            for m in getattr(getattr(item, "function", None), "pytestmark", [])
        )
        if explicit_fast or "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    marker = item.get_closest_marker("timeout")
    seconds = (
        int(marker.args[0])
        if marker
        else int(os.environ.get("PODT_TEST_TIMEOUT", "600"))
    )

    def _alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded the {seconds}s watchdog (tests/conftest.py)"
        )

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
