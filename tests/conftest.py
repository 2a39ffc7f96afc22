"""Test configuration: run everything on an emulated 8-device CPU mesh.

SURVEY.md section 4: distributed behaviour is tested on emulated host devices
(``xla_force_host_platform_device_count``) instead of real chips.

Stability notes for constrained (1-core) hosts:
- OMP threads pinned to 1: torch (imported by some tests) and XLA:CPU fight
  over the core otherwise, and their thread pools can interlock.
- XLA:CPU async dispatch disabled: its executor has been observed to
  deadlock under 8 forced devices on 1 core (fetches block while the
  machine idles).
- A SIGALRM watchdog fails any test exceeding TEST_TIMEOUT_S instead of
  hanging the whole session.
"""

import os
import signal

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

# VQA_TEST_PLATFORM=tpu leaves the ambient backend (e.g. the axon TPU
# relay registered via the site hook) untouched so TPU-gated tests
# (test_aot.py::test_tpu_platform_export_parity, test_train_fusion.py)
# can run on hardware; the default remains the emulated 8-device CPU mesh.
_TEST_PLATFORM = os.environ.get("VQA_TEST_PLATFORM", "cpu")

if _TEST_PLATFORM == "cpu":
    # Must be set before jax initialises its backends.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if _TEST_PLATFORM == "cpu":
    # A pytest plugin may import jax before this conftest runs, in which
    # case jax.config captured the ambient JAX_PLATFORMS/XLA_FLAGS at
    # import — the os.environ writes above would be ignored. Config
    # updates still apply as long as no backend has been initialised yet.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except AttributeError:  # older jax: XLA_FLAGS path above covers it
        pass
    jax.config.update("jax_cpu_enable_async_dispatch", False)

jax.config.update("jax_enable_x64", False)

TEST_TIMEOUT_S = int(os.environ.get("VQA_TEST_TIMEOUT_S", "600"))


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    """Per-test watchdog: raise instead of hanging the session."""

    def _alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded {TEST_TIMEOUT_S}s (conftest watchdog)"
        )

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(TEST_TIMEOUT_S)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
