"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs
the multichip path and benches on a real TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers the 'axon' TPU platform before any
# user code runs, so the env var alone is not enough — force via config.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the e2e/multistream/serving suites spend
# most of their wall time re-compiling identical programs run-to-run on
# this single-core host; the cache cuts repeat runs from minutes to
# seconds.
#
# The cache dir is keyed by a HOST CPU-FEATURE FINGERPRINT: XLA:CPU's
# AOT loader will load a cached executable compiled on a machine with a
# different feature set with only a warning ("... could lead to
# execution errors such as SIGILL").  Fingerprinting the dir means a
# genuinely different host recompiles instead of running mismatched
# code.  (Ruled out as the round-4 accuracy-sweep divergence, though:
# a fresh-cache run reproduces the identical seed-5 number, and the
# loader prints the warning even for same-host artifacts because XLA
# appends its own tuning flags — prefer-no-scatter/prefer-no-gather —
# to the "machine features" it diffs.  This keying is hygiene, not the
# sweep fix; the sweep bars document the real platform divergence.)
def _host_fingerprint() -> str:
    import hashlib
    import platform
    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feat = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.md5(
        (platform.machine() + feat).encode()).hexdigest()[:10]


jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser(
                      f"~/.cache/alvaar_jax_cache_{_host_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules whose tests compile + run full end-to-end pipelines (minutes each on
# the single-core CPU host). They form the "slow" tier; CI / inner-loop runs
# use `pytest -m "not slow"` (~6 min with a warm compile cache on this
# single-core host; ~9-10 min when a config-default change invalidates
# the cached step programs), the full tier runs everything.
_SLOW_MODULES = {
    "test_e2e",
    "test_loop_e2e",
    "test_multistream",
    "test_accuracy_sweep",
    "test_checkpoint",
    "test_pallas_klt",
    "test_system_extra",
    "test_ref_parity",
    "test_ba_oracle",
    "test_serving",
    "test_lowcontrast",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__ if item.module else ""
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
