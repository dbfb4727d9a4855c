"""Test configuration: 8 virtual CPU devices + f64.

SURVEY.md S4 item 5: multi-host semantics without a cluster — a real Mesh with
real psum/ppermute collectives over 8 host-platform devices. f64 makes the CPU
test run the "GPy-equivalent f64 reference" of BASELINE.md.

NOTE: in this environment jax is pre-imported at interpreter startup by the
axon sitecustomize with JAX_PLATFORMS=axon already in the env, so we must
*overwrite* (not setdefault) the platform and rely on the backend not having
been initialized yet — jax.config.update('jax_platforms') and XLA_FLAGS are
both read lazily at first backend use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already in sys.modules; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the sharding gates compile large shard_map
# graphs (eigh ladder x layers x fwd/bwd) — cold-compiling them dominated the
# 30-minute round-1 suite wall time; warm runs hit this cache instead.
# RGP_TEST_CACHE_DIR overrides the location (point it at an empty dir to
# measure true cold-suite wall time without disturbing the shared cache).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("RGP_TEST_CACHE_DIR", "/tmp/rgp_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {len(jax.devices())}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
