"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated on
`xla_force_host_platform_device_count=8` CPU devices (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).

NOTE the env-var route (JAX_PLATFORMS=cpu) does NOT work here: the TPU
harness installs a sitecustomize that registers the axon PJRT plugin at
interpreter start and pins the platform before conftest runs.  The config
API below takes precedence at backend initialization, which is still lazy
at this point; XLA_FLAGS must also be set before the first backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # overrides the axon preset
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: amortizes XLA compiles across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/ocs2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
