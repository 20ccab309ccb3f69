"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the multi-chip path); single-chip numerics are identical.

Note: this environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via a
sitecustomize hook, so the env var alone is not enough — use jax.config,
which takes precedence and must run before backends initialise.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
