"""Test harness: force CPU JAX with a virtual 8-device mesh.

The container boots an ``axon`` TPU PJRT plugin via sitecustomize and forces
``jax_platforms="axon,cpu"`` at interpreter start, so plain env vars are not
enough: we must update the jax config back to ``cpu`` *before the first
backend use*. Tests always run on host CPU; multi-chip sharding is exercised
with ``--xla_force_host_platform_device_count=8`` (the JAX-native way to test
multi-device programs without hardware — SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
