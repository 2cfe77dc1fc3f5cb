"""Test harness: run everything on a virtual 8-device CPU platform.

Multi-chip sharding tests exercise real ``jax.sharding.Mesh`` semantics
without TPU hardware (XLA collectives run over the host platform).

Note: this machine's sitecustomize force-registers the ``axon`` TPU backend
via ``jax.config.update("jax_platforms", "axon,cpu")`` — the env var alone
does not win, so we update the config back after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
