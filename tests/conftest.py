"""Test environment: run everything on a virtual 8-device CPU mesh.

This is the JAX analog of the reference's compile-time backend substitution
(the `desktop_sph_fluid` target replacing OLED/MPU6050 hardware with SDL and
constant gravity, SURVEY.md §4) — tests never need a real TPU, and
multi-chip sharding tests get 8 virtual devices.

The platform is forced through jax.config (not env vars): some
environments inject a sitecustomize that registers a TPU plugin at
interpreter startup and selects it regardless of JAX_PLATFORMS, which
would silently run the whole suite on one remote TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {len(jax.devices())}"
