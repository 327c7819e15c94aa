"""Test env: force CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (SURVEY.md par. 4:
`xla_force_host_platform_device_count`) so CI needs no TPU pod. Must
run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    # If a TPU plugin was registered by sitecustomize before this
    # conftest ran, drop its factory so backend init doesn't spend ~60s
    # handshaking hardware the tests never use.
    import jax._src.xla_bridge as _xb

    # Pop only the axon factory: the 'tpu' factory must stay registered
    # because downstream imports (checkify via optax) validate platform
    # names against it, and it never initializes under jax_platforms=cpu.
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import pytest  # noqa: E402

REFERENCE_INPUT = "/root/reference/input"


@pytest.fixture(scope="session")
def box_scene():
    from tinypathtracer_tpu import load_scene

    return load_scene(f"{REFERENCE_INPUT}/box.gltf")


@pytest.fixture(scope="session")
def ball_scene():
    from tinypathtracer_tpu import load_scene

    return load_scene(f"{REFERENCE_INPUT}/ball.gltf")
