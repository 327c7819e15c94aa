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
