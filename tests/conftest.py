"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware, per the multi-chip validation strategy."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; reclaim the CPU backend explicitly so tests run on
# the virtual 8-device CPU mesh (and float64 works).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import json
import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"

_DTYPES = {"int32": np.int32, "float64": np.float64,
           "complex128": np.complex128, "float32": np.float32,
           "uint8": np.uint8}


class GoldenStore:
    def __init__(self):
        self.meta = {}
        for meta_file in sorted(GOLDEN.glob("meta*.json")):
            with open(meta_file) as f:
                self.meta.update(json.load(f))

    def __call__(self, name: str) -> np.ndarray:
        info = self.meta[name]
        arr = np.fromfile(GOLDEN / f"{name}.bin", dtype=_DTYPES[info["dtype"]])
        return arr.reshape(info["shape"])

    def __contains__(self, name: str) -> bool:
        return name in self.meta


@pytest.fixture(scope="session")
def golden():
    return GoldenStore()


@pytest.fixture(scope="module", autouse=True)
def _xla_cpu_compile_state_guard():
    """The XLA CPU compiler segfaults nondeterministically when compiling
    large programs on top of a few hundred accumulated executables
    (first seen on the 8-way SPMD lowerings in test_scale, then in plain
    full-suite runs as the suite grew). Clearing the compile cache at
    every module boundary bounds the accumulated state; per-module
    recompiles cost seconds against a suite that must not crash."""
    jax.clear_caches()
    yield
