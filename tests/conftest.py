"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding tests run on fake devices
(xla_force_host_platform_device_count), per the TPU-less CI contract.
The environment's sitecustomize pre-imports jax pinned to the real TPU
(platform "axon"), so env vars alone are too late — we must override via
jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_batch():
    from physdock_tpu.data.synthetic import make_synthetic_batch

    return make_synthetic_batch(n_tokens=16, n_atoms=48, n_msa=4, n_ligand_tokens=6)


@pytest.fixture(scope="session")
def toy_config():
    from physdock_tpu.config import PhysDockConfig

    return PhysDockConfig.named("toy", num_augmentation_sample=2)
