"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import os

# Hard override: the shell may pre-set JAX_PLATFORMS=axon (remote TPU
# tunnel); tests must run locally on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize hook registers the remote-TPU PJRT plugin at
# interpreter start and sets jax_platforms="axon,cpu", overriding the env
# var above — undo it at the config level before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
