"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the driver separately dry-runs the
real multi-chip path through ``__graft_entry__.dryrun_multichip``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env points at the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The TPU tunnel's sitecustomize imports jax at interpreter startup, BEFORE
# this conftest runs — env vars alone are then too late. Backends initialize
# lazily, so overriding the config value here still wins.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_test_graph(
    n=48,
    e=160,
    n_pad=64,
    e_pad=192,
    num_node_features=4,
    num_edge_features=3,
    output_size=2,
    node_type_index=2,
    seed=0,
):
    """A small random padded Graph for unit tests. Feature layout mirrors the
    cylinder config: [vel_x, vel_y, node_type, time]."""
    from graphphysics_tpu.core.graph import pad_graph_np

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, num_node_features)).astype(np.float32)
    x[:, node_type_index] = rng.integers(0, 7, size=n)
    pos = rng.normal(size=(n, 2)).astype(np.float32)
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    edge_attr = rng.normal(size=(e, num_edge_features)).astype(np.float32)
    y = rng.normal(size=(n, output_size)).astype(np.float32)
    return pad_graph_np(
        x,
        pos,
        senders,
        receivers,
        n_pad=n_pad,
        e_pad=e_pad,
        edge_attr=edge_attr,
        y=y,
        node_type_index=node_type_index,
    )
