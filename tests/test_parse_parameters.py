"""Config parsing / factory dispatch tests, mirroring the reference's
tests/graphphysics/training/test_parameters.py: get_preprocessing,
get_model (epd / transformer / invalid), get_simulator, get_dataset
(h5 / xdmf / invalid)."""

import copy
import shutil

import jax.numpy as jnp
import pytest

from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.dataset import H5Dataset, XDMFDataset
from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from graphphysics_tpu.models.simulator import Simulator
from graphphysics_tpu.training.parse_parameters import (
    get_dataset,
    get_model,
    get_preprocessing,
    get_simulator,
)
from tests.fixtures import write_aneurysm_xdmf, write_cylinder_h5


@pytest.fixture(scope="module")
def param(tmp_path_factory):
    d = tmp_path_factory.mktemp("cyl_params")
    h5_path, meta_path = write_cylinder_h5(str(d), num_traj=2, steps=6, nx=8, ny=6)
    shutil.copy(h5_path, str(d / "test.h5"))
    return {
        "dataset": {
            "extension": "h5",
            "h5_path": h5_path,
            "meta_path": meta_path,
            "khop": 1,
        },
        "model": {
            "type": "epd",
            "message_passing_num": 2,
            "hidden_size": 16,
            "node_input_size": 2,
            "output_size": 2,
            "edge_input_size": 3,
            "num_heads": 4,
        },
        "index": {
            "feature_index_start": 0,
            "feature_index_end": 2,
            "output_index_start": 0,
            "output_index_end": 2,
            "node_type_index": 2,
        },
        "transformations": {
            "preprocessing": {
                "noise": 0.02,
                "noise_index_start": [0],
                "noise_index_end": [2],
                "masking": 0,
            },
            "world_pos_parameters": {"use": False},
        },
    }


def test_get_preprocessing_returns_callable(param):
    pre = get_preprocessing(param)
    assert callable(pre)
    # remove_noise drops the noise stage but stays callable
    assert callable(get_preprocessing(param, remove_noise=True))


def test_get_model_epd(param):
    model = get_model(param)
    assert isinstance(model, EncodeProcessDecode)
    # NodeType one-hot width added (reference parse_parameters.py:85-114)
    assert model.node_input_size == 2 + NodeType.SIZE
    assert model.message_passing_num == 2


def test_get_model_transformer(param):
    p = copy.deepcopy(param)
    p["model"]["type"] = "transformer"
    model = get_model(p)
    assert isinstance(model, EncodeTransformDecode)
    assert model.num_heads == 4


def test_get_model_gmm_and_precision(param):
    p = copy.deepcopy(param)
    p["model"].update({"num_mixture_components": 3, "temperature": 1.0,
                       "precision": "bf16"})
    model = get_model(p)
    assert model.num_mixture_components == 3
    assert model.dtype == jnp.bfloat16


def test_get_model_invalid(param):
    p = copy.deepcopy(param)
    p["model"]["type"] = "nope"
    with pytest.raises(ValueError, match="not supported"):
        get_model(p)


def test_get_simulator(param):
    sim = get_simulator(param)
    assert isinstance(sim, Simulator)
    assert sim.config.node_type_index == 2
    assert isinstance(sim.model, EncodeProcessDecode)


def test_get_dataset_h5(param):
    ds = get_dataset(param, get_preprocessing(param))
    assert isinstance(ds, H5Dataset)
    assert len(ds) > 0
    g = ds[0]
    assert g.x.shape[0] == g.node_mask.shape[0]


def test_get_dataset_xdmf(param, tmp_path):
    folder, meta = write_aneurysm_xdmf(str(tmp_path), num_traj=1, steps=4)
    p = copy.deepcopy(param)
    p["dataset"] = {"extension": "xdmf", "xdmf_folder": folder,
                    "meta_path": meta, "khop": 1}
    # aneurysm fixture layout: features [vel(3), pressure, node_type, time]
    p["index"] = {
        "feature_index_start": 0, "feature_index_end": 4,
        "output_index_start": 0, "output_index_end": 3,
        "node_type_index": 4,
    }
    ds = get_dataset(p, get_preprocessing(p))
    assert isinstance(ds, XDMFDataset)
    assert len(ds) > 0


def test_get_dataset_invalid(param):
    p = copy.deepcopy(param)
    p["dataset"] = dict(p["dataset"], extension="csv")
    with pytest.raises(ValueError, match="not supported"):
        get_dataset(p, get_preprocessing(p))


@pytest.mark.parametrize(
    "config_name",
    sorted(p.name for p in __import__("pathlib").Path("training_config").glob("*.json")),
)
def test_shipped_configs_build_and_step(config_name):
    """Every shipped training_config/*.json builds a working model+simulator
    and runs one jitted training forward on a synthetic graph matching its
    index layout (the reference ships the same config families)."""
    import json
    import pathlib

    import jax
    import numpy as np

    from graphphysics_tpu.core.graph import pad_graph_np

    param = json.loads((pathlib.Path("training_config") / config_name).read_text())
    sim = get_simulator(param)

    idx = param["index"]
    raw_cols = max(
        idx["feature_index_end"], idx["output_index_end"], idx["node_type_index"] + 1
    ) + 1  # + trailing time feature
    e_in = param["model"]["edge_input_size"]
    out_size = param["model"]["output_size"]

    rng = np.random.default_rng(0)
    n, e = 64, 256
    x = rng.normal(size=(n, raw_cols)).astype(np.float32)
    x[:, idx["node_type_index"]] = rng.integers(0, 7, size=n)
    g = pad_graph_np(
        x,
        rng.normal(size=(n, 2)).astype(np.float32),
        rng.integers(0, n, size=e).astype(np.int32),
        rng.integers(0, n, size=e).astype(np.int32),
        n_pad=n,
        e_pad=e,
        edge_attr=rng.normal(size=(e, e_in)).astype(np.float32) if e_in else None,
        y=rng.normal(size=(n, out_size)).astype(np.float32),
        node_type_index=idx["node_type_index"],
    )
    g = jax.tree_util.tree_map(jnp.asarray, g)
    variables = sim.init({"params": jax.random.key(0)}, g)

    @jax.jit
    def fwd(v, g):
        (out, tgt, _), _ = sim.apply(v, g, is_training=True, mutable=["normalizer"])
        return out, tgt

    out, tgt = fwd(variables, g)
    assert tgt.shape == (n, out_size)
    K = param["model"].get("num_mixture_components", 0)
    d = out_size
    expected_out = d if K == 0 else K * (2 * d + 1)
    assert out.shape[0] == n
    if K == 0:
        assert out.shape[1] == expected_out
    assert bool(jnp.all(jnp.isfinite(out)))
