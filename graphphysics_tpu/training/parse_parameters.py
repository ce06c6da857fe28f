"""Config parsing / factories for the reference JSON config schema.

Consumes the exact ``{dataset, model, index, transformations}`` training-config
schema of the reference (``graphphysics/training/parse_parameters.py``,
``training_config/*.json``) and builds the TPU-native equivalents.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.dataset import H5Dataset, XDMFDataset, build_preprocessing
from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig


def get_preprocessing(
    param: Dict[str, Any],
    use_edge_feature: bool = True,
    remove_noise: bool = False,
    extra_node_features: Optional[Union[Callable, List[Callable]]] = None,
    extra_edge_features: Optional[Union[Callable, List[Callable]]] = None,
):
    """Mirror of reference ``get_preprocessing`` (``parse_parameters.py:14-68``)."""
    preprocessing_params = param.get("transformations", {}).get("preprocessing", {})
    noise_scale = preprocessing_params.get("noise", 0)
    noise_parameters = None
    if noise_scale != 0 and not remove_noise:
        noise_parameters = {
            "noise_index_start": preprocessing_params.get("noise_index_start"),
            "noise_index_end": preprocessing_params.get("noise_index_end"),
            "noise_scale": noise_scale,
            "node_type_index": param["index"]["node_type_index"],
        }

    world_pos_params = param.get("transformations", {}).get("world_pos_parameters", {})
    world_pos_parameters = None
    if world_pos_params.get("use", False):
        world_pos_parameters = {
            "world_pos_index_start": world_pos_params.get("world_pos_index_start"),
            "world_pos_index_end": world_pos_params.get("world_pos_index_end"),
            "node_type_index": param["index"]["node_type_index"],
        }
        if "radius" in world_pos_params:
            world_pos_parameters["radius"] = world_pos_params["radius"]

    return build_preprocessing(
        noise_parameters=noise_parameters,
        world_pos_parameters=world_pos_parameters,
        add_edges_features=use_edge_feature,
        extra_node_features=extra_node_features,
        extra_edge_features=extra_edge_features,
    )


def get_model(param: Dict[str, Any], only_processor: bool = False) -> nn.Module:
    """Mirror of reference ``get_model`` (``parse_parameters.py:71-114``):
    dispatch on ``model.type`` and add the NodeType one-hot width."""
    model_type = param.get("model", {}).get("type", "")
    node_input_size = param["model"]["node_input_size"] + NodeType.SIZE
    num_mixture_components = param["model"].get("num_mixture_components", 0)
    temperature = param["model"].get("temperature")
    # TPU extension: "use_diagonal": false trains a FULL-covariance GMM head
    # with the full NLL (the reference implements both heads and both losses,
    # layers.py:116-195 / loss.py:202-327, but only ever wires the diagonal)
    use_diagonal = bool(param["model"].get("use_diagonal", True))
    # TPU extension: "precision": "bf16" runs the matmul-heavy compute path
    # in bfloat16 (params/outputs stay f32)
    precision = param["model"].get("precision", "f32")
    dtype = {"f32": None, "float32": None, "bf16": jnp.bfloat16,
             "bfloat16": jnp.bfloat16}[precision]
    # TPU extension: rematerialize message-passing blocks to trade FLOPs for
    # HBM on very large meshes
    remat = bool(param["model"].get("remat", False))
    # TPU extension: lax.scan over the block stack — O(1)-in-depth compiles
    scan_blocks = bool(param["model"].get("scan_blocks", False))

    if model_type == "epd":
        return EncodeProcessDecode(
            message_passing_num=param["model"]["message_passing_num"],
            node_input_size=node_input_size,
            edge_input_size=param["model"]["edge_input_size"],
            output_size=param["model"]["output_size"],
            hidden_size=param["model"]["hidden_size"],
            only_processor=only_processor,
            num_mixture_components=num_mixture_components,
            temperature=temperature,
            use_diagonal=use_diagonal,
            dtype=dtype,
            remat=remat,
            scan_blocks=scan_blocks,
        )
    if model_type == "transformer":
        return EncodeTransformDecode(
            message_passing_num=param["model"]["message_passing_num"],
            node_input_size=node_input_size,
            output_size=param["model"]["output_size"],
            hidden_size=param["model"]["hidden_size"],
            num_heads=param["model"]["num_heads"],
            only_processor=only_processor,
            num_mixture_components=num_mixture_components,
            temperature=temperature,
            use_diagonal=use_diagonal,
            dtype=dtype,
            remat=remat,
            scan_blocks=scan_blocks,
        )
    raise ValueError(f"Model type '{model_type}' not supported.")


def get_simulator_config(param: Dict[str, Any]) -> SimulatorConfig:
    return SimulatorConfig(
        node_input_size=param["model"]["node_input_size"] + NodeType.SIZE,
        edge_input_size=param["model"]["edge_input_size"],
        output_size=param["model"]["output_size"],
        feature_index_start=param["index"]["feature_index_start"],
        feature_index_end=param["index"]["feature_index_end"],
        output_index_start=param["index"]["output_index_start"],
        output_index_end=param["index"]["output_index_end"],
        node_type_index=param["index"]["node_type_index"],
    )


def get_simulator(param: Dict[str, Any], only_processor: bool = False) -> Simulator:
    """Mirror of reference ``get_simulator`` (``parse_parameters.py:117-142``)."""
    return Simulator(
        config=get_simulator_config(param), model=get_model(param, only_processor)
    )


def get_dataset(
    param: Dict[str, Any],
    preprocessing,
    masking_ratio: Optional[float] = None,
    use_edge_feature: bool = True,
    use_previous_data: bool = False,
    switch_to_val: bool = False,
    **budget_kwargs,
):
    """Mirror of reference ``get_dataset`` (``parse_parameters.py:145-208``)."""
    dataset_params = param.get("dataset", {})
    khop = dataset_params.get("khop", 1)
    new_edges_ratio = dataset_params.get("new_edges_ratio", 0)
    extension = dataset_params.get("extension", "")
    node_type_index = param["index"]["node_type_index"]

    world_pos_parameters = None
    if khop > 1:
        wpp = param.get("transformations", {}).get("world_pos_parameters", {})
        if wpp.get("use", False):
            world_pos_parameters = wpp

    if "edge_layout" not in budget_kwargs and dataset_params.get("edge_layout"):
        budget_kwargs["edge_layout"] = dataset_params["edge_layout"]
    auto_layout = budget_kwargs.get("edge_layout") == "auto"
    if auto_layout:
        # resolved after construction, once the dataset can report its scale
        budget_kwargs["edge_layout"] = "coo"
    for k in ("num_buckets", "bucket_multiple", "edge_headroom"):
        # explicit None checks: a falsy 0 in the config must reach the
        # dataset and fail its validation loudly, not be silently defaulted
        if k not in budget_kwargs and dataset_params.get(k) is not None:
            budget_kwargs[k] = dataset_params[k]
    common = dict(
        meta_path=dataset_params["meta_path"],
        preprocessing=preprocessing,
        masking_ratio=masking_ratio,
        khop=khop,
        new_edges_ratio=new_edges_ratio,
        add_edge_features=use_edge_feature,
        use_previous_data=use_previous_data,
        world_pos_parameters=world_pos_parameters,
        node_type_index=node_type_index,
        **budget_kwargs,
    )
    if extension == "h5":
        ds = H5Dataset(
            h5_path=dataset_params["h5_path"],
            switch_to_val=switch_to_val,
            **common,
        )
    elif extension == "xdmf":
        common.pop("world_pos_parameters")
        ds = XDMFDataset(
            xdmf_folder=dataset_params["xdmf_folder"],
            switch_to_val=switch_to_val,
            random_next=dataset_params.get("random_next", 1),
            random_prev=dataset_params.get("random_prev", 1),
            dt_features=dataset_params.get("dt_features", False),
            **common,
        )
    else:
        raise ValueError(f"Dataset extension '{extension}' not supported.")
    if auto_layout:
        _resolve_auto_edge_layout(ds, param, dataset_params)
    return ds


# Fused-Pallas CSR attention wins only at large-3D-mesh scale: measured
# 1.41x faster at 66k nodes / 524k edges, ~parity around 16k flat nodes,
# and SLOWER on small meshes (kernel grid overhead) — see PARITY.md §2.3.
# "auto" opts in only inside the clear-win regime.
AUTO_CSR_MIN_NODES = 32768


def _resolve_auto_edge_layout(ds, param, dataset_params) -> None:
    """Resolve ``edge_layout: "auto"``: route transformer attention through
    the fused Pallas CSR kernel when the mesh is large enough to profit,
    keep the XLA-fused COO path otherwise. EPD never uses the CSR kernel,
    and size buckets require COO, so both stay on COO."""
    if param["model"].get("type") != "transformer":
        return
    if getattr(ds, "num_buckets", 1) > 1:
        return
    threshold = dataset_params.get("auto_csr_min_nodes", AUTO_CSR_MIN_NODES)
    counts = ds.node_counts()
    if counts and max(counts) >= threshold:
        ds.set_edge_layout("csr")
        if ds.node_budget is not None:
            # an explicitly-configured budget may not be aligned to the
            # kernel's node blocks; padding more is always safe, erroring on
            # a config that worked under coo is not
            from graphphysics_tpu.core.graph import round_up
            from graphphysics_tpu.ops.pallas_attention import BLOCK_NODES

            ds.node_budget = round_up(ds.node_budget, BLOCK_NODES)
