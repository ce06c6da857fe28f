"""Import / export reference PyTorch ``Simulator`` checkpoints.

The reference saves checkpoints with ``Simulator.save_checkpoint``
(``graphphysics/models/simulator.py:379-405``): a ``torch.save`` dict

    {"model": <state_dict of the Simulator (model.* keys)>,
     "_output_normalizer": <Normalizer.get_variable() dict>,
     "_node_normalizer":   <...>,
     "_edge_normalizer":   <... or None>}

This module converts that format to/from this framework's flax variables
(``{"params": ..., "normalizer": ...}``), so a user of the reference can bring
trained weights across (and take ours back). The key mapping follows the
reference module tree exactly:

- ``build_mlp`` Sequential (``layers.py:99-113``): linear indices 0,2,4,...
  -> ``dense_0..``, trailing RMSNorm index -> ``norm``.
- ``EncodeProcessDecode`` (``processors.py:27-137``): ``nodes_encoder``,
  ``edges_encoder``, ``processor_list.{i}`` -> ``block_{i}`` with
  ``edge_block``/``node_block`` MLPs, ``decode_module``.
- ``EncodeTransformDecode`` (``processors.py:140-277``):
  ``processor_list.{i}.attention.{q,k,v}_proj|proj``, ``norm1``/``norm2``,
  ``gated_mlp.{0,1,2}`` (``build_gated_mlp``, ``layers.py:236-262``) ->
  ``gated_mlp/{norm,gated,out}``.
- GMM heads (``layers.py:116-195``): ``pre_proj``/``proj``.
- Normalizer buffers (``layers.py:300-313``, exported by ``get_variable()``
  ``layers.py:377-392``): ``_acc_count``/``_num_accumulations``/``_acc_sum``/
  ``_acc_sum_squared`` -> ``core.normalizer.NormalizerState``.

torch ``nn.Linear`` stores ``weight`` as ``(out, in)``; flax ``Dense`` kernels
are ``(in, out)`` — weights are transposed both ways.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.core.normalizer import NormalizerState

__all__ = [
    "import_reference_checkpoint",
    "import_reference_state_dict",
    "export_reference_state_dict",
    "export_reference_checkpoint",
]


def _to_np(value) -> np.ndarray:
    """torch tensor | array-like -> float32 numpy (no torch import needed)."""
    if hasattr(value, "detach"):  # torch.Tensor without importing torch
        value = value.detach()
        if "float" in str(value.dtype):
            # .numpy() has no bfloat16 counterpart — checkpoints saved
            # from bf16-true training would TypeError; cast floats up
            # front (ints keep their dtype through the asarray below)
            value = value.float()
        value = value.cpu().numpy()
    return np.asarray(value, dtype=np.float32)


_LINEAR_IDX = re.compile(r"^(\d+)$")


def _set(tree: Dict[str, Any], path, leaf) -> None:
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    if path[-1] in node:
        raise ValueError(f"duplicate parameter path {'/'.join(path)}")
    node[path[-1]] = leaf


def _translate_mlp_segment(idx: str, pname: str):
    """Sequential index inside a reference ``build_mlp`` -> flax module name.

    Linear layers sit at even indices (ReLU between), the optional RMSNorm at
    the final odd index; ``scale``/``offset`` only ever belong to the norm.
    """
    if pname in ("scale", "offset"):
        return "norm"
    i = int(idx)
    if i % 2 != 0:
        raise ValueError(f"unexpected parameter at Sequential index {idx}")
    return f"dense_{i // 2}"


def _flax_path_for_torch_key(key: str, pname: str):
    """Map one reference state_dict key (without the trailing param name and
    the leading ``model.``) to a flax params path (tuple of segments)."""
    parts = key.split(".")
    out = ["model"]
    i = 0
    while i < len(parts):
        seg = parts[i]
        if seg == "processor_list":
            out.append(f"block_{parts[i + 1]}")
            i += 2
        elif seg in ("nodes_encoder", "edges_encoder"):
            out.append(seg)
            out.append(_translate_mlp_segment(parts[i + 1], pname))
            i += 2
        elif seg in ("edge_block", "node_block"):
            out.append(seg)
            out.append(_translate_mlp_segment(parts[i + 1], pname))
            i += 2
        elif seg == "decode_module":
            out.append(seg)
            nxt = parts[i + 1]
            if _LINEAR_IDX.match(nxt):  # plain MLP decoder
                out.append(_translate_mlp_segment(nxt, pname))
            else:  # GMM head: pre_proj / proj
                out.append(nxt)
            i += 2
        elif seg == "gated_mlp":
            # build_gated_mlp Sequential: 0 RMSNorm, 1 GatedMLP, 2 Linear
            out.append(seg)
            sub = parts[i + 1]
            if sub == "0":
                out.append("norm")
                i += 2
            elif sub == "1":
                out.append("gated")
                out.append(parts[i + 2])  # linear1 / linear2
                i += 3
            elif sub == "2":
                out.append("out")
                i += 2
            else:
                raise ValueError(f"unexpected gated_mlp index in {key}")
        elif seg in ("attention", "q_proj", "k_proj", "v_proj", "proj",
                     "norm1", "norm2", "pre_proj"):
            out.append(seg)
            i += 1
        else:
            raise ValueError(f"unrecognized reference module path: {key}")
    return tuple(out)


def _import_normalizer(state: Optional[Mapping[str, Any]]):
    if not state:
        return None
    return NormalizerState(
        acc_count=jnp.asarray(_to_np(state["_acc_count"]).reshape(())),
        num_accumulations=jnp.asarray(
            _to_np(state["_num_accumulations"]).reshape(())
        ),
        acc_sum=jnp.asarray(_to_np(state["_acc_sum"]).reshape(-1)),
        acc_sum_sq=jnp.asarray(_to_np(state["_acc_sum_squared"]).reshape(-1)),
    )


def import_reference_state_dict(
    state_dict: Mapping[str, Any], params_template
) -> Dict[str, Any]:
    """Convert a reference Simulator ``state_dict`` (``model.*`` keys) into a
    flax params tree matching ``params_template`` (same structure/shapes,
    e.g. ``sim.init(...)["params"]``)."""
    params: Dict[str, Any] = {}
    shared_q: Dict[tuple, np.ndarray] = {}
    pending_shared: Dict[tuple, Dict[str, np.ndarray]] = {}

    # Does the template use the shared-qkv layout (no k_proj submodule)?
    def _has(tree, path):
        node = tree
        for seg in path:
            if not isinstance(node, Mapping) or seg not in node:
                return False
            node = node[seg]
        return True

    for full_key, value in state_dict.items():
        key = full_key
        if key.startswith("model."):
            key = key[len("model."):]
        # Normalizer buffers are registered on the reference Simulator and
        # therefore appear in its state_dict (layers.py:300-313); they are
        # handled separately in import_reference_checkpoint.
        if key.split(".", 1)[0].endswith("normalizer"):
            continue
        body, pname = key.rsplit(".", 1)
        arr = _to_np(value)
        path = _flax_path_for_torch_key(body, pname)

        if pname == "weight":
            leaf_name, leaf = "kernel", arr.T
        elif pname in ("bias", "scale", "offset"):
            leaf_name, leaf = pname, arr
        else:
            raise ValueError(f"unrecognized parameter name in {full_key}")

        # Shared-qkv (use_separate_proj_weight=False): the reference aliases
        # k/v weights to q's; our layout keeps only q_proj plus bias deltas.
        if path[-1] in ("k_proj", "v_proj") and not _has(
            params_template, path
        ):
            attn_path = path[:-1]
            pending_shared.setdefault(attn_path, {})[
                f"{path[-1]}.{leaf_name}"
            ] = leaf
            continue
        if path[-1] == "q_proj" and leaf_name == "bias":
            shared_q[path[:-1]] = leaf
        _set(params, path + (leaf_name,), jnp.asarray(leaf))

    for attn_path, entries in pending_shared.items():
        q_kernel_path = attn_path + ("q_proj", "kernel")
        for proj in ("k_proj", "v_proj"):
            kern = entries.get(f"{proj}.kernel")
            if kern is not None:
                if not _has(params, q_kernel_path):
                    raise ValueError(
                        f"shared-qkv checkpoint is missing q_proj.weight under "
                        f"{'/'.join(attn_path)}"
                    )
                node = params
                for seg in q_kernel_path:
                    node = node[seg]
                if not np.array_equal(kern, np.asarray(node)):
                    raise ValueError(
                        f"checkpoint {proj}.weight differs from q_proj.weight "
                        f"under {'/'.join(attn_path)}: it was trained with "
                        f"separate q/k/v weights — build the model with "
                        f"use_separate_proj_weight=True to import it"
                    )
            bias = entries.get(f"{proj}.bias")
            if bias is not None:
                q_bias = shared_q.get(attn_path)
                if q_bias is None:
                    raise ValueError(
                        f"shared-qkv bias without q bias under "
                        f"{'/'.join(attn_path)}"
                    )
                _set(
                    params,
                    attn_path + (f"{proj[0]}_bias_delta",),
                    jnp.asarray(bias - q_bias),
                )

    _check_trees_match(params_template, params)
    return params


def _check_trees_match(template, imported) -> None:
    t_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(template)
    }
    i_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(imported)
    }
    missing = sorted(set(t_paths) - set(i_paths))
    extra = sorted(set(i_paths) - set(t_paths))
    if missing or extra:
        raise ValueError(
            f"imported checkpoint does not match the model: "
            f"missing={missing[:8]} unexpected={extra[:8]}"
        )
    for k, shape in t_paths.items():
        if i_paths[k] != shape:
            raise ValueError(
                f"shape mismatch at {k}: model {shape} vs checkpoint {i_paths[k]}"
            )


def import_reference_checkpoint(checkpoint, variables) -> Dict[str, Any]:
    """Convert a full reference checkpoint (path or the ``torch.load`` dict of
    ``Simulator.save_checkpoint``) into this framework's Simulator variables.

    ``variables`` is the template from ``sim.init(...)``; returns a new dict
    with the same structure: ``{"params": ..., "normalizer": ...}``.
    """
    if isinstance(checkpoint, (str, bytes)) or hasattr(checkpoint, "__fspath__"):
        import torch  # local import: only needed for on-disk torch files

        # weights_only=True: the reference format is tensors / dicts /
        # primitives only, and this path is advertised for third-party
        # checkpoint files — never unpickle arbitrary objects from them.
        checkpoint = torch.load(checkpoint, map_location="cpu", weights_only=True)

    params = import_reference_state_dict(
        checkpoint["model"], variables["params"]
    )

    normalizer = jax.tree_util.tree_map(lambda x: x, variables["normalizer"])
    mapping = {
        "_output_normalizer": "output_normalizer",
        "_node_normalizer": "node_normalizer",
        "_edge_normalizer": "edge_normalizer",
    }
    for ref_key, ours in mapping.items():
        norm_state = checkpoint.get(ref_key)
        if not norm_state:
            # Fallback: the same buffers live inside the state_dict itself
            # (the normalizers are registered submodules of the Simulator).
            prefix = f"{ref_key}."
            norm_state = {
                k[len(prefix):]: v
                for k, v in checkpoint["model"].items()
                if k.startswith(prefix)
            } or None
        state = _import_normalizer(norm_state)
        if state is None:
            continue
        if ours not in normalizer:
            raise ValueError(
                f"checkpoint has {ref_key} but the model has no {ours} "
                f"(edge_input_size=0?)"
            )
        tmpl = normalizer[ours]["state"]
        if state.acc_sum.shape != tmpl.acc_sum.shape:
            raise ValueError(
                f"{ours} size mismatch: model {tmpl.acc_sum.shape} "
                f"vs checkpoint {state.acc_sum.shape}"
            )
        normalizer[ours] = {"state": state}
    return {"params": params, "normalizer": normalizer}


# ---------------------------------------------------------------------------
# Export (ours -> reference format)
# ---------------------------------------------------------------------------


def _mlp_to_torch(prefix: str, tree: Mapping[str, Any], out: Dict[str, np.ndarray]):
    n_dense = len([k for k in tree if k.startswith("dense_")])
    for i in range(n_dense):
        p = tree[f"dense_{i}"]
        out[f"{prefix}.{2 * i}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            out[f"{prefix}.{2 * i}.bias"] = np.asarray(p["bias"])
    if "norm" in tree:
        norm_idx = 2 * (n_dense - 1) + 1
        out[f"{prefix}.{norm_idx}.scale"] = np.asarray(tree["norm"]["scale"])
        if "offset" in tree["norm"]:
            out[f"{prefix}.{norm_idx}.offset"] = np.asarray(tree["norm"]["offset"])


def _dense_to_torch(prefix: str, tree: Mapping[str, Any], out: Dict[str, np.ndarray]):
    out[f"{prefix}.weight"] = np.asarray(tree["kernel"]).T
    if "bias" in tree:
        out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def export_reference_state_dict(params) -> Dict[str, np.ndarray]:
    """Convert our Simulator params to a reference-keyed ``state_dict`` of
    numpy arrays (pass through ``torch.tensor`` + ``torch.save`` to produce a
    file the reference can ``load_state_dict``)."""
    model = params["model"]
    out: Dict[str, np.ndarray] = {}
    blocks = sorted(
        (k for k in model if k.startswith("block_")),
        key=lambda s: int(s.split("_")[1]),
    )
    for name in ("nodes_encoder", "edges_encoder"):
        if name in model:
            _mlp_to_torch(f"model.{name}", model[name], out)
    if "decode_module" in model:
        dm = model["decode_module"]
        if "pre_proj" in dm:  # GMM head
            _dense_to_torch("model.decode_module.pre_proj", dm["pre_proj"], out)
            _dense_to_torch("model.decode_module.proj", dm["proj"], out)
        else:
            _mlp_to_torch("model.decode_module", dm, out)
    for bi, bname in enumerate(blocks):
        blk = model[bname]
        tprefix = f"model.processor_list.{bi}"
        if "edge_block" in blk:  # GraphNetBlock
            _mlp_to_torch(f"{tprefix}.edge_block", blk["edge_block"], out)
            _mlp_to_torch(f"{tprefix}.node_block", blk["node_block"], out)
        else:  # TransformerBlock
            attn = blk["attention"]
            _dense_to_torch(f"{tprefix}.attention.q_proj", attn["q_proj"], out)
            if "k_proj" in attn:
                _dense_to_torch(f"{tprefix}.attention.k_proj", attn["k_proj"], out)
                _dense_to_torch(f"{tprefix}.attention.v_proj", attn["v_proj"], out)
            else:  # shared-qkv: weight aliased, biases reconstructed
                qk = np.asarray(attn["q_proj"]["kernel"]).T
                out[f"{tprefix}.attention.k_proj.weight"] = qk
                out[f"{tprefix}.attention.v_proj.weight"] = qk
                if "bias" in attn["q_proj"]:
                    qb = np.asarray(attn["q_proj"]["bias"])
                    out[f"{tprefix}.attention.k_proj.bias"] = qb + np.asarray(
                        attn["k_bias_delta"]
                    )
                    out[f"{tprefix}.attention.v_proj.bias"] = qb + np.asarray(
                        attn["v_bias_delta"]
                    )
            _dense_to_torch(f"{tprefix}.attention.proj", attn["proj"], out)
            out[f"{tprefix}.norm1.scale"] = np.asarray(blk["norm1"]["scale"])
            out[f"{tprefix}.norm2.scale"] = np.asarray(blk["norm2"]["scale"])
            gm = blk["gated_mlp"]
            out[f"{tprefix}.gated_mlp.0.scale"] = np.asarray(gm["norm"]["scale"])
            _dense_to_torch(f"{tprefix}.gated_mlp.1.linear1", gm["gated"]["linear1"], out)
            _dense_to_torch(f"{tprefix}.gated_mlp.1.linear2", gm["gated"]["linear2"], out)
            _dense_to_torch(f"{tprefix}.gated_mlp.2", gm["out"], out)
    return out


def _export_normalizer(state: NormalizerState):
    return {
        "_max_accumulations": 10**5,
        "_std_epsilon": np.asarray(1e-8, np.float32),
        "_acc_count": np.asarray(state.acc_count),
        "_num_accumulations": np.asarray(state.num_accumulations),
        "_acc_sum": np.asarray(state.acc_sum),
        "_acc_sum_squared": np.asarray(state.acc_sum_sq),
    }


def export_reference_checkpoint(variables, path: Optional[str] = None):
    """Build (and optionally ``torch.save``) a reference-format checkpoint
    dict from our Simulator variables."""
    norm = variables["normalizer"]
    ckpt = {
        "model": export_reference_state_dict(variables["params"]),
        "_output_normalizer": _export_normalizer(
            norm["output_normalizer"]["state"]
        ),
        "_node_normalizer": _export_normalizer(norm["node_normalizer"]["state"]),
        "_edge_normalizer": (
            _export_normalizer(norm["edge_normalizer"]["state"])
            if "edge_normalizer" in norm
            else None
        ),
    }
    if path is not None:
        import torch

        ckpt = {
            k: (
                {kk: (torch.tensor(vv) if isinstance(vv, np.ndarray) else vv)
                 for kk, vv in v.items()}
                if isinstance(v, dict)
                else v
            )
            for k, v in ckpt.items()
        }
        torch.save(ckpt, path)
    return ckpt
