"""Reference (PyTorch) checkpoint -> flax tree converter.

The reference saves torch-pickled dicts ``{sr_net, tempo_dis, spatial_dis,
n_iter, *_optim, *_sched}`` of module ``state_dict()``s (reference
utils.py:7-43, train_tempo.py:300-317). This module name-maps those
state_dicts onto this framework's flax parameter/batch-stats trees so the
authors' pretrained checkpoints (train_fluid/train_vel/
tpugan_vel_checkpoint.ckpt et al.) can be loaded for rollout/eval.

Mapping rules (derived from the reference module constructors):

* 1x1 ``nn.Conv2d`` weights ``[out, in, 1, 1]`` -> dense kernels
  ``[in, out]`` (this framework runs channels-last matmuls on the MXU).
* ``nn.Linear`` weights ``[out, in]`` -> ``[in, out]``.
* spectral norm (torch ``weight_orig``/``weight_u``/``weight_v``, or the
  newer ``parametrizations.weight.*``) is stripped to the raw weight
  exactly like the reference's own transfer loader
  (discriminator.py:674-685); the flax side re-estimates the power
  iteration state (``u``/``sigma`` live in batch_stats and converge in a
  few forward passes).
* BatchNorm: ``weight/bias`` -> params ``scale/bias``;
  ``running_mean/running_var`` -> batch_stats ``mean/var``;
  ``num_batches_tracked`` is dropped.

Optimizer/scheduler states are not converted (Adam moments are
framework-specific); a converted checkpoint restarts optimization.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Tuple

import numpy as np

Entry = Tuple[str, Tuple[str, ...], str, str]  # collection, flax path, torch key, kind


# ---------------------------------------------------------------------------
# torch state_dict normalization

def strip_spectral_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Collapse spectral-norm parametrization keys to plain ``weight`` (the
    reference's ``_orig``-stripping transfer protocol,
    discriminator.py:674-685). Handles both the legacy
    ``weight_orig/weight_u/weight_v`` layout and the modern
    ``parametrizations.weight.original/._u/._v`` layout."""
    out = {}
    for k, v in sd.items():
        if k.endswith(("weight_u", "weight_v", "num_batches_tracked")):
            continue
        if ".parametrizations.weight._u" in k or ".parametrizations.weight._v" in k:
            continue
        if k.endswith("weight_orig"):
            k = k[: -len("_orig")]
        k = k.replace(".parametrizations.weight.original", ".weight")
        out[k] = v
    return out


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch here
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _transform(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":          # [out, in, 1, 1] (or [out, in]) -> [in, out]
        if value.ndim == 4:
            value = value[:, :, 0, 0]
        return np.ascontiguousarray(value.T)
    if kind == "linear":        # [out, in] -> [in, out]
        return np.ascontiguousarray(value.T)
    if kind == "vec":
        return value
    raise ValueError(f"unknown transform kind {kind}")


# ---------------------------------------------------------------------------
# entry builders (one per reference module pattern)

def _edgeconv(fp: Tuple[str, ...], tp: str, mlp_layer: bool = True) -> List[Entry]:
    """gcn_lib/pointnet/gcn.py:150-212: node_affine/edge_affine conv_bn_layer
    Sequentials (conv at .0) and the mlp (build_shared_mlp: convs at .0/.2
    for norm='none', or a single conv_bn_layer when mlp_layer=False)."""
    e = [
        ("params", fp + ("ConvLayer_0", "Dense_0", "kernel"), tp + ".node_affine.0.weight", "conv"),
        ("params", fp + ("ConvLayer_1", "Dense_0", "kernel"), tp + ".edge_affine.0.weight", "conv"),
    ]
    if mlp_layer:
        e += [
            ("params", fp + ("SharedMLP_0", "ConvLayer_0", "Dense_0", "kernel"), tp + ".mlp.0.weight", "conv"),
            ("params", fp + ("SharedMLP_0", "ConvLayer_1", "Dense_0", "kernel"), tp + ".mlp.2.weight", "conv"),
        ]
    else:
        e += [("params", fp + ("ConvLayer_2", "Dense_0", "kernel"), tp + ".mlp.0.weight", "conv")]
    return e


def _idgcn(fp: Tuple[str, ...], tp: str) -> List[Entry]:
    """gcn_lib/pointnet/gcn.py:215-279: btn / GCN1 / GCN2 / decoder /
    skip_layer."""
    e = [("params", fp + ("ConvLayer_0", "Dense_0", "kernel"), tp + ".btn.0.weight", "conv")]
    e += _edgeconv(fp + ("EdgeConv_0",), tp + ".GCN1")
    e += _edgeconv(fp + ("EdgeConv_1",), tp + ".GCN2")
    e += [
        ("params", fp + ("ConvLayer_1", "Dense_0", "kernel"), tp + ".decoder.0.weight", "conv"),
        ("params", fp + ("ConvLayer_2", "Dense_0", "kernel"), tp + ".skip_layer.0.weight", "conv"),
    ]
    return e


def _upsampling_head(fp: Tuple[str, ...], tp: str, mask_head: bool) -> List[Entry]:
    """UpsamplingModule / BinaryMaskingModule (upsampling_network.py:44-104):
    [conv-down4, EdgeConv] x2 then decoder = build_shared_mlp + biased
    Conv2d. The masking head's last EdgeConv has mlp_layer=False."""
    e = [
        ("params", fp + ("ConvLayer_0", "Dense_0", "kernel"), tp + ".upsample_layers.0.0.weight", "conv"),
    ]
    e += _edgeconv(fp + ("EdgeConv_0",), tp + ".upsample_layers.1")
    e += [("params", fp + ("ConvLayer_1", "Dense_0", "kernel"), tp + ".upsample_layers.2.0.weight", "conv")]
    e += _edgeconv(fp + ("EdgeConv_1",), tp + ".upsample_layers.3",
                   mlp_layer=not mask_head)
    e += [
        ("params", fp + ("SharedMLP_0", "ConvLayer_0", "Dense_0", "kernel"), tp + ".decoder.0.0.weight", "conv"),
        ("params", fp + ("SharedMLP_0", "ConvLayer_1", "Dense_0", "kernel"), tp + ".decoder.0.2.weight", "conv"),
        ("params", fp + ("Dense_0", "kernel"), tp + ".decoder.1.weight", "conv"),
        ("params", fp + ("Dense_0", "bias"), tp + ".decoder.1.bias", "vec"),
    ]
    return e


def generator_entries(depth: int = 3, masked: bool = True) -> List[Entry]:
    """SRNet / NoMaskSRNet (upsampling_network.py:108-223)."""
    e = _edgeconv(("feature_extractor", "EdgeConv_0"), "feature_extractor.conv_layers.0")
    for i in range(1, depth):
        e += _idgcn(("feature_extractor", f"IDGCNLayer_{i - 1}"),
                    f"feature_extractor.conv_layers.{i}")
    e += _upsampling_head(("upsampling_block",), "upsampling_block", mask_head=False)
    if masked:
        e += _upsampling_head(("filter_block",), "filter_block", mask_head=True)
    return e


def _bn(fp: Tuple[str, ...], tp: str) -> List[Entry]:
    return [
        ("params", fp + ("scale",), tp + ".weight", "vec"),
        ("params", fp + ("bias",), tp + ".bias", "vec"),
        ("batch_stats", fp + ("mean",), tp + ".running_mean", "vec"),
        ("batch_stats", fp + ("var",), tp + ".running_var", "vec"),
    ]


def _ssg(fp: Tuple[str, ...], tp: str, n_layers: int) -> List[Entry]:
    """SSGSetConv (discriminator.py:203-232): the shared MLP is
    build_shared_mlp with bn=True (discriminator.py:63-78) -> Sequential
    stride 3: conv @ 3i, BatchNorm2d @ 3i+1, act @ 3i+2."""
    e: List[Entry] = []
    for i in range(n_layers):
        cp = fp + ("SharedMLP_0", f"ConvLayer_{i}")
        e.append(("params", cp + ("Dense_0", "kernel"), f"{tp}.mlps.0.{3 * i}.weight", "conv"))
        e += _bn(cp + ("BatchNorm_0",), f"{tp}.mlps.0.{3 * i + 1}")
    return e


def _flow_embedding(fp: Tuple[str, ...], tp: str, n_layers: int = 3) -> List[Entry]:
    """FlowEmbedding (discriminator.py:235-283): mlp_convs.{j} (bias-free
    1x1 convs) + mlp_bns.{j}."""
    e: List[Entry] = []
    for j in range(n_layers):
        e.append(("params", fp + (f"Dense_{j}", "kernel"), f"{tp}.mlp_convs.{j}.weight", "conv"))
        e += _bn(fp + (f"BatchNorm_{j}",), f"{tp}.mlp_bns.{j}")
    return e


def _flow_module(fp: Tuple[str, ...], tp: str, sequence_length: int = 3) -> List[Entry]:
    e: List[Entry] = []
    for i in range(sequence_length - 1):
        e += _flow_embedding(fp + (f"flow_emb_layers_{i}",), f"{tp}.flow_emb_layers.{i}")
    return e


def _fc_head(fp: Tuple[str, ...], tp: str) -> List[Entry]:
    """fc_layers Sequential (discriminator.py:356-364 et al.): Linear @ 0,
    BatchNorm1d @ 1, act @ 2, Dropout @ 3, Linear @ 4, BN @ 5, act @ 6,
    Dropout @ 7, Linear @ 8."""
    e: List[Entry] = []
    for i, ti in enumerate((0, 4, 8)):
        e.append(("params", fp + (f"Dense_{i}", "kernel"), f"{tp}.{ti}.weight", "linear"))
        e.append(("params", fp + (f"Dense_{i}", "bias"), f"{tp}.{ti}.bias", "vec"))
    e += _bn(fp + ("BatchNorm_0",), f"{tp}.1")
    e += _bn(fp + ("BatchNorm_1",), f"{tp}.5")
    return e


def fluid_tempo_entries(sequence_length: int = 3) -> List[Entry]:
    """FluidTempoDis (discriminator.py:473-516)."""
    e = _ssg(("sa1",), "coarse_graining_module.0", 2)
    e += _ssg(("sa2",), "coarse_graining_module.1", 2)
    e += _flow_module(("flow_module",), "flow_module", sequence_length)
    e += _ssg(("sa_pooling",), "SA_pooling", 2)
    e += _fc_head(("fc",), "fc_layers")
    return e


def fluid_spatial_entries() -> List[Entry]:
    """FluidSpatialDis (discriminator.py:562-629)."""
    e: List[Entry] = []
    for i in range(3):
        e += _ssg((f"sa_{i}",), f"coarse_graining_module.{i}", 2)
    e += _ssg(("sa_pooling",), "SA_pooling", 2)
    e += _fc_head(("fc",), "fc_layers")
    return e


def action_tempo_entries(sequence_length: int = 3) -> List[Entry]:
    """ActionTempoDis (discriminator.py:325-364); the first SA tower level
    has a 3-conv MLP ([3,64,64,128])."""
    e = _ssg(("tower", "sa1"), "coarse_graining_module.0", 3)
    e += _ssg(("tower", "sa2"), "coarse_graining_module.1", 2)
    e += _flow_module(("tower", "flow_module"), "flow_module", sequence_length)
    e += _ssg(("tower", "sa_pooling"), "SA_pooling", 2)
    e += _fc_head(("fc",), "fc_layers")
    return e


def action_spatial_entries() -> List[Entry]:
    """ActionSpatialDis (discriminator.py:405-452)."""
    e = _ssg(("sa_0",), "coarse_graining_module.0", 3)
    e += _ssg(("sa_1",), "coarse_graining_module.1", 2)
    e += _ssg(("sa_2",), "coarse_graining_module.2", 2)
    e += _ssg(("sa_pooling",), "SA_pooling", 2)
    e += _fc_head(("fc",), "fc_layers")
    return e


# ---------------------------------------------------------------------------
# applying entry tables

def _set_path(tree: dict, path: Tuple[str, ...], value: np.ndarray,
              torch_key: str) -> None:
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(
                f"flax tree has no node {'/'.join(path)} (while mapping "
                f"{torch_key}); available: {sorted(node)}"
            )
        node = node[p]
    leaf = node.get(path[-1])
    if leaf is None:
        raise KeyError(f"flax tree has no leaf {'/'.join(path)} "
                       f"(while mapping {torch_key})")
    if tuple(np.shape(leaf)) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch mapping {torch_key} -> {'/'.join(path)}: "
            f"torch {value.shape} vs flax {np.shape(leaf)}"
        )
    node[path[-1]] = value.astype(np.asarray(leaf).dtype)


def convert_state_dict(
    torch_sd: Dict[str, np.ndarray],
    entries: List[Entry],
    params: dict,
    batch_stats: Optional[dict] = None,
    strict: bool = True,
) -> Tuple[dict, dict, List[str]]:
    """Apply an entry table: returns (new_params, new_batch_stats,
    unconsumed_torch_keys). ``strict`` raises when a mapped torch key is
    missing from the state_dict."""
    sd = {k: _to_numpy(v) for k, v in strip_spectral_norm(torch_sd).items()}
    params = copy.deepcopy(_as_mutable(params))
    batch_stats = copy.deepcopy(_as_mutable(batch_stats or {}))
    consumed = set()
    for collection, fpath, tkey, kind in entries:
        if tkey not in sd:
            if strict:
                raise KeyError(f"torch state_dict missing {tkey} "
                               f"(for flax {'/'.join(fpath)})")
            continue
        value = _transform(sd[tkey], kind)
        target = params if collection == "params" else batch_stats
        _set_path(target, fpath, value, tkey)
        consumed.add(tkey)
    leftover = sorted(set(sd) - consumed)
    return params, batch_stats, leftover


def _as_mutable(tree):
    try:
        from flax.core import unfreeze

        return unfreeze(tree)
    except Exception:
        return dict(tree) if isinstance(tree, dict) else tree


ENTRY_BUILDERS = {
    "sr_net_fluid": lambda: generator_entries(masked=True),
    "sr_net_action": lambda: generator_entries(masked=False),
    "fluid_tempo": fluid_tempo_entries,
    "fluid_spatial": fluid_spatial_entries,
    "action_tempo": action_tempo_entries,
    "action_spatial": action_spatial_entries,
}


def load_torch_checkpoint(path: str, target_state, workload: str = "fluid",
                          strict: bool = True):
    """Load a reference torch checkpoint file into a GanTrainState.

    ``workload``: "fluid" (SRNet + Fluid* critics) or "action" (NoMaskSRNet
    + Action* critics). Optimizer states are left at ``target_state``'s
    (reference Adam moments are not portable); ``n_iter`` transfers.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return convert_torch_checkpoint_dict(ckpt, target_state, workload, strict)


def convert_torch_checkpoint_dict(ckpt: dict, target_state,
                                  workload: str = "fluid",
                                  strict: bool = True):
    prefix = "fluid" if workload == "fluid" else "action"
    sr_e = ENTRY_BUILDERS[f"sr_net_{prefix}"]()
    t_e = ENTRY_BUILDERS[f"{prefix}_tempo"]()
    s_e = ENTRY_BUILDERS[f"{prefix}_spatial"]()

    sr_p, _, _ = convert_state_dict(
        ckpt["sr_net"], sr_e, target_state.sr.params, None, strict)
    t_p, t_bs, _ = convert_state_dict(
        ckpt["tempo_dis"], t_e, target_state.tempo.params,
        target_state.tempo.batch_stats, strict)
    s_p, s_bs, _ = convert_state_dict(
        ckpt["spatial_dis"], s_e, target_state.spatial.params,
        target_state.spatial.batch_stats, strict)

    return target_state.replace(
        n_iter=np.int32(ckpt.get("n_iter", 0)),
        sr=target_state.sr.replace(params=sr_p),
        tempo=target_state.tempo.replace(params=t_p, batch_stats=t_bs),
        spatial=target_state.spatial.replace(params=s_p, batch_stats=s_bs),
    )
