"""Convert reference (PyTorch) checkpoints into this framework's format.

Users of the reference implementation (adobe/sbmc) can bring their trained
``.pth`` checkpoints (e.g. the published ``gharbi2019_sbmc`` /
``bako2017_finetuned`` models): this module maps the torch ``state_dict``
naming/layout onto the flax parameter tree.

Name mapping (reference module structure, sbmc/models.py + sbmc/modules.py):

===============================================  =========================
torch key                                         flax path
===============================================  =========================
embedding_NN.layer_i.layer.0.weight_v             embedding_NN/layer_i/v
embedding_NN.prediction.weight_g                  embedding_NN/prediction/g
propagation_NN.net(.next_level)*L.left.<cc>       propagation_NN/left_L/<cc>
propagation_NN.net(.next_level)*L.right.<cc>      propagation_NN/right_L/<cc>
kernel_regressor.<cc>                             kernel_stage/kernel_regressor/<cc>
diffuse.layer_i.layer.0.weight  (KPCN, no WN)     diffuse/layer_i/v
===============================================  =========================

Layout: conv weights OIHW -> HWIO; ``weight_g`` ``[out,1,1,1]`` -> ``[out]``.
The weight-norm parameterization is identical (per-output-channel norm over
the remaining dims), so converted checkpoints are functionally exact.
"""

import re

import numpy as np

__all__ = ["torch_state_dict_to_flax", "flax_to_torch_key"]

_CC_RE = re.compile(r"^(layer_\d+|prediction)$")


def _convchain_path(tokens):
    """Map a ConvChain sub-path: ['layer_0', 'layer', '0', 'weight_v'] or
    ['prediction', 'bias'] -> (layer_name, leaf)."""
    name = tokens[0]
    if not _CC_RE.match(name):
        raise ValueError(f"unexpected ConvChain component {tokens}")
    rest = tokens[1:]
    # intermediate layers wrap the conv in ".layer.0" (Sequential)
    if rest[:2] == ["layer", "0"]:
        rest = rest[2:]
    if len(rest) != 1:
        raise ValueError(f"unexpected ConvChain leaf {tokens}")
    return name, rest[0]


def _leaf(name, value):
    """Convert a torch leaf (name, tensor) to (flax_name, array)."""
    value = np.asarray(value)
    if name in ("weight_v", "weight"):
        return "v", value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if name == "weight_g":
        return "g", value.reshape(-1)
    if name == "bias":
        return "bias", value
    raise ValueError(f"unexpected parameter leaf {name}")


def flax_to_torch_key(path, weight_norm=True):
    """Inverse mapping (used for tests and for exporting): flax path tuple
    -> torch state_dict key."""
    parts = list(path)
    mod = parts[0]
    m = re.match(r"^(left|right)_(\d+)$", parts[1]) if len(parts) > 1 else None
    if mod.startswith("propagation_") and m:
        branch, lvl = m.group(1), int(m.group(2))
        prefix = mod + ".net" + ".next_level" * lvl + "." + branch
        rest = parts[2:]
    elif mod == "kernel_stage":
        prefix = "kernel_regressor"
        rest = parts[2:]
    else:
        prefix = mod
        rest = parts[1:]
    layer, leaf = rest[0], rest[1]
    leaf_name = {"v": "weight_v" if weight_norm else "weight",
                 "g": "weight_g", "bias": "bias"}[leaf]
    if layer == "prediction":
        return f"{prefix}.prediction.{leaf_name}"
    return f"{prefix}.{layer}.layer.0.{leaf_name}"


def torch_state_dict_to_flax(state_dict, template=None):
    """Convert a reference torch ``state_dict`` to a flax params tree.

    Args:
      state_dict: mapping of torch parameter names to arrays/tensors.
      template: optional flax ``{"params": ...}`` tree; when given, shapes
        are validated against it and missing/extra keys raise.

    Returns:
      ``{"params": <nested dict>}``.
    """
    tree = {}

    def insert(path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, value in state_dict.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        tokens = key.split(".")
        mod = tokens[0]
        if mod.startswith("embedding_") or mod in ("diffuse", "specular"):
            layer, leaf = _convchain_path(tokens[1:])
            name, arr = _leaf(leaf, value)
            insert((mod, layer, name), arr)
        elif mod.startswith("propagation_"):
            if tokens[1] != "net":
                raise ValueError(f"unexpected autoencoder key {key}")
            lvl = 0
            i = 2
            while tokens[i] == "next_level":
                lvl += 1
                i += 1
            branch = tokens[i]
            if branch not in ("left", "right"):
                raise ValueError(f"unexpected autoencoder branch in {key}")
            layer, leaf = _convchain_path(tokens[i + 1:])
            name, arr = _leaf(leaf, value)
            insert((mod, f"{branch}_{lvl}", layer, name), arr)
        elif mod == "kernel_regressor":
            layer, leaf = _convchain_path(tokens[1:])
            name, arr = _leaf(leaf, value)
            insert(("kernel_stage", "kernel_regressor", layer, name), arr)
        else:
            raise ValueError(f"unrecognized torch parameter {key}")

    params = {"params": tree}
    if template is not None:
        _validate(template["params"], tree, ())
    return params


def _validate(tmpl, got, path):
    t_keys, g_keys = set(tmpl), set(got)
    if t_keys != g_keys:
        raise ValueError(f"param keys mismatch at {'/'.join(path)}: "
                         f"missing {t_keys - g_keys}, extra {g_keys - t_keys}")
    for k in t_keys:
        if isinstance(tmpl[k], dict):
            _validate(tmpl[k], got[k], path + (k,))
        elif tuple(np.shape(tmpl[k])) != tuple(np.shape(got[k])):
            raise ValueError(
                f"shape mismatch at {'/'.join(path + (k,))}: "
                f"{np.shape(tmpl[k])} vs {np.shape(got[k])}")
