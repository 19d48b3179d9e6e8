"""torch state_dict -> flax variables conversion.

Enables loading the reference's checkpoints (``train.py:190-196`` format: dict
with a 'model' state_dict) and timm pretrained weights into the Flax modules.
Covers SURVEY.md §7 hard part 2: Conv OIHW->HWIO, Linear (out,in)->(in,out), BN
weight/bias->scale/bias + running stats -> batch_stats, the ``backbone.`` prefix
handoff (``sloter/slot_model.py:27-33``), and the xSlot parameter layout (kept
in torch layout by design — see models/slot_model.py).

The inverse direction is intentionally not provided; checkpoints written by this
framework use Orbax (core/checkpoint.py).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "torch_state_dict_to_variables",
    "strip_prefix",
    "prepare_pretrained_state_dict",
    "merge_variables",
]

# xSlot leaves that keep the torch layout verbatim (slot_model.py XSlot.param names)
_GRU_RENAME = {
    "weight_ih_l0": "gru_w_ih",
    "weight_hh_l0": "gru_w_hh",
    "bias_ih_l0": "gru_b_ih",
    "bias_hh_l0": "gru_b_hh",
}


def strip_prefix(state_dict: Mapping[str, Any], prefix: str = "backbone.") -> Dict[str, Any]:
    """Remove a module prefix — the ``k[9:]`` handoff (slot_model.py:27-33)."""
    return {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}


def prepare_pretrained_state_dict(
    state_dict: Mapping[str, Any],
    *,
    in_chans: int = 3,
    num_classes: int | None = None,
    pretrained_classes: int = 1000,
    first_conv: str = "conv1",
    classifier: str = "fc",
) -> Dict[str, Any]:
    """timm ``load_pretrained`` weight adjustments (``timm/models/helpers.py:68-101``):

    - ``in_chans == 1``: collapse the first conv's RGB kernel by summing the
      input-channel dim (:75-80).
    - pretrained head has an extra background class (1001 -> 1000): drop row 0
      of the classifier weight/bias (:85-91).
    - any other class-count mismatch: discard the classifier entirely (:92-96)
      so the freshly initialized head is kept.
    """
    sd = dict(state_dict)
    if in_chans == 1:
        w = _to_np(sd[first_conv + ".weight"])
        sd[first_conv + ".weight"] = w.sum(axis=1, keepdims=True)
    elif in_chans != 3:
        raise ValueError("pretrained weights support in_chans of 1 or 3 only")
    if num_classes is not None and num_classes != pretrained_classes:
        if num_classes == 1000 and pretrained_classes == 1001:
            sd[classifier + ".weight"] = _to_np(sd[classifier + ".weight"])[1:]
            sd[classifier + ".bias"] = _to_np(sd[classifier + ".bias"])[1:]
        else:
            sd.pop(classifier + ".weight", None)
            sd.pop(classifier + ".bias", None)
    return sd


def merge_variables(init: Mapping[str, Any], loaded: Mapping[str, Any]) -> Dict[str, Any]:
    """Overlay converted weights onto freshly initialized variables — the
    ``strict=False`` load (helpers.py:96-101): subtrees absent from ``loaded``
    (e.g. a discarded classifier) keep their initialization."""
    out: Dict[str, Any] = {}
    for k, v in init.items():
        if k in loaded and isinstance(v, Mapping) and isinstance(loaded[k], Mapping):
            out[k] = merge_variables(v, loaded[k])
        else:
            out[k] = loaded.get(k, v)
    return out


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: Dict, path: Tuple[str, ...], leaf: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def _module_path(segments) -> Tuple[str, ...]:
    """Merge torch Sequential integer indices into flax module names.

    layer1.0 -> layer1_0; conv1.0 -> conv1_0; downsample.1 -> downsample/downsample_1
    (the _Downsample flax module nests its Sequential-indexed children).
    """
    out = []
    for seg in segments:
        if seg.isdigit() and out:
            merged = f"{out[-1]}_{seg}"
            if out[-1] == "downsample":
                out.append(merged)  # keep the nesting level
            else:
                out[-1] = merged
        else:
            out.append(seg)
    return tuple(out)


def torch_state_dict_to_variables(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """Convert a torch state_dict into flax ``{'params': ..., 'batch_stats': ...}``.

    Works for the bare backbone and for full SlotModel checkpoints (keys prefixed
    ``backbone.`` / ``conv1x1.`` / ``slot.``).
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    # Modules that are EvoNorm layers (evo_norm.py): identified by having a 'v'
    # gate (EvoNormSample2d) or a 4-D running_var with no running_mean
    # (EvoNormBatch2d). Disambiguates their (1,C,1,1) affine weight from a
    # hypothetical genuine 1x1 conv with out_channels==1 by module context,
    # not shape alone.
    evo_modules = set()
    for key, value in state_dict.items():
        segs = key.split(".")
        leaf = segs[-1]
        mod = ".".join(segs[:-1])
        if leaf == "v":
            evo_modules.add(mod)
        elif leaf == "running_var" and _to_np(value).ndim == 4 and (
            mod + ".running_mean" not in state_dict
        ):
            evo_modules.add(mod)

    for key, value in state_dict.items():
        segs = key.split(".")
        leaf_name = segs[-1]
        if leaf_name in ("num_batches_tracked", "filt"):
            continue  # bookkeeping / fixed blur-filter buffers

        # ---- xSlot subtree: torch layout preserved, flat param names
        if "slot" in segs:
            si = segs.index("slot")
            rest = segs[si + 1:]
            base = _module_path(segs[:si + 1])
            if rest[0] == "to_q":
                continue  # defined but bypassed in the reference forward (:52-53)
            if rest[0] == "initial_slots":
                _set(params, base + ("initial_slots",), _to_np(value))
            elif rest[0] == "to_k":
                # to_k.<idx>.weight -> to_k_<idx>_weight
                _set(params, base + (f"to_k_{rest[1]}_{rest[2]}",), _to_np(value))
            elif rest[0] == "gru":
                _set(params, base + (_GRU_RENAME[rest[1]],), _to_np(value))
            else:
                raise KeyError(f"unrecognized slot key {key!r}")
            continue

        arr = _to_np(value)
        mod_path = _module_path(segs[:-1])

        if leaf_name == "running_mean":
            _set(batch_stats, mod_path + ("mean",), arr)
        elif leaf_name == "running_var":
            _set(batch_stats, mod_path + ("var",), arr)
        elif leaf_name == "v":
            # EvoNorm gate parameter, torch shape (1,C,1,1) (evo_norm.py:62-66)
            _set(params, mod_path + ("v",), arr.reshape(-1))
        elif leaf_name == "weight":
            if (arr.ndim == 4 and arr.shape[0] == 1 and arr.shape[2:] == (1, 1)
                    and ".".join(segs[:-1]) in evo_modules):
                # EvoNorm affine (1,C,1,1) -> flat scale (evo_norm.py:60-61)
                _set(params, mod_path + ("scale",), arr.reshape(-1))
            elif arr.ndim == 4:  # conv OIHW -> HWIO
                _set(params, mod_path + ("kernel",), arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 3:  # conv1d (out,in,k) -> (k,in,out)
                _set(params, mod_path + ("kernel",), arr.transpose(2, 1, 0))
            elif arr.ndim == 2:  # linear (out,in) -> (in,out)
                _set(params, mod_path + ("kernel",), arr.transpose(1, 0))
            elif arr.ndim == 1:  # batchnorm affine scale
                _set(params, mod_path + ("scale",), arr)
            else:
                raise ValueError(f"unexpected weight rank for {key!r}: {arr.shape}")
        elif leaf_name == "bias":
            # EvoNorm biases are 4-D (1,C,1,1); everything else is 1-D
            _set(params, mod_path + ("bias",), arr.reshape(-1) if arr.ndim == 4 else arr)
        else:
            raise KeyError(f"unrecognized torch key {key!r}")

    out: Dict[str, Dict] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
