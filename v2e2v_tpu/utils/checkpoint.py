"""Checkpointing: orbax save/load + torch ``.pth.tar`` converters.

The reference saves ``{'epoch', 'state_dict'}`` per epoch and, for V2E2V,
additionally embeds ``v2e_params`` so inference can reconstruct the emulator
config from the checkpoint (``train.py:94-98``, ``test.py:76-83``). We keep
that contract: checkpoints carry ``{step/epoch, params, opt_state?,
v2e_params?}`` and the published torch checkpoints convert losslessly into
our parameter pytrees (``convert_torch_state_dict``).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


# ---------------------------------------------------------------------------
# orbax-backed native checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, payload: dict[str, Any]) -> None:
    """Save a pytree checkpoint directory (orbax PyTree format)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def load_checkpoint(path: str) -> dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_opt_state(template, payload_opt_state):
    """Rebuild a typed optax state from an orbax-restored pytree.

    Orbax restores NamedTuple-structured states as plain containers; graft
    the restored leaves back onto a freshly ``tx.init``-ed template so the
    optimizer sees its own types. Returns the template unchanged when the
    checkpoint predates opt-state saving (``payload_opt_state is None``).
    """
    if payload_opt_state is None:
        return template
    leaves = jax.tree_util.tree_leaves(payload_opt_state)
    treedef = jax.tree_util.tree_structure(template)
    assert treedef.num_leaves == len(leaves), (
        f"opt_state leaf count mismatch: ckpt {len(leaves)} vs "
        f"template {treedef.num_leaves}"
    )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_name(cfgs) -> str:
    """E2V checkpoint naming convention (reference ``train_e2v.py:35-36``)."""
    return "{}_{}_b{}_d{}_c{}".format(
        cfgs.model_name, cfgs.model_mode, cfgs.num_bins, cfgs.depth, cfgs.base_channels
    )


def v2e2v_checkpoint_name(cfgs) -> str:
    """V2E2V naming convention encoding emulator params
    (reference ``train.py:34-35``)."""
    return "{}_C{}_{}_{}_fc{}_{}_{}".format(
        cfgs.model_name, cfgs.C, cfgs.pl, cfgs.ps, cfgs.cutoff_hz, cfgs.ql, cfgs.qs
    )


# ---------------------------------------------------------------------------
# torch .pth.tar conversion
# ---------------------------------------------------------------------------

def _conv(sd: dict, prefix: str) -> dict:
    w = np.asarray(sd[prefix + ".weight"], dtype=np.float32)
    out = {"weight": np.transpose(w, (2, 3, 1, 0))}  # OIHW -> HWIO
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"], dtype=np.float32)
    return out


def convert_torch_state_dict(sd: dict, model_mode: str = "cista-lstc") -> dict:
    """torch ``state_dict`` (reference module names) -> our parameter pytree.

    Handles the weight-tied ISTA blocks (``lista_blocks.0..depth-1`` all alias
    one instance — index 0 is taken) and the ``(1, 2C, 1, 1)`` Lambda/alpha
    shapes (squeezed to per-channel vectors for NHWC broadcast).
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}

    params = {
        "We": _conv(sd, "We.conv2d"),
        "Wi": _conv(sd, "Wi.conv2d"),
        "W0": _conv(sd, "W0.conv2d"),
        "lista": {
            "D": _conv(sd, "lista_blocks.0.D.conv2d"),
            "P": _conv(sd, "lista_blocks.0.P.conv2d"),
            "Lambda": np.asarray(sd["lista_blocks.0.Lambda"], np.float32).reshape(-1),
        },
        "Dg": {
            "conv": _conv(sd, "Dg.conv.conv2d"),
            "lstm": {"Gates": _conv(sd, "Dg.recurrent_block.Gates")},
        },
        "upsamp_conv": _conv(sd, "upsamp_conv.conv2d"),
        "final_conv": _conv(sd, "final_conv.conv2d"),
    }
    if model_mode == "cista-lstc":
        params["P0"] = {
            "gates": _conv(sd, "P0.gates"),
            "out_gates": _conv(sd, "P0.out_gates"),
            "P0": _conv(sd, "P0.P0"),
        }
    elif model_mode == "cista-tc":
        params["P0"] = _conv(sd, "P0.conv2d")
        params["one_conv_for_prev"] = _conv(sd, "one_conv_for_prev.conv2d")
        params["one_conv_for_cur"] = _conv(sd, "one_conv_for_cur.conv2d")
        params["alpha"] = np.asarray(sd["alpha.0"], np.float32).reshape(-1)
    else:
        raise ValueError(f"unknown model_mode {model_mode!r}")
    return jax.tree_util.tree_map(np.ascontiguousarray, params)


def export_torch_state_dict(params: dict, model_mode: str = "cista-lstc", depth: int = 5) -> dict:
    """Our parameter pytree -> reference-named torch-style state_dict
    (numpy values; usable with ``torch.load``-free parity tooling)."""

    def conv_out(p, prefix, sd):
        sd[prefix + ".weight"] = np.transpose(np.asarray(p["weight"]), (3, 2, 0, 1))
        if "bias" in p:
            sd[prefix + ".bias"] = np.asarray(p["bias"])

    sd: dict[str, np.ndarray] = {}
    conv_out(params["We"], "We.conv2d", sd)
    conv_out(params["Wi"], "Wi.conv2d", sd)
    conv_out(params["W0"], "W0.conv2d", sd)
    for i in range(depth):
        conv_out(params["lista"]["D"], f"lista_blocks.{i}.D.conv2d", sd)
        conv_out(params["lista"]["P"], f"lista_blocks.{i}.P.conv2d", sd)
        sd[f"lista_blocks.{i}.Lambda"] = np.asarray(
            params["lista"]["Lambda"]
        ).reshape(1, -1, 1, 1)
    conv_out(params["Dg"]["conv"], "Dg.conv.conv2d", sd)
    conv_out(params["Dg"]["lstm"]["Gates"], "Dg.recurrent_block.Gates", sd)
    conv_out(params["upsamp_conv"], "upsamp_conv.conv2d", sd)
    conv_out(params["final_conv"], "final_conv.conv2d", sd)
    if model_mode == "cista-lstc":
        conv_out(params["P0"]["gates"], "P0.gates", sd)
        conv_out(params["P0"]["out_gates"], "P0.out_gates", sd)
        conv_out(params["P0"]["P0"], "P0.P0", sd)
    else:
        conv_out(params["P0"], "P0.conv2d", sd)
        conv_out(params["one_conv_for_prev"], "one_conv_for_prev.conv2d", sd)
        conv_out(params["one_conv_for_cur"], "one_conv_for_cur.conv2d", sd)
        for i in range(depth):
            sd[f"alpha.{i}"] = np.asarray(params["alpha"]).reshape(1, -1, 1, 1)
    return sd


def load_torch_checkpoint(path: str, model_mode: str = "cista-lstc"):
    """Load a reference ``.pth.tar`` checkpoint: returns
    ``(params, epoch, v2e_params_or_None)``. Strips a ``v2e2v`` prefix
    (``e2v_net.``) automatically when present."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    if any(k.startswith("e2v_net.") for k in sd):
        sd = {k[len("e2v_net."):]: v for k, v in sd.items() if k.startswith("e2v_net.")}
    params = convert_torch_state_dict(sd, model_mode)
    return params, ckpt.get("epoch", 0), ckpt.get("v2e_params")
