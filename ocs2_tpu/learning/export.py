"""Policy export for deployment — the ONNX-deployment analogue.

The reference trains in PyTorch and deploys the learned policy through
onnxruntime inside the C++ control loop (ocs2_mpcnet_core mpcnet.py:135
torch.onnx.export each round; control/MpcnetOnnxController.h:59 runs it at
the MRT rate).  This framework is JAX-native, so deployment needs neither
torch nor onnxruntime; the export path produces:

* a checkpoint dict of plain numpy arrays (host-serializable with np.savez
  or orbax) and
* a dependency-free pure-NUMPY forward function reconstructed from the
  checkpoint — suitable for an onboard control loop with no JAX runtime —
  for each of the three policy families (linear / MLP / mixture of experts).

The numpy forward is validated against the flax module in
tests/test_learning.py.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np


def export_params(params) -> Dict[str, np.ndarray]:
    """Flatten a flax params pytree into {path: numpy array} (the .onnx /
    .pt artifact analogue; np.savez-able)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, params) -> None:
    np.savez(path, **export_params(params))


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def _dense(weights: Dict[str, np.ndarray], name: str, x: np.ndarray):
    return x @ weights[f"params/{name}/kernel"] + weights[f"params/{name}/bias"]


def numpy_policy(weights: Dict[str, np.ndarray]) -> Callable:
    """Reconstruct a pure-numpy forward obs -> action from an exported
    checkpoint.  Detects the policy family from the parameter names
    (linear / hidden_i+out MLP / gate+experts mixture) — the deployment-side
    mirror of MpcnetOnnxController."""
    names = set(weights)

    def layers_with(prefix):
        idx = 0
        found = []
        while f"params/{prefix}{idx}/kernel" in names or (
            f"params/{prefix}_{idx}/kernel" in names
        ):
            key = (
                f"{prefix}{idx}"
                if f"params/{prefix}{idx}/kernel" in names
                else f"{prefix}_{idx}"
            )
            found.append(key)
            idx += 1
        return found

    if "params/linear/kernel" in names:

        def forward(obs):
            return _dense(weights, "linear", np.asarray(obs))

        return forward

    if "params/gate_out/kernel" in names:
        num_experts = weights["params/gate_out/bias"].shape[0]
        expert_layers = {
            e: layers_with(f"expert{e}_hidden") for e in range(num_experts)
        }

        def forward(obs):
            obs = np.asarray(obs)
            g = np.tanh(_dense(weights, "gate_hidden", obs))
            logits = _dense(weights, "gate_out", g)
            logits = logits - logits.max(axis=-1, keepdims=True)
            gates = np.exp(logits)
            gates = gates / gates.sum(axis=-1, keepdims=True)
            outs = []
            for e in range(num_experts):
                h = obs
                for layer in expert_layers[e]:
                    h = np.tanh(_dense(weights, layer, h))
                outs.append(_dense(weights, f"expert{e}_out", h))
            stacked = np.stack(outs, axis=-2)  # [..., E, u]
            return np.einsum("...e,...eu->...u", gates, stacked)

        return forward

    hidden = layers_with("hidden")
    assert hidden and "params/out/kernel" in names, sorted(names)

    def forward(obs):
        h = np.asarray(obs)
        for layer in hidden:
            h = np.tanh(_dense(weights, layer, h))
        return _dense(weights, "out", h)

    return forward
