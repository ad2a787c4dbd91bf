"""Import PyTorch ``.pt`` generator checkpoints into Flax param pytrees.

The reference persists only the generator's ``state_dict``
(/root/reference/src/vgan.py:346-349, keys ``main.{0,1,2,3}.{weight,bias}``
with weight shape (out, in)). Flax ``Dense_i`` kernels are (in, out), so the
mapping is a transpose per layer. This gives users of the reference a drop-in
migration path for already-trained generators via ``VGAN.load_models``.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def generator_params_from_torch_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """Convert a reference generator ``state_dict`` to Flax GeneratorBig params."""
    params = {}
    layer_indices = sorted(
        {int(k.split(".")[1]) for k in state_dict if k.startswith("main.")}
    )
    if len(layer_indices) != 4:
        raise ValueError(
            "state_dict does not look like a reference generator (expected "
            "4 'main.<i>.weight/bias' Linear layers, Generator.py:58-67; "
            f"found layer indices {layer_indices} among keys "
            f"{sorted(state_dict)[:6]}...) — wrong checkpoint file?"
        )
    for out_idx, torch_idx in enumerate(layer_indices):
        w = _to_numpy(state_dict[f"main.{torch_idx}.weight"])
        b = _to_numpy(state_dict[f"main.{torch_idx}.bias"])
        params[f"Dense_{out_idx}"] = {
            "kernel": np.ascontiguousarray(w.T.astype(np.float32)),
            "bias": b.astype(np.float32),
        }
    return {"params": params}


def detector_params_from_torch_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """Convert a reference Detector ``state_dict`` to Flax Detector params.

    Reference layout (/root/reference/src/models/Detector.py:5-48):
    ``{encoder,decoder}.main.{0..3}.{weight,bias}`` with torch (out, in)
    weights; Flax Dense kernels are (in, out), so each layer transposes.
    """
    params = {"encoder": {}, "decoder": {}}
    for part in ("encoder", "decoder"):
        layer_indices = sorted(
            {
                int(k.split(".")[2])
                for k in state_dict
                if k.startswith(f"{part}.main.")
            }
        )
        for out_idx, torch_idx in enumerate(layer_indices):
            w = _to_numpy(state_dict[f"{part}.main.{torch_idx}.weight"])
            b = _to_numpy(state_dict[f"{part}.main.{torch_idx}.bias"])
            params[part][f"Dense_{out_idx}"] = {
                "kernel": np.ascontiguousarray(w.T.astype(np.float32)),
                "bias": b.astype(np.float32),
            }
    return {"params": params}


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def load_torch_generator_params(path) -> Dict:
    """Load a reference ``generator_*.pt`` checkpoint (requires torch, CPU)."""
    import torch  # local import: torch is only needed for the migration path

    state_dict = torch.load(path, map_location="cpu")
    return generator_params_from_torch_state_dict(state_dict)
