"""Converters for metric-network checkpoints (LPIPS).

The reference scores LPIPS through torchmetrics / pyiqa
(reference src/mon/nn/metric/image.py:63-83, project/runml/metric.py:81),
both of which execute the published ``lpips`` package graph: AlexNet
features -> unit channel-normalize -> per-layer 1x1 "lin" heads ->
spatial average -> sum. The released checkpoints (and torchmetrics'
``_NoTrainLpips`` state dict) use the lpips-package layout:

    scaling_layer.shift / scaling_layer.scale      (1, 3, 1, 1) buffers
    net.slice1.0.{weight,bias}                     Conv2d(3,   64, 11, s4, p2)
    net.slice2.3.{weight,bias}                     Conv2d(64, 192, 5, p2)
    net.slice3.6.{weight,bias}                     Conv2d(192, 384, 3, p1)
    net.slice4.8.{weight,bias}                     Conv2d(384, 256, 3, p1)
    net.slice5.10.{weight,bias}                    Conv2d(256, 256, 3, p1)
    lin0..lin4.model.1.weight                      Conv2d(C, 1, 1, bias=False)

(Slice indices follow torchvision's ``alexnet().features`` numbering,
which the lpips package preserves inside its slice Sequentials.)

``load_lpips_checkpoint`` converts such a file into the pytree +
lin-weight list that ``enhax.nn.metrics.lpips`` consumes. No weights are
bundled (no-egress image); tests/test_metrics.py grounds the converter by
executing a torch replica of the published graph on a synthesized
checkpoint and asserting score equality.
"""

from __future__ import annotations

import numpy as np

_SLICE_TO_CONV = {
    "net.slice1.0": "conv1",
    "net.slice2.3": "conv2",
    "net.slice3.6": "conv3",
    "net.slice4.8": "conv4",
    "net.slice5.10": "conv5",
}


def load_lpips_checkpoint(path_or_state) -> dict:
    """Convert an lpips/torchmetrics AlexNet-LPIPS checkpoint.

    Accepts a path to a torch-saved state dict, or the state dict itself.
    Returns ``{"params": flax_params, "lin_weights": [5 x (C,)],
    "shift": (3,), "scale": (3,)}`` — the keyword inputs of
    ``enhax.nn.metrics.lpips``. Missing scaling-layer buffers fall back to
    the published constants.
    """
    import jax

    from enhax.convert.torch_weights import (convert_state_dict,
                                             unwrap_state_dict)
    from enhax.nn.metrics import _LPIPSAlexFeatures

    if isinstance(path_or_state, dict):
        state = path_or_state
    else:
        import torch
        state = torch.load(str(path_or_state), map_location="cpu",
                           weights_only=True)
    state = unwrap_state_dict(state)
    state = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
                 else np.asarray(v)) for k, v in state.items()}

    trunk = {}
    lins = [None] * 5
    shift = np.asarray([-0.030, -0.088, -0.188], np.float32)
    scale = np.asarray([0.458, 0.448, 0.450], np.float32)
    for k, v in state.items():
        if k.startswith("scaling_layer.shift"):
            shift = v.reshape(-1).astype(np.float32)
        elif k.startswith("scaling_layer.scale"):
            scale = v.reshape(-1).astype(np.float32)
        elif k.startswith("lin"):
            idx = int(k[3])
            lins[idx] = v.reshape(-1).astype(np.float32)
        else:
            for pre, conv in _SLICE_TO_CONV.items():
                if k.startswith(pre):
                    trunk[conv + k[len(pre):]] = v
                    break
    missing = [i for i, w in enumerate(lins) if w is None]
    if missing:
        raise ValueError(f"LPIPS checkpoint missing lin heads {missing}")

    feat = _LPIPSAlexFeatures()
    template = feat.init(jax.random.PRNGKey(0),
                         np.zeros((1, 64, 64, 3), np.float32))
    params, report = convert_state_dict(trunk, template, strict=True)
    unmatched = [r for r in report if r.startswith("unmatched")]
    if unmatched:
        raise ValueError(f"LPIPS trunk conversion incomplete: {unmatched}")
    return {"params": params, "lin_weights": lins,
            "shift": shift, "scale": scale}
