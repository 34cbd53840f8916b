"""Model export (the TPU-native analog of ONNX/TorchScript export).

The reference exports ONNX + TorchScript (nn/model.py:904-963). The JAX
equivalents are (1) StableHLO via ``jax.export`` — a portable, versioned
serialization of the jitted computation runnable by any StableHLO consumer
(IREE, TF, PJRT plugins) — and (2) flat .npz weights (train/checkpoints.py).
"""

from __future__ import annotations

from pathlib import Path


def export_stablehlo(model, variables, example_datapoint: dict, path) -> Path:
    """Serialize the jitted forward to a StableHLO artifact on disk."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    dp = {k: jnp.asarray(v) for k, v in example_datapoint.items()}

    def fwd(variables, dp):
        return model.apply(variables, dp)[model.out_key]

    exported = jexport.export(jax.jit(fwd))(variables, dp)
    blob = exported.serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    return path


def load_stablehlo(path):
    """Deserialize an exported artifact; returns a callable exported object."""
    from jax import export as jexport
    return jexport.deserialize(Path(path).read_bytes())


def export_weights_npz(model, variables, path) -> Path:
    """Portable flat-key weight export (enhax/train/checkpoints.py)."""
    from enhax.train.checkpoints import save_params_npz
    save_params_npz(path, variables)
    return Path(path)
