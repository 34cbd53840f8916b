"""RSFNet: Retinex sparse-factorization network.

Rebuild of reference ``vision/enhance/llie/rsfnet/rsfnet.py:38-360``: an
unrolled sparse factorization — F factors extracted by iterative soft
thresholding with learnable per-iteration thresholds (lambda_a/lambda_e) and
step sizes — followed by a conv fusion head, trained with the
color/exposure/TV zero-reference loss.

Deviation: the reference tracks per-epoch factor statistics on the host and
freezes lambdas after ``freeze_epochs`` (rsfnet.py:188-257); enhax keeps the
factorization purely functional and expresses the freeze as the jit-safe
``enhax.nn.optim.freeze_after`` transform — config:
``{"freeze": {"match": "lambda_|step", "after_steps": 25 * steps_per_epoch}}``.
The unrolled math — e = shrink(a, lambda_e); a <- a - step * e — is preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model


def _soft_threshold(v, thr, eps: float = 1e-8):
    """Group soft-threshold over the channel norm (reference thres_e)."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    scale = jnp.maximum(1.0 - thr / (norm + eps), 0.0)
    return scale * v


class Factorization(nn.Module):
    """Unrolled ISTA-style sparse factor extraction (rsfnet.py:82-208)."""
    factors: int = 5
    num_iters: int = 3

    @nn.compact
    def __call__(self, x):
        lambdas = self.param("lambda_e", nn.initializers.zeros,
                             (self.factors, self.num_iters))
        steps = self.param("step", nn.initializers.ones,
                           (self.factors, self.num_iters))
        a = x
        all_e = []
        for f in range(self.factors):
            e = jnp.zeros_like(a)
            for t in range(self.num_iters):
                thr = jax.nn.softplus(lambdas[f, t])
                e = _soft_threshold(a - steps[f, t] * (e - a), thr)
            a = a - e
            if f > 0:
                e = jnp.abs(e - all_e[-1])
            all_e.append(e)
        return jnp.concatenate(all_e, axis=-1)


class Fusion(nn.Module):
    """Conv fusion of the stacked factors (rsfnet.py:210-256)."""
    factors: int = 5

    @nn.compact
    def __call__(self, s):
        y = nn.relu(nn.Conv(3 * self.factors, (3, 3), name="conv1")(s))
        y = nn.relu(nn.Conv(3 * self.factors, (3, 3), name="conv2")(y))
        y = nn.Conv(3, (3, 3), name="conv3")(y)
        return jax.nn.sigmoid(y)


class RSFNetModule(nn.Module):
    factors: int = 5
    num_iters: int = 3

    @nn.compact
    def __call__(self, x):
        s = Factorization(self.factors, self.num_iters, name="factorization")(x)
        enhanced = Fusion(self.factors, name="fusion")(s)
        return {"factors": s, "enhanced": enhanced}


def rsfnet_loss(col_weight: float = 10.0, exp_weight: float = 2.0,
                tv_weight: float = 2.0):
    col = LOSSES.build("color_constancy_loss")
    tv = LOSSES.build("total_variation_loss")
    exp = LOSSES.build("exposure_control_loss", patch_size=16, mean_val=0.6)

    def fn(outputs, datapoint):
        e = outputs["enhanced"]
        return col_weight * col(e) + exp_weight * exp(e) + tv_weight * tv(e)
    return fn


@MODELS.register(name="rsfnet", arch="rsfnet",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_REFERENCE, Scheme.INSTANCE))
def rsfnet(factors: int = 5, num_iters: int = 3, **kwargs) -> Model:
    return Model(
        name="rsfnet", arch="rsfnet",
        module=RSFNetModule(factors=factors, num_iters=num_iters),
        tasks=(Task.LLIE,), schemes=(Scheme.ZERO_REFERENCE, Scheme.INSTANCE),
        loss_fn=rsfnet_loss(),
        required_inputs=("image",),
        instance_steps=500, instance_lr=1e-3,
    )
