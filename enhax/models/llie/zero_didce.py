"""Zero-DiDCE: dual-input fast curve estimation (Zero-DCE derivative).

Native rebuild of the reference's vendored Zero-DiDCE
(mon_extra/vision/enhance/llie/zero_didce/model.py; EXTRA_MODELS
"zero_didce"): a 4-conv curve net run on BOTH x and its inverse 1-x,
averaged curves, then a brightness-adaptive number of quadratic curve
iterations with a per-step gain schedule:

  xx1 = mean(x); n1 = 0.63; n3 = -0.79*m^2 + 0.81*m + 1.4
  b = piecewise(m)                              (model.py:38-47)
  repeat b times: x += r * (x^2 - x) * (n1 - mean(x)) / (n3 - mean(x))

The torch code drives the loop with host `.item()` calls and a Python
`for` — here the iteration count and gains are traced scalars inside a
``lax.while_loop`` (no host syncs, one compiled graph for all inputs).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.llie.zero_dce import zero_reference_loss


class ZeroDiDCEModule(nn.Module):
    num_channels: int = 32
    max_iters: int = 12   # loop bound; b <= 10 over m in [0, 1]
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv = lambda f, name: nn.Conv(f, (3, 3), dtype=self.dtype,  # noqa: E731
                                       name=name)
        c1 = conv(self.num_channels, "e_conv1")
        c2 = conv(self.num_channels, "e_conv2")
        c3 = conv(self.num_channels, "e_conv3")
        c7 = conv(3, "e_conv7")

        def curves(t):
            x1 = nn.relu(c1(t))
            x2 = nn.relu(c2(x1))
            x3 = nn.relu(c3(x2))
            return jnp.tanh(c7(jnp.concatenate([x1, x3], axis=-1)))

        r = (curves(x) + curves(1.0 - x)) / 2.0

        m = jnp.mean(x)
        n1 = 0.63
        s = m * m
        n3 = -0.79 * s + 0.81 * m + 1.4
        b = jnp.where(
            m < 0.1, -25.0 * m + 10.0,
            jnp.where(m < 0.45, 17.14 * s - 15.14 * m + 10.0,
                      5.66 * s - 2.93 * m + 7.2))
        b = jnp.floor(b).astype(jnp.int32)  # torch int(b)

        # bounded fori_loop with an i<b mask instead of a data-dependent
        # while_loop: identical iterates (masked steps are identity), and —
        # unlike lax.while_loop — reverse-mode differentiable, so the
        # registered zero-reference training path works
        n_iters = jnp.minimum(b, self.max_iters)

        def body(i, y):
            gain = (n1 - jnp.mean(y)) / (n3 - jnp.mean(y))
            step = r * (y * y - y) * gain
            return jnp.where(i < n_iters, y + step, y)

        y = jax.lax.fori_loop(0, self.max_iters, body, x)
        return {"enhanced": y, "adjust": r}


@MODELS.register(name="zero_didce", arch="zero_dce", tasks=(Task.LLIE,),
                 schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def zero_didce(num_channels: int = 32, **kwargs) -> Model:
    return Model(
        name="zero_didce", arch="zero_dce",
        module=ZeroDiDCEModule(num_channels=num_channels),
        tasks=(Task.LLIE,),
        schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        loss_fn=zero_reference_loss(),
        required_inputs=("image",),
        size_divisor=1,
    )
