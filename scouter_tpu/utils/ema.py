"""Parameter EMA — timm ``ModelEma`` (``timm/utils.py:234-297``) capability.

Functional: an EMA is just a params pytree updated as
``ema = decay * ema + (1 - decay) * params`` after each step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["ModelEma"]


class ModelEma:
    def __init__(self, params: Any, decay: float = 0.9999):
        self.decay = decay
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        # decay is a TRACED argument: timm-style warmup mutates ema.decay per
        # step, and a closure-captured float would be baked in at first trace
        self._update = jax.jit(
            lambda ema, p, d: jax.tree_util.tree_map(
                lambda e, q: d * e + (1.0 - d) * q, ema, p
            )
        )

    def update(self, params: Any) -> None:
        self.params = self._update(self.params, params,
                                   jnp.asarray(self.decay, jnp.float32))
