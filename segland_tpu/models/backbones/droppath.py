"""Stochastic depth (DropPath), the timm semantics the reference backbones
train with (swintransformer.py:454,478 drop_path_rate=0.2; lsknet.py:193-201
drop_path_rate=0.1; decay rule lsknet.py:134 / swintransformer.py linspace
over sum(depths)).

Per-SAMPLE branch drop: with probability `rate` the whole residual branch is
zeroed for a sample; surviving samples are scaled by 1/keep so the expected
value is unchanged.  Identity at eval (train=False) and at rate 0 — parity
tests and converted checkpoints are untouched (DropPath has no params).

Uses the "dropout" PRNG stream so training steps thread exactly one rng
(train/base.py supplies rngs={"dropout": fold_in(key, step)}).
"""

import jax
import jax.numpy as jnp
import flax.linen as nn


def drop_path_rates(drop_path_rate: float, depths) -> list:
    """The linspace stochastic-depth decay rule (reference lsknet.py:134):
    per-block rates 0 -> drop_path_rate over the total network depth."""
    total = sum(depths)
    if total <= 1:
        # torch.linspace(0, rate, 1) == [0.0]
        return [0.0] * total
    return [drop_path_rate * i / (total - 1) for i in range(total)]


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros_like(x))
