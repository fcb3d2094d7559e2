"""Train state, optimizers with reference param-group semantics, poly LR.

Reference semantics reproduced (utils/pyt_utils.py:216-249, train_base.py:113-128):
  * three param groups — backbone (lr x1, wd), head biases (lr x10, wd 0),
    head weights (lr x10, wd);
  * poly decay applied PER EPOCH with power 0.9 (train_base.py:248; the
    per-iteration variant is commented out in the reference);
  * with freeze_backbone, ALL remaining groups get lr x10
    (adjust_learning_rate index_split=-1, train_base.py:116-122);
  * global grad-norm clip 5.0 before the step (train_base.py:262).

Deliberate deviation, documented for the parity audit: the reference calls
``optimizer.step()`` a second time after the AMP scaler already stepped
(train_base.py:264), double-applying each gradient.  We do a single step —
on TPU there is no loss scaler, and the double step is a bug whose effect is
approximately a different effective LR; mIoU parity is validated at the
benchmark level instead.
"""

from typing import Any, Callable, Optional

import jax.numpy as jnp
import optax
import flax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    epoch: int = 0


def poly_lr_schedule(base_lr: float, num_epochs: int, steps_per_epoch: int, power: float = 0.9):
    """lr(step) = base * (1 - epoch/num_epochs)^power, epoch-granular."""

    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch)
        frac = 1.0 - epoch.astype(jnp.float32) / num_epochs
        return base_lr * jnp.power(jnp.maximum(frac, 0.0), power)

    return schedule


def _param_labels(params, trainable_fn: Optional[Callable] = None):
    """Label each param leaf: 'backbone' | 'head_bias' | 'head_weight' | 'frozen'.

    Mirrors torch name matching: non-backbone params whose (leaf) name
    contains 'bias' go to the wd-0 x10 group (utils/pyt_utils.py:216-249).
    """
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        if trainable_fn is not None and not trainable_fn(path):
            labels[path] = "frozen"
        elif path[0] == "backbone":
            labels[path] = "backbone"
        elif "bias" in path[-1]:
            labels[path] = "head_bias"
        else:
            labels[path] = "head_weight"
    return flax.traverse_util.unflatten_dict(labels)


def create_optimizer(
    params,
    base_lr: float,
    num_epochs: int,
    steps_per_epoch: int,
    weight_decay: float = 1e-4,
    power: float = 0.9,
    optimizer: str = "adamw",
    momentum: float = 0.9,
    clip: float = 5.0,
    head_lr_scale: float = 10.0,
    freeze_backbone: bool = False,
    fix_lr: bool = False,
    trainable_fn: Optional[Callable] = None,
):
    """Build the reference-equivalent optax transform.

    trainable_fn(path_tuple) -> bool marks frozen subtrees (ft mode:
    backbone/decoder/classifier/base_emb frozen, reference
    networks/pspnet_pop.py:87-93 + ft_pop.py:240).
    """
    if fix_lr:
        lr_fn = lambda step: base_lr  # reference ft --fix-lr (ft_oem.sh)
    else:
        lr_fn = poly_lr_schedule(base_lr, num_epochs, steps_per_epoch, power)

    def scaled(scale, wd):
        def tx_lr(step):
            return lr_fn(step) * scale

        if optimizer == "adamw":
            return optax.adamw(tx_lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
        if optimizer == "sgd":
            # torch SGD: wd folded into grad before momentum
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.trace(decay=momentum),
                optax.scale_by_learning_rate(tx_lr),
            )
        raise ValueError(optimizer)

    # with freeze_backbone the reference scales every remaining group x10
    transforms = {
        "backbone": scaled(1.0, weight_decay),
        "head_bias": scaled(head_lr_scale, 0.0),
        "head_weight": scaled(head_lr_scale, weight_decay),
        "frozen": optax.set_to_zero(),
    }
    labels = _param_labels(params, trainable_fn)
    tx = optax.multi_transform(transforms, labels)
    if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
