"""Base-class training / validation steps (reference train_base.py:235-340).

Data parallelism is GSPMD: the caller shards the batch over the mesh 'data'
axis and jits the step; gradient averaging and cross-replica BatchNorm
statistics come out of XLA collectives — no DDP, no explicit all_reduce
(replaces reference engine.py:69-74,120-131 and SyncBatchNorm).
"""

import jax
import jax.numpy as jnp
import optax

from ..losses import orth_loss, ce_loss
from ..metrics import intersection_and_union
from ..ops.resize import resize_bilinear


def make_base_train_step(model, loss_name: str = "orth", double_step: bool = False,
                         skip_nonfinite: bool = False, seed: int = 0,
                         fix_bn: bool = False, augment_fn=None):
    """Returns train_step(state, img [B,H,W,3], mask [B,H,W]) ->
    (state, loss_dict, grad_norm).

    augment_fn (optional): fused on-device augmentation
    (ops/device_aug.base_train_augment partial'd over its config) applied as
    (img, mask) = augment_fn(key, img, mask) at step start; img is then the
    raw uint8 tile batch and the whole host aug pipeline moves into the jit.

    double_step replicates a reference quirk: train_base.py:262-264 calls
    optimizer.step() a second time after the AMP scaler already stepped, so
    each gradient is applied twice (advancing Adam moments twice). Off by
    default; enable only for strict behavioral-parity experiments.

    skip_nonfinite is the failure-detection analog of the reference's AMP
    GradScaler (train_base.py:258-261, scaler.step skips on inf/nan grads):
    when any gradient is non-finite, the update (params, opt state, BN stats)
    is dropped for that step — inside jit via lax.cond-free jnp.where trees,
    so it costs nothing when grads are healthy.  loss_dict gains
    'nonfinite_skipped' (0/1) so the driver can count and alert.
    """
    is_pop = loss_name == "orth"

    def train_step(state, img, mask):
        # one "dropout" stream feeds nn.Dropout AND DropPath (stochastic
        # depth) in the swin/lsknet/psp_v2 train paths; deterministic per
        # (seed, step) so resume reproduces the same noise sequence.
        step_key = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        rngs = {"dropout": step_key}
        aug_fb = None
        if augment_fn is not None:
            # independent per-step stream for the on-device augs (fold tag 1
            # keeps the dropout stream identical to the augment_fn=None path)
            out = augment_fn(jax.random.fold_in(step_key, 1), img, mask)
            if len(out) == 3:  # return_stats=True: crop-retry fallback count
                img, mask, aug_fb = out
            else:
                img, mask = out

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if is_pop:
                (logits, sim), new_state = state.apply_fn(
                    variables, img, train=True, mutable=["batch_stats"],
                    rngs=rngs, method=type(model).forward_base,
                )
                ld = orth_loss(logits, mask, sim)
            else:
                (out, new_state) = state.apply_fn(
                    variables, img, train=True, mutable=["batch_stats"], rngs=rngs
                )
                logits, aux = out
                ld = ce_loss(logits, mask, aux_logits=aux)
            return ld["total_loss"], (ld, new_state)

        grads, (ld, new_model_state) = jax.grad(loss_fn, has_aux=True)(state.params)
        if aug_fb is not None:
            ld = dict(ld, aug_fallback=aug_fb)
        grad_norm = optax.global_norm(grads)
        new_state = state.apply_gradients(
            grads=grads,
            # --fix-bn: running statistics stay frozen (see cli/common.py)
            batch_stats=state.batch_stats if fix_bn
            else new_model_state["batch_stats"],
        )
        if double_step:
            new_state = new_state.apply_gradients(grads=grads)
        if skip_nonfinite:
            ok = jnp.isfinite(grad_norm)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)
            new_state = new_state.replace(
                params=keep(new_state.params, state.params),
                opt_state=keep(new_state.opt_state, state.opt_state),
                batch_stats=keep(new_state.batch_stats, state.batch_stats),
                step=jnp.where(ok, new_state.step, state.step),
            )
            ld = dict(ld, nonfinite_skipped=1.0 - ok.astype(jnp.float32))
        return new_state, ld, grad_norm

    return train_step


def make_eval_step(model, num_classes: int, ignore_index: int = 255):
    """Whole-tile eval step: logits upsampled to label size
    (align_corners=True, reference train_base.py:331-333 / eval_base.py:168),
    argmax, per-class intersection/union accumulators."""

    def eval_step(params, batch_stats, img, mask):
        logits = model.apply({"params": params, "batch_stats": batch_stats}, img, train=False)
        logits = resize_bilinear(
            logits.astype(jnp.float32), mask.shape[-2:], align_corners=True
        )
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return intersection_and_union(pred, mask, num_classes, ignore_index)

    return eval_step


def make_predict_step(model):
    """Eval forward returning upsampled fp32 probabilities-logits (for export)."""

    def predict(params, batch_stats, img, out_hw):
        logits = model.apply({"params": params, "batch_stats": batch_stats}, img, train=False)
        return resize_bilinear(logits.astype(jnp.float32), out_hw, align_corners=True)

    return predict
