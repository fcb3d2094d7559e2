"""Novel-class fine-tuning step (reference ft_pop.py:242-256 +
networks/pspnet_pop.py:191-243).

The reference concatenates the novel-support batch and the base batch, runs
forward_novel, then MUTATES mask_b in place with pseudo-labels from the novel
head (pspnet_pop.py:221-231).  Here pseudo-labeling is a pure function: the
base-sample background (mask_b == 0) is relabeled with
argmax(novel-head logits upsampled align_corners=True), novel indices offset
by n_base.  Backbone/decoder/classifier are frozen (optimizer mask) and BN
runs in inference mode (train_mode(), pspnet_pop.py:80-85), so batch_stats
never update during ft.
"""

import jax
import jax.numpy as jnp
import optax

from ..losses import orth_loss
from ..ops.resize import resize_bilinear


FT_FROZEN_PREFIXES = ("backbone", "decoder", "classifier", "base_emb")


def ft_trainable(path) -> bool:
    """Trainable leaves in ft mode: novel_emb + classifier_n only."""
    head = path[0]
    if head == "classifier_n" or head == "novel_emb":
        return True
    return False


def pseudo_label(mask_b: jnp.ndarray, novel_logits_b: jnp.ndarray, n_base: int) -> jnp.ndarray:
    """Relabel base-sample background pixels with novel-head predictions.

    mask_b: [Bb,H,W] int; novel_logits_b: [Bb,h,w,1+Kn] (base half only).
    """
    up = resize_bilinear(
        novel_logits_b.astype(jnp.float32), mask_b.shape[-2:], align_corners=True
    )
    idx = jnp.argmax(up, axis=-1).astype(mask_b.dtype)
    idx = jnp.where(idx > 0, idx + n_base, idx)
    return jnp.where(mask_b == 0, idx, mask_b)


def make_ft_train_step(model, n_base: int, skip_nonfinite: bool = False):
    """train_step(state, img, mask, img_b, mask_b) -> (state, loss_dict, grad_norm).

    img/mask: novel-support samples; img_b/mask_b: base samples (equal batch
    halves, reference oem_ft returns the pair per item).
    skip_nonfinite: drop the update on inf/nan grads (see train/base.py).
    """
    fwd = type(model).forward_novel

    def train_step(state, img, mask, img_b, mask_b):
        # Differentiate w.r.t. the TRAINABLE subset only (novel_emb +
        # classifier_n).  The reference freezes the rest with
        # requires_grad=False (ft_pop.py + pspnet_pop.py:80-85), so torch
        # never runs the backbone/decoder backward and its grad clip only
        # sees trainable grads; masking a full-tree jax.grad would instead
        # pay the whole backbone backward and then discard it (measured
        # 105.0 -> 36.4 ms/step on the ft flagship, benchmarks/train_bench).
        import flax

        flat = flax.traverse_util.flatten_dict(state.params)
        tr = {p: v for p, v in flat.items() if ft_trainable(p)}
        fz = {p: v for p, v in flat.items() if not ft_trainable(p)}

        def loss_fn(tr_params):
            params = flax.traverse_util.unflatten_dict({**fz, **tr_params})
            variables = {"params": params, "batch_stats": state.batch_stats}
            img_full = jnp.concatenate([img, img_b], axis=0)
            logits, novel_logits, sim = state.apply_fn(variables, img_full, method=fwd)
            nb = img.shape[0]
            mask_new = pseudo_label(
                mask_b, jax.lax.stop_gradient(novel_logits[nb:]), n_base
            )
            mask_all = jnp.concatenate([mask, mask_new], axis=0)
            ld = orth_loss(logits, mask_all, sim)
            return ld["total_loss"], ld

        grads_tr, ld = jax.grad(loss_fn, has_aux=True)(tr)
        grad_norm = optax.global_norm(grads_tr)
        grads = flax.traverse_util.unflatten_dict(
            {**{p: jnp.zeros_like(v) for p, v in fz.items()}, **grads_tr})
        new_state = state.apply_gradients(grads=grads)
        if skip_nonfinite:
            ok = jnp.isfinite(grad_norm)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)
            new_state = new_state.replace(
                params=keep(new_state.params, state.params),
                opt_state=keep(new_state.opt_state, state.opt_state),
                step=jnp.where(ok, new_state.step, state.step),
            )
            ld = dict(ld, nonfinite_skipped=1.0 - ok.astype(jnp.float32))
        return new_state, ld, grad_norm

    return train_step


def init_cls_n(params):
    """Copy the base classifier weights into classifier_n (reference
    GFSS_Model.init_cls_n, networks/pspnet_pop.py:76-78), returning new params."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = dict(flat)
    copied = False
    for path, leaf in flat.items():
        if path[0] == "classifier":
            target = ("classifier_n",) + path[1:]
            if target in flat:
                out[target] = leaf
                copied = True
    if not copied:
        raise ValueError("no classifier/classifier_n pair found")
    return flax.traverse_util.unflatten_dict(out)
