"""Synthetic-data training A/B against the live torch reference.

Round-1 verdict item 7: all parity evidence was logit-level on random
weights; this locks TRAINING-dynamics parity.  Both sides start from the
same converted weights and consume identical batches; the reference loop is
the real reference model + OrthLoss + AdamW + get_parameters param groups +
clip 5.0 + the double optimizer step of train_base.py:262-264 (scaler.step
followed by optimizer.step()).

Asserts, in order of strength:
  1. step-0 loss identical (forward + loss parity from converted init);
  2. the next-step loss matches ours with double_step=True far better than
     with the default single step — measuring, with data, that the
     ``--double-step`` flag replicates the reference quirk and that the
     single-step default is a real (documented) deviation
     (train/state.py:12-17);
  3. final eval mIoU within the +-0.2 parity bar of BASELINE.json.
"""

import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from segland_tpu.models import build_model
from segland_tpu.ckpt.torch_convert import convert_torch_state_dict, merge_variables
from segland_tpu.train import (
    create_optimizer,
    create_train_state,
    make_base_train_step,
    make_eval_step,
)

from reference_harness import import_reference, REFERENCE_PATH

N_BASE, SIZE, BS, STEPS, LR = 3, 48, 2, 6, 1e-4


def _make_batch(rng):
    """Quadrant task: 4 quadrants = classes 0(bg)..3, distinct colors."""
    img = np.zeros((BS, 3, SIZE, SIZE), np.float32)
    lbl = np.zeros((BS, SIZE, SIZE), np.int64)
    h = SIZE // 2
    cols = np.array([[0.05, 0.05, 0.05], [0.9, 0.1, 0.1],
                     [0.1, 0.9, 0.1], [0.1, 0.1, 0.9]], np.float32)
    quads = [(slice(0, h), slice(0, h)), (slice(0, h), slice(h, None)),
             (slice(h, None), slice(0, h)), (slice(h, None), slice(h, None))]
    for b in range(BS):
        for q, c in zip(quads, rng.permutation(4)):
            img[b][:, q[0], q[1]] = cols[c][:, None, None]
            lbl[b][q[0], q[1]] = c
    img += rng.randn(*img.shape).astype(np.float32) * 0.05
    return img, lbl


@pytest.mark.slow
def test_training_dynamics_ab_vs_reference():
    nets = import_reference()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from loss import get_loss
    from utils.pyt_utils import get_parameters

    rng = np.random.RandomState(42)
    batches = [_make_batch(rng) for _ in range(STEPS)]
    val = [_make_batch(rng) for _ in range(2)]

    class _Args:
        model = "pspnet_pop"
        ignore_label = 255

    torch.manual_seed(0)
    ref = nets.pspnet_pop.GFSS_Model(
        n_base=N_BASE, criterion=get_loss(_Args()), backbone="resnet50",
        os=8, dilated=True)
    ref.train()
    sd0 = {k: v.detach().clone().numpy() for k, v in ref.state_dict().items()}

    opt = torch.optim.AdamW(get_parameters(ref, lr=LR), lr=LR, weight_decay=1e-4)
    ref_losses = []
    for img, lbl in batches:
        opt.zero_grad()
        loss = ref(torch.from_numpy(img), torch.from_numpy(lbl))["total_loss"]
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 5.0)
        opt.step()
        opt.step()  # the reference double-step quirk (train_base.py:262-264)
        ref_losses.append(float(loss.detach()))

    # --- ours, from the SAME converted initial weights -------------------
    model = build_model("pspnet_pop", backbone="resnet50", n_base=N_BASE)
    img0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    template = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), img0, train=True))
    converted, unexpected = convert_torch_state_dict(sd0)
    assert not unexpected
    variables, missing, _ = merge_variables(template, converted)
    assert not missing

    losses = {}
    final_state = {}
    for ds in (True, False):
        tx = create_optimizer(variables["params"], LR, num_epochs=1,
                              steps_per_epoch=10 ** 6)  # lr constant, like the ref loop
        state = create_train_state(model, variables, tx)
        step = jax.jit(make_base_train_step(model, double_step=ds))
        ls = []
        for img, lbl in batches:
            state, ld, _ = step(state, jnp.asarray(img.transpose(0, 2, 3, 1)),
                                jnp.asarray(lbl))
            ls.append(float(ld["total_loss"]))
        losses[ds], final_state[ds] = ls, state

    # 1. forward+loss parity at the converted init (before any update)
    np.testing.assert_allclose(losses[True][0], ref_losses[0], rtol=1e-4)
    np.testing.assert_allclose(losses[False][0], ref_losses[0], rtol=1e-4)

    # 2. the double-step variant tracks the reference's update dynamics;
    #    the single-step default measurably does not (justifying the
    #    documented deviation + the --double-step parity flag)
    d_err = abs(losses[True][1] - ref_losses[1])
    s_err = abs(losses[False][1] - ref_losses[1])
    assert d_err <= 0.02 * abs(ref_losses[1]), (losses[True][1], ref_losses[1])
    assert s_err > 3 * d_err, (
        f"single-step unexpectedly matches the double-step reference "
        f"(d_err={d_err:.4g}, s_err={s_err:.4g})")

    # 3. end-of-training mIoU within the +-0.2 parity bar (BASELINE.json)
    ref.eval()
    import torch.nn.functional as F

    ri = np.zeros(N_BASE + 1)
    ru = np.zeros(N_BASE + 1)
    with torch.no_grad():
        for img, lbl in val:
            logits = F.interpolate(ref(torch.from_numpy(img)), (SIZE, SIZE),
                                   mode="bilinear", align_corners=True)
            pred = logits.argmax(1).numpy()
            for c in range(N_BASE + 1):
                ri[c] += ((pred == c) & (lbl == c)).sum()
                ru[c] += ((pred == c) | (lbl == c)).sum()
    miou_ref = (ri / np.maximum(ru, 1)).mean()

    ev = jax.jit(make_eval_step(model, N_BASE + 1))
    inter = np.zeros(N_BASE + 1)
    union = np.zeros(N_BASE + 1)
    state = final_state[True]
    for img, lbl in val:
        i_, u_, _ = ev(state.params, state.batch_stats,
                       jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(lbl))
        inter += np.asarray(i_)
        union += np.asarray(u_)
    miou_ours = (inter / np.maximum(union, 1)).mean()
    assert abs(miou_ours - miou_ref) <= 0.2, (miou_ours, miou_ref)
