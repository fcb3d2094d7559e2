"""Loss parity vs torch CrossEntropyLoss + reference orth penalty."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from segland_tpu.losses import cross_entropy, orth_penalty, ce_loss, orth_loss


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(2, 8, 8, 5).astype(np.float32)
    labels = rng.randint(0, 5, (2, 8, 8)).astype(np.int32)
    labels[0, :2] = 255
    want = F.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels.astype(np.int64)),
        ignore_index=255,
    ).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ce_loss_with_upsample_matches_torch(rng):
    logits = rng.randn(2, 4, 4, 5).astype(np.float32)
    labels = rng.randint(0, 5, (2, 16, 16)).astype(np.int32)
    up = F.interpolate(torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))), size=(16, 16), mode="bilinear", align_corners=True)
    want = F.cross_entropy(up, torch.from_numpy(labels.astype(np.int64)), ignore_index=255).item()
    got = float(ce_loss(jnp.asarray(logits), jnp.asarray(labels))["total_loss"])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_orth_penalty_matches_reference(rng):
    # square (base training)
    sim = rng.randn(7, 7).astype(np.float32)
    t = torch.from_numpy(sim)
    eye = torch.triu(torch.ones_like(t), diagonal=1)
    want = torch.abs(t[eye == 1]).mean().item()
    np.testing.assert_allclose(float(orth_penalty(jnp.asarray(sim))), want, rtol=1e-6)
    # rectangular (fine-tune: novel x (novel++base))
    sim = rng.randn(4, 11).astype(np.float32)
    t = torch.from_numpy(sim)
    eye = torch.triu(torch.ones_like(t), diagonal=1)
    want = torch.abs(t[eye == 1]).mean().item()
    np.testing.assert_allclose(float(orth_penalty(jnp.asarray(sim))), want, rtol=1e-6)


def test_orth_loss_dict(rng):
    logits = rng.randn(1, 4, 4, 8).astype(np.float32)
    labels = rng.randint(0, 8, (1, 8, 8)).astype(np.int32)
    sim = rng.randn(7, 7).astype(np.float32)
    d = orth_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(sim))
    assert set(d) == {"total_loss", "seg_loss", "orth_loss"}
    np.testing.assert_allclose(
        float(d["total_loss"]), float(d["seg_loss"]) + 10.0 * float(d["orth_loss"]), rtol=1e-6
    )


def test_cross_entropy_out_of_range_labels_are_ignored(rng):
    """Labels outside [0, K) must act like ignore_index: torch asserts on
    them (the reference crashes on mislabeled data) while a jnp
    take_along_axis OOB gather fills NaN in the primal yet DROPS the pixel
    in the VJP — i.e. a silent nan loss with finite grads (hit by the e2e
    fixture's novel-class tiles during base training).  The masked loss must
    be finite and equal the CE over the in-range pixels only."""
    import jax

    logits = rng.randn(2, 8, 8, 5).astype(np.float32)
    labels = rng.randint(0, 5, (2, 8, 8)).astype(np.int32)
    labels[0, 0] = 9       # above K
    labels[1, 3, :4] = -2  # negative (not ignore_index)
    masked = np.where((labels < 0) | (labels >= 5), 255, labels)

    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(cross_entropy(jnp.asarray(logits), jnp.asarray(masked)))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # grads stay finite and match the masked-label grads exactly
    g = jax.grad(lambda l: cross_entropy(l, jnp.asarray(labels)))(jnp.asarray(logits))
    g_ref = jax.grad(lambda l: cross_entropy(l, jnp.asarray(masked)))(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-7)
