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
