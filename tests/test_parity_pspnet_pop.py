"""End-to-end parity: reference pspnet_pop GFSS_Model (torch, random weights)
vs our GFSSModel with the converted state_dict — same input, same logits.

This validates at once: the ResNet backbone, the PSP decoder (adaptive pools,
align_corners=False upsampling), the fused POP head, and the .pth converter.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from segland_tpu.models import build_model
from segland_tpu.models.pop import GFSSModel
from segland_tpu.ckpt.torch_convert import convert_torch_state_dict, merge_variables

from reference_harness import import_reference


@pytest.fixture(scope="module")
def ref_networks():
    return import_reference()


def _convert(ref_model, our_model, img_shape, is_ft=False):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    converted, unexpected = convert_torch_state_dict(sd)
    assert not unexpected, f"unconverted torch keys: {unexpected[:8]}"
    img = jnp.zeros(img_shape, jnp.float32)
    template = our_model.init(jax.random.PRNGKey(0), img, train=False)
    template = jax.tree_util.tree_map(np.asarray, template)
    variables, missing, loaded = merge_variables(template, converted)
    assert not missing, f"missing flax leaves: {missing[:8]}"
    return variables


def test_forward_base_parity(ref_networks, rng):
    torch.manual_seed(0)
    ref = ref_networks.pspnet_pop.GFSS_Model(
        n_base=7, criterion=None, backbone="resnet50", os=8, dilated=True
    )
    ref.eval()

    ours = build_model("pspnet_pop", backbone="resnet50", n_base=7)
    variables = _convert(ref, ours, (1, 64, 64, 3))

    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # [1,8,h,w]

    got = ours.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_forward_all_parity_ft(ref_networks, rng):
    torch.manual_seed(1)
    ref = ref_networks.pspnet_pop.GFSS_Model(
        n_base=7, criterion=None, backbone="resnet50", os=8, dilated=True,
        is_ft=True, n_novel=4,
    )
    # give frozen-at-zero base_emb + novel_emb real values
    with torch.no_grad():
        ref.base_emb.copy_(torch.randn(7, 512))
        ref.novel_emb.copy_(torch.randn(4, 512))
    ref.eval()

    ours = build_model("pspnet_pop", backbone="resnet50", n_base=7, n_novel=4, is_ft=True)
    variables = _convert(ref, ours, (1, 64, 64, 3), is_ft=True)

    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # [1,12,h,w] via forward_all

    got = ours.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
