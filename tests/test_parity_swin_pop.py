"""End-to-end parity: reference swin_pop GFSS_Model (swin-t for speed, random
weights) vs our GFSSModel with converted state_dict.

Validates the Swin backbone (shifted windows, rel-pos bias, patch merging),
the UperNet+ decoder (PSP-v2, laterals, scale heads), and the swin converter
rules in one shot.  Uses a 56x56 input so every stage exercises window
padding/shift (56/4=14 -> 14,7,4,2 token grids; stages 2,3 need padding).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from segland_tpu.models import build_model
from segland_tpu.ckpt.torch_convert import convert_torch_state_dict, merge_variables

from reference_harness import import_reference


@pytest.mark.slow
def test_swin_pop_forward_base_parity(rng):
    ref_networks = import_reference()
    torch.manual_seed(0)
    ref = ref_networks.swin_pop.GFSS_Model(n_base=7, criterion=None, backbone="swin-t")
    ref.eval()

    ours = build_model("swin_pop", backbone="swin-t", n_base=7)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted, unexpected = convert_torch_state_dict(sd)
    assert not unexpected, f"unconverted keys: {unexpected[:10]}"
    img0 = jnp.zeros((1, 56, 56, 3), jnp.float32)
    template = ours.init(jax.random.PRNGKey(0), img0, train=False)
    template = jax.tree_util.tree_map(np.asarray, template)
    variables, missing, _ = merge_variables(template, converted)
    assert not missing, f"missing leaves: {missing[:10]}"

    x = rng.randn(1, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = ours.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    # measured 8.2e-8 max abs diff on the CPU test platform (fp32 exact);
    # 5e-4 matches the rest of the zoo and leaves platform headroom
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
