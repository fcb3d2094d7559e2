"""Parity vs the torch reference for the remaining head families:
deeplab_pop (ASPP), convnext_pop (FPN-OCR), lsk_pop (gated FPN),
seghr_pop (HRNet + HRFPN), vggunet_pop. All slow-marked (full compiles)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from segland_tpu.models import build_model
from segland_tpu.ckpt.torch_convert import convert_torch_state_dict, merge_variables

from reference_harness import import_reference


def _parity(ref_model, our_model, size, rng, arch=None, tol=1e-3):
    """Eval-forward parity.  is_ft reference models route through forward_all
    (reference networks/swin_pop.py:226-233 etc.), ours through __call__'s
    is_ft branch — so the same call covers both base and ft eval modes."""
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    converted, unexpected = convert_torch_state_dict(sd, arch=arch)
    assert not unexpected, f"unconverted keys: {unexpected[:10]}"
    img0 = jnp.zeros((1, size, size, 3), jnp.float32)
    template = our_model.init(jax.random.PRNGKey(0), img0, train=False)
    template = jax.tree_util.tree_map(np.asarray, template)
    variables, missing, _ = merge_variables(template, converted)
    assert not missing, f"missing leaves: {missing[:10]}"
    x = rng.randn(1, 3, size, size).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x)).numpy()
    got = our_model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


_FT_CASES = {
    # model -> (reference ctor kwargs, our backbone, arch, tol)
    "swin_pop": (dict(backbone="swin-t"), "swin-t", None, 5e-4),
    "convnext_pop": (dict(backbone="convnext-t"), "convnext-t", "convnext", 5e-4),
    "lsk_pop": (dict(backbone="lsk-t"), "lsk-t", "lsknet", 5e-4),
    "seghr_pop": (dict(backbone="hr-w18"), "hr-w18", "hrnet", 5e-4),
    "vggunet_pop": (dict(), None, "vggunet", 5e-4),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_FT_CASES))
def test_ft_forward_all_parity(name, rng):
    """ft-mode (is_ft=True, forward_all) parity for every pyramid/unet head:
    [bg, base, novel] logits with frozen base_emb + trainable novel_emb +
    cloned classifier_n (reference *_pop.py GFSS_Model is_ft branches)."""
    kwargs, backbone, arch, tol = _FT_CASES[name]
    nets = import_reference()
    torch.manual_seed(0)
    cls = getattr(nets, name).GFSS_Model
    if name == "vggunet_pop":
        # reference defect: vggunet_pop.ft_freeze references self.backbone /
        # self.decoder which do not exist (its net lives in self.net,
        # vggunet_pop.py:130-136), so is_ft construction raises
        # AttributeError as shipped.  Freezing does not affect eval forward
        # numerics, so substitute the evidently-intended freeze to still
        # validate forward_all parity.
        cls = type("GFSS_Model_fixed", (cls,), {
            "ft_freeze": lambda self: [p.requires_grad_(False)
                                       for p in list(self.net.parameters())
                                       + list(self.classifier.parameters())]})
    ref = cls(n_base=7, criterion=None, is_ft=True, n_novel=4, **kwargs)
    # make the zero-init frozen base_emb informative for the comparison
    with torch.no_grad():
        ref.base_emb.copy_(torch.randn_like(ref.base_emb) * 0.1)
    ours = build_model(name, backbone=backbone, n_base=7, n_novel=4, is_ft=True)
    size = 56 if name == "swin_pop" else 64
    _parity(ref, ours, size, rng, arch=arch, tol=tol)


@pytest.mark.slow
def test_deeplab_pop_parity(rng):
    nets = import_reference()
    torch.manual_seed(0)
    ref = nets.deeplab_pop.GFSS_Model(n_base=7, criterion=None, backbone="resnet50", os=8, dilated=True)
    ours = build_model("deeplab_pop", backbone="resnet50", n_base=7)
    _parity(ref, ours, 64, rng)


@pytest.mark.slow
def test_convnext_pop_parity(rng):
    nets = import_reference()
    torch.manual_seed(0)
    ref = nets.convnext_pop.GFSS_Model(n_base=7, criterion=None, backbone="convnext-t")
    ours = build_model("convnext_pop", backbone="convnext-t", n_base=7)
    _parity(ref, ours, 64, rng, arch="convnext")


@pytest.mark.slow
def test_lsk_pop_parity(rng):
    nets = import_reference()
    torch.manual_seed(0)
    ref = nets.lsk_pop.GFSS_Model(n_base=7, criterion=None, backbone="lsk-t")
    ours = build_model("lsk_pop", backbone="lsk-t", n_base=7)
    _parity(ref, ours, 64, rng, arch="lsknet")


@pytest.mark.slow
def test_pspplus_pop_parity(rng):
    """pspplus_pop base parity.  The reference forward is broken as shipped
    (forward_base feeds a single tensor to a decoder that indexes a feature
    LIST, pspplus_pop.py:159+49-51), but the decoder weights pin the intended
    wiring — reduce is Conv2d(512, 32), so low = x2 and the list must be
    fine->coarse.  The test patches base_forward to return the reversed
    return_list (the evident intent); everything downstream is the unmodified
    reference."""
    nets = import_reference()
    torch.manual_seed(0)
    ref = nets.pspplus_pop.GFSS_Model(
        n_base=7, criterion=None, backbone="resnet50v2", os=8, dilated=True)
    orig = ref.backbone.base_forward
    ref.backbone.base_forward = lambda img, **kw: orig(img, return_list=True)[::-1]
    ours = build_model("pspplus_pop", backbone="resnet50v2", n_base=7)
    _parity(ref, ours, 64, rng, arch="pspplus", tol=5e-4)


@pytest.mark.slow
def test_vggunet_pop_parity(rng):
    """vggunet_pop base parity: the reference head runs over a hand-built
    vgg16_bn encoder (torchvision is absent; reference_harness._vgg16_bn
    reproduces its features-Sequential indices so vggunet_pop.py:56-60's
    slicing and state-dict keys are exact)."""
    nets = import_reference()
    torch.manual_seed(0)
    ref = nets.vggunet_pop.GFSS_Model(n_base=7, criterion=None)
    ours = build_model("vggunet_pop", n_base=7)
    _parity(ref, ours, 64, rng, arch="vggunet", tol=5e-4)


@pytest.mark.slow
def test_seghr_pop_parity(rng):
    nets = import_reference()
    torch.manual_seed(0)
    ref = nets.seghr_pop.GFSS_Model(n_base=7, criterion=None, backbone="hr-w18")
    ours = build_model("seghr_pop", backbone="hr-w18", n_base=7)
    _parity(ref, ours, 64, rng, arch="hrnet")
