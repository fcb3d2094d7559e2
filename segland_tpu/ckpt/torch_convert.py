"""PyTorch .pth -> flax variables converter.

Mirrors reference utils/pyt_utils.py:86-135 semantics: accepts raw
state_dicts or {'state_dict': ...}/{'model': ...} nesting, strips the DDP
``module.`` prefix, supports grafting a bare backbone checkpoint under
``backbone.`` (backbone_only), and is non-strict (missing/unexpected keys
are returned for logging, not fatal).

Torch->flax weight layout rules:
  Conv2d  weight [O,I,kh,kw] -> kernel [kh,kw,I,O]
  Linear  weight [O,I]       -> kernel [I,O]
  BatchNorm weight/bias      -> scale/bias (params)
            running_mean/var -> batch_stats mean/var
  POP classifier convs (1x1, bias-free) -> dense mats w1/w2 [I,O], w3 [I]
"""

import re
from typing import Dict, Tuple

import numpy as np
import flax


def _load_torch(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    elif isinstance(blob, dict) and "model" in blob:
        blob = blob["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in blob.items()}


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """is_restore semantics: drop the 7-char 'module.' DDP prefix
    (utils/pyt_utils.py:107-110)."""
    return {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    return w.T


def _bn_rules(torch_prefix: str, flax_path_fn):
    """BN rules: weight->scale, bias->bias (params); running_* -> batch_stats."""
    out = []
    for leaf, section, name in (
        ("weight", "params", "scale"),
        ("bias", "params", "bias"),
        ("running_mean", "batch_stats", "mean"),
        ("running_var", "batch_stats", "var"),
    ):
        out.append((
            re.compile(rf"^{torch_prefix}\.{leaf}$"),
            (lambda sec, nm, fn: lambda m: (sec,) + fn(m) + (nm,))(section, name, flax_path_fn),
            None,
        ))
    return out


def _ln_rules(torch_prefix: str, flax_path_fn):
    return [
        (re.compile(rf"^{torch_prefix}\.weight$"), lambda m, fn=flax_path_fn: ("params",) + fn(m) + ("scale",), None),
        (re.compile(rf"^{torch_prefix}\.bias$"), lambda m, fn=flax_path_fn: ("params",) + fn(m) + ("bias",), None),
    ]


def _conv_rules(torch_prefix: str, flax_path_fn, has_bias=True):
    out = [(re.compile(rf"^{torch_prefix}\.weight$"), lambda m, fn=flax_path_fn: ("params",) + fn(m) + ("kernel",), _conv_kernel)]
    if has_bias:
        out.append((re.compile(rf"^{torch_prefix}\.bias$"), lambda m, fn=flax_path_fn: ("params",) + fn(m) + ("bias",), None))
    return out


def _dense_rules(torch_prefix: str, flax_path_fn, has_bias=True):
    out = [(re.compile(rf"^{torch_prefix}\.weight$"), lambda m, fn=flax_path_fn: ("params",) + fn(m) + ("kernel",), _dense_kernel)]
    if has_bias:
        out.append((re.compile(rf"^{torch_prefix}\.bias$"), lambda m, fn=flax_path_fn: ("params",) + fn(m) + ("bias",), None))
    return out


def _psp_rules(torch_prefix: str, flax_prefix_fn, v2: bool = False):
    """PSP stage/bottleneck rules. v1: bottleneck = [conv3x3, bn, relu, conv1x1];
    v2 (swin): bottleneck = [conv1x1, bn, relu, dropout]."""
    rules = []
    rules += _conv_rules(rf"{torch_prefix}\.stages\.(\d+)\.1",
                         lambda m, f=flax_prefix_fn: f(m) + (f"stages_{m[1]}_conv",), has_bias=False)
    rules += _bn_rules(rf"{torch_prefix}\.stages\.(\d+)\.2",
                       lambda m, f=flax_prefix_fn: f(m) + (f"stages_{m[1]}_bn",))
    rules += _conv_rules(rf"{torch_prefix}\.bottleneck\.0",
                         lambda m, f=flax_prefix_fn: f(m) + ("bottleneck_conv",), has_bias=False)
    rules += _bn_rules(rf"{torch_prefix}\.bottleneck\.1",
                       lambda m, f=flax_prefix_fn: f(m) + ("bottleneck_bn",))
    if not v2:
        rules += _conv_rules(rf"{torch_prefix}\.bottleneck\.3",
                             lambda m, f=flax_prefix_fn: f(m) + ("bottleneck_out",))
    return rules


_SEQ_RULES = []
# pspnet_pop decoder: PSP directly under decoder.
_SEQ_RULES += _psp_rules(r"decoder", lambda m: ("decoder",))
# swin_pop / UperNet_Decoder_Plus: decoder.psp.* (v2), laterals, fpn scale heads
_SEQ_RULES += _psp_rules(r"decoder\.psp", lambda m: ("decoder", "psp"), v2=True)
_SEQ_RULES += _conv_rules(r"decoder\.lateral_convs\.(\d+)\.0", lambda m: ("decoder", f"lateral_{m[1]}_conv"))
_SEQ_RULES += _bn_rules(r"decoder\.lateral_convs\.(\d+)\.1", lambda m: ("decoder", f"lateral_{m[1]}_bn"))
# scale heads: Sequential interleaves [conv-bn-relu] blocks with Upsample; the
# j-th Sequential entry maps to repetition j//2 (Upsamples hold no params)
_SEQ_RULES += _conv_rules(r"decoder\.fpn_convs\.(\d+)\.(\d+)\.0",
                          lambda m: ("decoder", f"fpn_convs_{m[1]}_{int(m[2]) // 2}_conv"))
_SEQ_RULES += _bn_rules(r"decoder\.fpn_convs\.(\d+)\.(\d+)\.1",
                        lambda m: ("decoder", f"fpn_convs_{m[1]}_{int(m[2]) // 2}_bn"))
# lsk_pop SimpleDecoder semantic embedding: Sequential(pool, conv, sigmoid)
_SEQ_RULES += _conv_rules(r"decoder\.semantic_embedding\.1", lambda m: ("decoder", "semantic_conv"), has_bias=False)
# convnext_pop FPN_Seg_OCR_Decoder
_SEQ_RULES += _conv_rules(r"decoder\.conv", lambda m: ("decoder", "conv"))
_SEQ_RULES += _ln_rules(r"decoder\.norm", lambda m: ("decoder", "norm"))
# deeplab _ASPP: decoder.stages.cN.{conv,bn} + decoder.fc
for _name in ("c0", "c1", "c2", "c3", "fc"):
    _tp = rf"decoder\.fc" if _name == "fc" else rf"decoder\.stages\.{_name}"
    _SEQ_RULES += _conv_rules(_tp + r"\.conv", lambda m, n=_name: ("decoder", f"{n}_conv"), has_bias=False)
    _SEQ_RULES += _bn_rules(_tp + r"\.bn", lambda m, n=_name: ("decoder", f"{n}_bn"))
_SEQ_RULES += _conv_rules(r"decoder\.stages\.imagepool\.conv\.conv", lambda m: ("decoder", "imagepool_conv"), has_bias=False)
_SEQ_RULES += _bn_rules(r"decoder\.stages\.imagepool\.conv\.bn", lambda m: ("decoder", "imagepool_bn"))
# POP classifiers: Sequential indices 0/2/4, bias-free 1x1 convs -> w1/w2/w3
_SEQ_RULES += [
    (re.compile(r"^(classifier(?:_n)?)\.0\.weight$"), lambda m: ("params", m[1], "w1"), lambda w: w[:, :, 0, 0].T),
    (re.compile(r"^(classifier(?:_n)?)\.2\.weight$"), lambda m: ("params", m[1], "w2"), lambda w: w[:, :, 0, 0].T),
    (re.compile(r"^(classifier(?:_n)?)\.4\.weight$"), lambda m: ("params", m[1], "w3"), lambda w: w[0, :, 0, 0]),
    # prototype embeddings
    (re.compile(r"^(base_emb|novel_emb)$"), lambda m: ("params", m[1]), None),
]

# --- swin transformer backbone (backbone.*) ---
_SWIN_RULES = []
_SWIN_RULES += _conv_rules(r"backbone\.patch_embed\.proj", lambda m: ("backbone", "patch_embed_proj"))
_SWIN_RULES += _ln_rules(r"backbone\.patch_embed\.norm", lambda m: ("backbone", "patch_embed_norm"))


def _blk(m):
    return ("backbone", f"layers_{m[1]}_blocks_{m[2]}")


_SWIN_RULES += _ln_rules(r"backbone\.layers\.(\d+)\.blocks\.(\d+)\.norm1", lambda m: _blk(m) + ("norm1",))
_SWIN_RULES += _ln_rules(r"backbone\.layers\.(\d+)\.blocks\.(\d+)\.norm2", lambda m: _blk(m) + ("norm2",))
_SWIN_RULES += [(re.compile(r"^backbone\.layers\.(\d+)\.blocks\.(\d+)\.attn\.relative_position_bias_table$"),
                 lambda m: ("params",) + _blk(m) + ("attn", "relative_position_bias_table"), None)]
_SWIN_RULES += _dense_rules(r"backbone\.layers\.(\d+)\.blocks\.(\d+)\.attn\.qkv", lambda m: _blk(m) + ("attn", "qkv"))
_SWIN_RULES += _dense_rules(r"backbone\.layers\.(\d+)\.blocks\.(\d+)\.attn\.proj", lambda m: _blk(m) + ("attn", "proj"))
_SWIN_RULES += _dense_rules(r"backbone\.layers\.(\d+)\.blocks\.(\d+)\.mlp\.fc1", lambda m: _blk(m) + ("mlp_fc1",))
_SWIN_RULES += _dense_rules(r"backbone\.layers\.(\d+)\.blocks\.(\d+)\.mlp\.fc2", lambda m: _blk(m) + ("mlp_fc2",))
_SWIN_RULES += _ln_rules(r"backbone\.layers\.(\d+)\.downsample\.norm", lambda m: ("backbone", f"layers_{m[1]}_downsample", "norm"))
_SWIN_RULES += _dense_rules(r"backbone\.layers\.(\d+)\.downsample\.reduction",
                            lambda m: ("backbone", f"layers_{m[1]}_downsample", "reduction"), has_bias=False)
_SWIN_RULES += _ln_rules(r"backbone\.norm(\d)", lambda m: ("backbone", f"out_norm{m[1]}"))
_SWIN_SKIP = re.compile(r"relative_position_index$")

_SEQ_RULES += _SWIN_RULES

# --- hrnet backbone (backbone.*) — param names mirror models/backbones/hrnet.py ---
_HRNET_RULES = []
for _i, _nm in (("1", "stem1"), ("2", "stem2")):
    _HRNET_RULES += _conv_rules(rf"backbone\.conv{_i}", lambda m, n=_nm: ("backbone", f"{n}_conv"), has_bias=False)
    _HRNET_RULES += _bn_rules(rf"backbone\.bn{_i}", lambda m, n=_nm: ("backbone", f"{n}_bn"))
for _c in ("1", "2", "3"):
    _HRNET_RULES += _conv_rules(rf"backbone\.layer1\.(\d+)\.conv{_c}",
                                lambda m, c=_c: ("backbone", f"layer1_{m[1]}_c{c}_conv"), has_bias=False)
    _HRNET_RULES += _bn_rules(rf"backbone\.layer1\.(\d+)\.bn{_c}",
                              lambda m, c=_c: ("backbone", f"layer1_{m[1]}_c{c}_bn"))
_HRNET_RULES += _conv_rules(r"backbone\.layer1\.(\d+)\.downsample\.0",
                            lambda m: ("backbone", f"layer1_{m[1]}_down_conv"), has_bias=False)
_HRNET_RULES += _bn_rules(r"backbone\.layer1\.(\d+)\.downsample\.1",
                          lambda m: ("backbone", f"layer1_{m[1]}_down_bn"))
# transitions: transition1.{0,1} (branch 1 nested), transition2.2, transition3.3
_HRNET_RULES += _conv_rules(r"backbone\.transition1\.0\.0", lambda m: ("backbone", "transition1_0_0_conv"), has_bias=False)
_HRNET_RULES += _bn_rules(r"backbone\.transition1\.0\.1", lambda m: ("backbone", "transition1_0_0_bn"))
_HRNET_RULES += _conv_rules(r"backbone\.transition1\.1\.0\.0", lambda m: ("backbone", "transition1_1_0_conv"), has_bias=False)
_HRNET_RULES += _bn_rules(r"backbone\.transition1\.1\.0\.1", lambda m: ("backbone", "transition1_1_0_bn"))
_HRNET_RULES += _conv_rules(r"backbone\.transition2\.2\.0\.0", lambda m: ("backbone", "transition2_2_0_conv"), has_bias=False)
_HRNET_RULES += _bn_rules(r"backbone\.transition2\.2\.0\.1", lambda m: ("backbone", "transition2_2_0_bn"))
_HRNET_RULES += _conv_rules(r"backbone\.transition3\.3\.0\.0", lambda m: ("backbone", "transition3_3_0_conv"), has_bias=False)
_HRNET_RULES += _bn_rules(r"backbone\.transition3\.3\.0\.1", lambda m: ("backbone", "transition3_3_0_bn"))
# stage branch blocks (BasicBlock: conv1/bn1/conv2/bn2 [+downsample])
for _c in ("1", "2"):
    _HRNET_RULES += _conv_rules(
        rf"backbone\.stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.conv{_c}",
        lambda m, c=_c: ("backbone", f"stage{m[1]}_{m[2]}_branches_{m[3]}_{m[4]}_c{c}_conv"), has_bias=False)
    _HRNET_RULES += _bn_rules(
        rf"backbone\.stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.bn{_c}",
        lambda m, c=_c: ("backbone", f"stage{m[1]}_{m[2]}_branches_{m[3]}_{m[4]}_c{c}_bn"))
_HRNET_RULES += _conv_rules(
    r"backbone\.stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.downsample\.0",
    lambda m: ("backbone", f"stage{m[1]}_{m[2]}_branches_{m[3]}_{m[4]}_down_conv"), has_bias=False)
_HRNET_RULES += _bn_rules(
    r"backbone\.stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.downsample\.1",
    lambda m: ("backbone", f"stage{m[1]}_{m[2]}_branches_{m[3]}_{m[4]}_down_bn"))
# fuse lattices: j>i -> Seq(conv,bn); j<i -> Seq of Seq(conv,bn[,relu])
_HRNET_RULES += _conv_rules(
    r"backbone\.stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.0",
    lambda m: ("backbone", f"stage{m[1]}_{m[2]}_fuse_{m[3]}_{m[4]}_conv"), has_bias=False)
_HRNET_RULES += _bn_rules(
    r"backbone\.stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.1",
    lambda m: ("backbone", f"stage{m[1]}_{m[2]}_fuse_{m[3]}_{m[4]}_bn"))
_HRNET_RULES += _conv_rules(
    r"backbone\.stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.0",
    lambda m: ("backbone", f"stage{m[1]}_{m[2]}_fuse_{m[3]}_{m[4]}_{m[5]}_conv"), has_bias=False)
_HRNET_RULES += _bn_rules(
    r"backbone\.stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.1",
    lambda m: ("backbone", f"stage{m[1]}_{m[2]}_fuse_{m[3]}_{m[4]}_{m[5]}_bn"))

# --- convnext backbone ---
_CONVNEXT_RULES = []
_CONVNEXT_RULES += _conv_rules(r"backbone\.downsample_layers\.0\.0", lambda m: ("backbone", "downsample_0_conv"))
_CONVNEXT_RULES += _ln_rules(r"backbone\.downsample_layers\.0\.1", lambda m: ("backbone", "downsample_0_norm"))
_CONVNEXT_RULES += _ln_rules(r"backbone\.downsample_layers\.([123])\.0", lambda m: ("backbone", f"downsample_{m[1]}_norm"))
_CONVNEXT_RULES += _conv_rules(r"backbone\.downsample_layers\.([123])\.1", lambda m: ("backbone", f"downsample_{m[1]}_conv"))
_CONVNEXT_RULES += _conv_rules(r"backbone\.stages\.(\d)\.(\d+)\.dwconv", lambda m: ("backbone", f"stages_{m[1]}_{m[2]}", "dwconv"))
_CONVNEXT_RULES += _ln_rules(r"backbone\.stages\.(\d)\.(\d+)\.norm", lambda m: ("backbone", f"stages_{m[1]}_{m[2]}", "norm"))
_CONVNEXT_RULES += _dense_rules(r"backbone\.stages\.(\d)\.(\d+)\.pwconv1", lambda m: ("backbone", f"stages_{m[1]}_{m[2]}", "pwconv1"))
_CONVNEXT_RULES += _dense_rules(r"backbone\.stages\.(\d)\.(\d+)\.pwconv2", lambda m: ("backbone", f"stages_{m[1]}_{m[2]}", "pwconv2"))
_CONVNEXT_RULES += [(re.compile(r"^backbone\.stages\.(\d)\.(\d+)\.gamma$"),
                     lambda m: ("params", "backbone", f"stages_{m[1]}_{m[2]}", "gamma"), None)]

# --- lsknet backbone ---
_LSK_RULES = []
_LSK_RULES += _conv_rules(r"backbone\.patch_embed(\d)\.proj", lambda m: ("backbone", f"patch_embed{m[1]}_proj"))
_LSK_RULES += _bn_rules(r"backbone\.patch_embed(\d)\.norm", lambda m: ("backbone", f"patch_embed{m[1]}_norm"))


def _lsk_blk(m):
    return ("backbone", f"block{m[1]}_{m[2]}")


for _n in ("norm1", "norm2"):
    _LSK_RULES += _bn_rules(rf"backbone\.block(\d)\.(\d+)\.{_n}", lambda m, n=_n: _lsk_blk(m) + (n,))
for _cn in ("proj_1", "proj_2"):
    _LSK_RULES += _conv_rules(rf"backbone\.block(\d)\.(\d+)\.attn\.{_cn}", lambda m, n=_cn: _lsk_blk(m) + ("attn", n))
for _cn in ("conv0", "conv_spatial", "conv1", "conv2", "conv_squeeze", "conv"):
    _LSK_RULES += _conv_rules(
        rf"backbone\.block(\d)\.(\d+)\.attn\.spatial_gating_unit\.{_cn}(?!_)",
        lambda m, n=_cn: _lsk_blk(m) + ("attn", "spatial_gating_unit", n))
_LSK_RULES += _conv_rules(r"backbone\.block(\d)\.(\d+)\.mlp\.fc1", lambda m: _lsk_blk(m) + ("mlp_fc1",))
_LSK_RULES += _conv_rules(r"backbone\.block(\d)\.(\d+)\.mlp\.dwconv\.dwconv", lambda m: _lsk_blk(m) + ("mlp_dwconv",))
_LSK_RULES += _conv_rules(r"backbone\.block(\d)\.(\d+)\.mlp\.fc2", lambda m: _lsk_blk(m) + ("mlp_fc2",))
_LSK_RULES += [(re.compile(r"^backbone\.block(\d)\.(\d+)\.layer_scale_([12])$"),
                lambda m: ("params",) + _lsk_blk(m) + (f"layer_scale_{m[3]}",), None)]
_LSK_RULES += _ln_rules(r"backbone\.norm(\d)", lambda m: ("backbone", f"norm{m[1]}"))

# --- vgg16bn-unet (torch attr is `net`, ours is `backbone`) ---
_VGG_RULES = []
_VGG_SLICES = {  # torch Sequential index -> (flax block, conv idx)
    # nn.Sequential slicing PRESERVES the original module names (keys), so
    # vgg16_bn.features[5:12] yields children named "5".."11" and the conv
    # indices below are the GLOBAL features indices (verified against the
    # real reference state dict in test_vggunet_pop_parity)
    "inc": ("enc1", [0, 3]),
    "down1": ("enc2", [7, 10]),
    "down2": ("enc3", [14, 17, 20]),
    "down3": ("enc4", [24, 27, 30]),
    "down4": ("enc5", [34, 37, 40]),
}
for _seg, (_blk_name, _idxs) in _VGG_SLICES.items():
    for _k, _ti in enumerate(_idxs):
        _VGG_RULES += _conv_rules(rf"net\.{_seg}\.{_ti}", lambda m, b=_blk_name, k=_k: ("backbone", f"{b}_{k}_conv"))
        _VGG_RULES += _bn_rules(rf"net\.{_seg}\.{_ti + 1}", lambda m, b=_blk_name, k=_k: ("backbone", f"{b}_{k}_bn"))
for _u in (1, 2, 3, 4):
    for _dc, _ti in ((0, 0), (1, 3)):
        _VGG_RULES += _conv_rules(rf"net\.up{_u}\.conv\.double_conv\.{_ti}",
                                  lambda m, u=_u, dc=_dc: ("backbone", f"up{u}_dc{dc}_conv"))
        _VGG_RULES += _bn_rules(rf"net\.up{_u}\.conv\.double_conv\.{_ti + 1}",
                                lambda m, u=_u, dc=_dc: ("backbone", f"up{u}_dc{dc}_bn"))

# --- pspplus_pop decoder: decoder.psp.* is the V1 PSPModule (unlike
# swin_pop's decoder.psp which is v2 — the shared-rule default), plus
# reduce (conv1x1+bias, bn) and fc (conv3x3+bias, bn, conv1x1+bias).
# Select via arch="pspplus" (the backbone name alone cannot disambiguate).
_PSPPLUS_RULES = []
_PSPPLUS_RULES += _psp_rules(r"decoder\.psp", lambda m: ("decoder", "psp"))
_PSPPLUS_RULES += _conv_rules(r"decoder\.reduce\.0", lambda m: ("decoder", "reduce_conv"))
_PSPPLUS_RULES += _bn_rules(r"decoder\.reduce\.1", lambda m: ("decoder", "reduce_bn"))
_PSPPLUS_RULES += _conv_rules(r"decoder\.fc\.0", lambda m: ("decoder", "fc_conv"))
_PSPPLUS_RULES += _bn_rules(r"decoder\.fc\.1", lambda m: ("decoder", "fc_bn"))
_PSPPLUS_RULES += _conv_rules(r"decoder\.fc\.3", lambda m: ("decoder", "fc_out"))

_ARCH_RULES = {
    "hrnet": _HRNET_RULES,
    "convnext": _CONVNEXT_RULES,
    "lsknet": _LSK_RULES,
    "vggunet": _VGG_RULES,
    "pspplus": _PSPPLUS_RULES,
}


def arch_for_backbone(backbone: str | None) -> str | None:
    if backbone is None:
        return None
    if backbone.startswith("hr-"):
        return "hrnet"
    if backbone.startswith("convnext"):
        return "convnext"
    if backbone.startswith("lsk"):
        return "lsknet"
    if backbone.startswith("vgg"):
        return "vggunet"
    return None  # resnet/swin handled by the default rule chain


def arch_for(model: str | None, backbone: str | None) -> str | None:
    """Converter rule set for a (model, backbone) pair.  The backbone alone
    cannot disambiguate pspplus_pop (its resnet backbone shares rules with
    pspnet_pop but its decoder.psp is the V1 PSPModule plus reduce/fc heads)
    — the CLIs must route through this, not arch_for_backbone."""
    if model is not None and model.startswith("pspplus"):
        return "pspplus"
    return arch_for_backbone(backbone)


def _resnet_path(key: str):
    """backbone.* torch key -> flax path, for the ResNet family."""
    parts = key.split(".")
    assert parts[0] == "backbone"
    rest = parts[1:]
    # stem: conv1/bn1 (+conv2/bn2/conv3/bn3 for deep stem)
    m = re.match(r"^(conv\d|bn\d)$", rest[0])
    if m and len(rest) == 2:
        mod, leaf = rest
        return _leaf_path(("backbone", mod), mod.startswith("bn"), leaf)
    # layerX.Y.(convZ|bnZ|downsample.{0,1}).leaf
    m = re.match(r"^layer(\d)$", rest[0])
    if m:
        block = f"layer{m[1]}_{rest[1]}"
        sub, leaf = rest[2], rest[-1]
        if sub == "downsample":
            mod = "downsample_conv" if rest[3] == "0" else "downsample_bn"
            return _leaf_path(("backbone", block, mod), mod.endswith("bn"), leaf)
        return _leaf_path(("backbone", block, sub), sub.startswith("bn"), leaf)
    return None


def _leaf_path(prefix: Tuple[str, ...], is_bn: bool, leaf: str):
    if is_bn:
        if leaf == "weight":
            return ("params",) + prefix + ("scale",), None
        if leaf == "bias":
            return ("params",) + prefix + ("bias",), None
        if leaf == "running_mean":
            return ("batch_stats",) + prefix + ("mean",), None
        if leaf == "running_var":
            return ("batch_stats",) + prefix + ("var",), None
        if leaf == "num_batches_tracked":
            return None, None
        raise KeyError(leaf)
    if leaf == "weight":
        return ("params",) + prefix + ("kernel",), _conv_kernel
    if leaf == "bias":
        return ("params",) + prefix + ("bias",), None
    raise KeyError(leaf)


def convert_torch_state_dict(sd: Dict[str, np.ndarray], is_restore: bool = False,
                             backbone_only: bool = False, arch: str | None = None):
    """Returns (variables, unexpected_keys).

    variables = {'params': ..., 'batch_stats': ...} as a nested dict with
    only the leaves present in sd; merge into a model template with
    ``merge_variables``.  ``arch`` selects backbone rules when torch key
    prefixes are ambiguous (hrnet/convnext/lsknet/vggunet); resnet and swin
    resolve from the default chain.
    """
    if is_restore:
        sd = strip_module_prefix(sd)
    if backbone_only:
        sd = {("backbone." + k): v for k, v in sd.items()}

    arch_rules = _ARCH_RULES.get(arch, [])
    # pspplus's arch rules only disambiguate its decoder; its backbone is a
    # plain resnet, so the resnet fallback chain stays active
    use_resnet_paths = arch in (None, "pspplus")

    flat = {}
    unexpected = []
    for key, val in sd.items():
        if key.endswith("num_batches_tracked") or _SWIN_SKIP.search(key):
            continue
        path = None
        transform = None
        for pat, path_fn, tf in arch_rules:
            m = pat.match(key)
            if m:
                path, transform = path_fn(m), tf
                break
        if path is None and use_resnet_paths and key.startswith("backbone."):
            got = _resnet_path(key)
            if got is not None:
                path, transform = got
                if path is None:
                    continue
        if path is None:
            for pat, path_fn, tf in _SEQ_RULES:
                m = pat.match(key)
                if m:
                    path, transform = path_fn(m), tf
                    break
        if path is None:
            unexpected.append(key)
            continue
        flat[path] = transform(val) if transform else np.asarray(val)

    variables = flax.traverse_util.unflatten_dict(flat)
    return variables, unexpected


def merge_variables(template: dict, converted: dict, strict_shapes: bool = True):
    """Non-strict merge (reference load_model strict=False + warnings).
    Returns (variables, missing, loaded)."""
    tflat = flax.traverse_util.flatten_dict(template)
    cflat = flax.traverse_util.flatten_dict(converted)
    out = dict(tflat)
    missing = [p for p in tflat if p not in cflat]
    loaded = []
    for path, leaf in cflat.items():
        if path in out:
            if strict_shapes and out[path].shape != np.asarray(leaf).shape:
                raise ValueError(f"shape mismatch at {path}: {out[path].shape} vs {leaf.shape}")
            out[path] = np.asarray(leaf, dtype=np.asarray(out[path]).dtype)
            loaded.append(path)
    return flax.traverse_util.unflatten_dict(out), missing, loaded


def load_torch_checkpoint(path: str, template: dict, is_restore: bool = False,
                          backbone_only: bool = False, arch: str | None = None):
    """One-call: torch .pth -> merged flax variables (non-strict)."""
    sd = _load_torch(path)
    converted, unexpected = convert_torch_state_dict(sd, is_restore, backbone_only, arch)
    variables, missing, loaded = merge_variables(template, converted)
    return variables, {"missing": missing, "unexpected": unexpected, "loaded": len(loaded)}
