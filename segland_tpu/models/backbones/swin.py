"""Swin Transformer backbone (T/S/B/L), TPU-native flax.

Behavioral match for reference networks/backbones/swintransformer.py:436-651:
4x4 patch embed + LN, 4 stages of shifted 7x7-window attention with relative
position bias, PatchMerging between stages, per-stage output LayerNorm,
4-level pyramid output.

TPU-first deltas: NHWC layout end-to-end, window partition as
reshape/transpose (XLA fuses), attention as einsum on the MXU, and the
shifted-window attention mask computed in *numpy at trace time* (H/W are
static under jit) instead of on-device tensor surgery
(reference swintransformer.py:360-379).
"""

import os
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .droppath import DropPath, drop_path_rates

_CONFIGS = {
    "swin-t": dict(depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), embed_dim=96),
    "swin-s": dict(depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), embed_dim=96),
    "swin-b": dict(depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), embed_dim=128),
    "swin-l": dict(depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), embed_dim=192),
}


def _rel_pos_index(ws: int) -> np.ndarray:
    """Static relative-position index table (reference swin :97-108)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [ws*ws, ws*ws]


def _shift_regions(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Static per-window SW-MSA region ids [nW, ws*ws] (reference swin
    :360-374): tokens attend only within equal-id regions."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    return (img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
            .reshape(-1, ws * ws).astype(np.float32))


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask [nW, ws*ws, ws*ws] of {0, -100}
    (reference swin :360-379), computed in numpy at trace time."""
    win = _shift_regions(hp, wp, ws, shift)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x, ws):
    """[B,Hp,Wp,C] -> [B*nW, ws*ws, C]"""
    b, hp, wp, c = x.shape
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(x, ws, b, hp, wp):
    c = x.shape[-1]
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, c)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None):
        """x: [B_, N, C]; mask: static numpy [nW, N, N] or None."""
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        ws = self.window_size
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype, name="qkv")(x)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh),
        )
        idx = _rel_pos_index(ws).reshape(-1)
        bias = table[idx].reshape(n, n, nh).transpose(2, 0, 1)  # [nh,N,N]

        if self.use_pallas:
            from ...ops.pallas_attn import window_attention_fused

            # bf16 bias halves the VMEM block (mask values -100/0 and the
            # small rel-pos biases are exactly representable enough; softmax
            # itself stays fp32 in the kernel)
            if mask is None:
                bias_arr = bias[None].astype(jnp.bfloat16)  # [1,nh,N,N]
            else:
                bias_arr = (bias[None].astype(jnp.float32)
                            + jnp.asarray(mask, jnp.float32)[:, None]).astype(jnp.bfloat16)
            out = window_attention_fused(qkv, bias_arr, nh)
        else:
            q3 = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = q3[0], q3[1], q3[2]  # [B_, nh, N, hd]
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k)
            attn = attn + bias[None].astype(attn.dtype)
            if mask is not None:
                nw = mask.shape[0]
                m = jnp.asarray(mask, attn.dtype)
                attn = attn.reshape(b_ // nw, nw, nh, n, n) + m[None, :, None]
                attn = attn.reshape(b_, nh, n, n)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class AttnParams(nn.Module):
    """Param tree of WindowAttention without running it (fused-attn path):
    {qkv:{kernel,bias}, proj:{kernel,bias}, relative_position_bias_table}."""
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self):
        from .fused import DenseParams

        wqkv, bqkv = DenseParams(self.dim, 3 * self.dim, name="qkv")()
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) * (2 * self.window_size - 1), self.num_heads),
        )
        wproj, bproj = DenseParams(self.dim, self.dim, name="proj")()
        return wqkv, bqkv, wproj, bproj, table


def _pad_token_mask(h, w, hp, wp, ws, shift) -> np.ndarray:
    """Static per-window valid-token mask [nW or 1, ws*ws] (1=real, 0=pad)."""
    if hp == h and wp == w:
        return np.ones((1, ws * ws), np.float32)
    valid = np.zeros((hp, wp), np.float32)
    valid[:h, :w] = 1.0
    if shift > 0:
        valid = np.roll(valid, (-shift, -shift), axis=(0, 1))
    win = valid.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    return win.reshape(-1, ws * ws)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    use_pallas: bool = False
    fused_mlp: bool = False
    fused_attn: bool = False
    # Super-window grouping for the fused attention section: fuse this many
    # windows into one kernel window via a block-diagonal bias (exact; see
    # ops/pallas_attn.py).  Turns the N=49/hd=32 per-head dots — far below
    # the 128-lane MXU tile — into full-tile matmuls at group-x the (small)
    # score/ctx FLOPs.  A v1-kernel knob: setting it != 1 routes the block
    # to the v1 kernel (the default v2/geom kernel uses attn_hg instead).
    attn_group: int = 1
    # Head-group size for the round-4 v2 fused attention kernel (None =
    # measured default per num_heads; ops/pallas_attn._v2_hg_default)
    attn_hg: Any = None
    # Round-5 whole-block kernel (ops/pallas_attn.swin_block_fused):
    # attention section + MLP in ONE Pallas call, halving the slow
    # Pallas-DMA round trips on the block activations.  Engages only with
    # fused_attn + fused_mlp + attn_group==1 and no active DropPath (the
    # two-branch stochastic-depth recovery needs the intermediate).
    fused_block: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, win_shape=None):
        """x: [B,H,W,C] NHWC (H,W static).  Stochastic depth applied to both
        residual branches when train=True (reference swintransformer.py:169,186
        via timm DropPath, rate from the linspace decay over all blocks).

        Window-resident fast path (eval serving): when ``win_shape=(b,h,w,
        hp,wp)`` is given, ``x`` is ALREADY window-partitioned
        ``[B*nW, ws*ws, C]`` on the padded UNSHIFTED domain and the block
        returns the same layout.  Every op here is token-local except
        attention, so W-MSA blocks run with ZERO layout permutes (the
        canonical window layout IS their attention layout) and SW-MSA blocks
        with exactly two composite windowed->windowed permutations
        (reverse.roll.partition) — vs the spatial path's per-block
        pad/roll/partition/reverse/unroll/unpad round trip, which chained at
        2.7/2.6/1.8 ms per block pair at stages 0-2 (~25% of swin_pop,
        benchmarks/swin_glue_probe.py).  Pad tokens ride through the MLP
        (masked in attention by mask_tok) and are dropped at stage exit."""
        if win_shape is not None:
            return self._win_resident(x, win_shape)
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        dp = self.drop_path > 0.0 and train
        dp1 = DropPath(self.drop_path, name="drop_path1")
        dp2 = DropPath(self.drop_path, name="drop_path2")
        pad_b = (-h) % ws
        pad_r = (-w) % ws
        hp, wp = h + pad_b, w + pad_r

        if self.fused_attn:
            from ...ops.pallas_attn import swin_attn_section_fused
            from .fused import LNParams

            g_ln, b_ln = LNParams(c, name="norm1")()
            wqkv, bqkv, wproj, bproj, table = AttnParams(
                self.dim, self.num_heads, ws, name="attn")()
            n = ws * ws
            idx = _rel_pos_index(ws).reshape(-1)
            bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
            bias_dt = jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32
            bias_arr = bias[None].astype(bias_dt)  # rel-pos only [1,nh,N,N]
            regions = (jnp.asarray(_shift_regions(hp, wp, ws, self.shift_size))
                       if self.shift_size > 0 else None)
            mask_tok = jnp.asarray(
                _pad_token_mask(h, w, hp, wp, ws, self.shift_size))

            use_block = (self.fused_block and self.fused_mlp
                         and self.attn_group == 1 and not dp)
            if pad_b or pad_r:
                x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            if self.shift_size > 0:
                x = jnp.roll(x, (-self.shift_size, -self.shift_size), axis=(1, 2))
            wins = _window_partition(x, ws)
            if use_block:
                from ...ops.pallas_attn import swin_block_fused
                from .fused import DenseParams

                gamma2, beta2 = LNParams(c, name="norm2")()
                hid = int(c * self.mlp_ratio)
                w1, b1 = DenseParams(c, hid, name="mlp_fc1")()
                w2, b2 = DenseParams(hid, c, name="mlp_fc2")()
                wins = swin_block_fused(
                    wins, mask_tok, g_ln, b_ln, wqkv, bqkv, wproj, bproj,
                    bias_arr, gamma2, beta2, w1, b1, w2, b2,
                    self.num_heads, eps=1e-5, regions=regions,
                    geom=(h, w, hp, wp, ws, self.shift_size),
                    hg=self.attn_hg)
            else:
                wins = swin_attn_section_fused(
                    wins, mask_tok, g_ln, b_ln, wqkv, bqkv, wproj, bproj,
                    bias_arr, self.num_heads, eps=1e-5, regions=regions,
                    group=self.attn_group,
                    geom=((h, w, hp, wp, ws, self.shift_size)
                          if self.attn_group == 1 else None),
                    hg=self.attn_hg)
            x = _window_reverse(wins, ws, b, hp, wp)
            if self.shift_size > 0:
                x = jnp.roll(x, (self.shift_size, self.shift_size), axis=(1, 2))
            if pad_b or pad_r:
                x = x[:, :h, :w, :]
            if use_block:
                return x  # whole block (attn + MLP) done in one kernel
            # residual was added inside the kernel (on the padded/rolled
            # domain, where it commutes with reverse/unroll/unpad); recover
            # the branch for stochastic depth as (out - shortcut)
            if dp:
                x = shortcut + dp1(x - shortcut, train)
        else:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
            if pad_b or pad_r:
                x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

            if self.shift_size > 0:
                x = jnp.roll(x, (-self.shift_size, -self.shift_size), axis=(1, 2))
                mask = _shift_attn_mask(hp, wp, ws, self.shift_size)
            else:
                mask = None
            wins = _window_partition(x, ws)
            wins = WindowAttention(self.dim, self.num_heads, ws, self.use_pallas, self.dtype, name="attn")(wins, mask)
            x = _window_reverse(wins, ws, b, hp, wp)
            if self.shift_size > 0:
                x = jnp.roll(x, (self.shift_size, self.shift_size), axis=(1, 2))
            if pad_b or pad_r:
                x = x[:, :h, :w, :]

            x = shortcut + (dp1(x, train) if dp else x)
        hidden = int(c * self.mlp_ratio)
        if self.fused_mlp:
            from ...ops.pallas_mlp import fused_ln_mlp
            from .fused import DenseParams, LNParams

            gamma, beta = LNParams(c, name="norm2")()
            w1, b1 = DenseParams(c, hidden, name="mlp_fc1")()
            w2, b2 = DenseParams(hidden, c, name="mlp_fc2")()
            out = fused_ln_mlp(x, gamma, beta, w1, b1, w2, b2, eps=1e-5)
            return x + dp2(out - x, train) if dp else out
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + (dp2(y, train) if dp else y)


    def _win_resident(self, wins, win_shape):
        """Eval-only window-resident block body (see __call__ docstring).
        Requires fused_attn and fused_mlp; param tree is IDENTICAL to the
        fused spatial path (same submodule names), so checkpoints and the
        torch converter are unaffected."""
        from ...ops.pallas_attn import swin_attn_section_fused
        from ...ops.pallas_mlp import fused_ln_mlp
        from .fused import DenseParams, LNParams

        b, h, w, hp, wp = win_shape
        ws = self.window_size
        c = self.dim
        n = ws * ws
        s = self.shift_size

        g_ln, b_ln = LNParams(c, name="norm1")()
        wqkv, bqkv, wproj, bproj, table = AttnParams(
            self.dim, self.num_heads, ws, name="attn")()
        idx = _rel_pos_index(ws).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        bias_dt = jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32
        bias_arr = bias[None].astype(bias_dt)
        regions = (jnp.asarray(_shift_regions(hp, wp, ws, s))
                   if s > 0 else None)
        mask_tok = jnp.asarray(_pad_token_mask(h, w, hp, wp, ws, s))

        if s > 0:  # canonical (unshifted) windows -> shifted windows
            x = _window_reverse(wins, ws, b, hp, wp)
            x = jnp.roll(x, (-s, -s), axis=(1, 2))
            wins = _window_partition(x, ws)
        wins = swin_attn_section_fused(
            wins, mask_tok, g_ln, b_ln, wqkv, bqkv, wproj, bproj,
            bias_arr, self.num_heads, eps=1e-5, regions=regions,
            group=self.attn_group,
            geom=((h, w, hp, wp, ws, s) if self.attn_group == 1 else None),
            hg=self.attn_hg)

        gamma, beta = LNParams(c, name="norm2")()
        w1, b1 = DenseParams(c, int(c * self.mlp_ratio), name="mlp_fc1")()
        w2, b2 = DenseParams(int(c * self.mlp_ratio), c, name="mlp_fc2")()
        out = fused_ln_mlp(wins, gamma, beta, w1, b1, w2, b2, eps=1e-5)

        if s > 0:  # back to canonical windows for the next block
            x = _window_reverse(out, ws, b, hp, wp)
            x = jnp.roll(x, (s, s), axis=(1, 2))
            out = _window_partition(x, ws)
        return out


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    embed_dim: int = 96
    window_size: int = 7
    patch_size: int = 4
    drop_path_rate: float = 0.2  # reference swintransformer.py:478 default
    use_pallas: bool = False
    fused_mlp: bool = False
    fused_attn: bool = False
    # Stages where fused_attn engages (None = all).  Early stages have many
    # tiny windows whose per-window matmuls under-fill the MXU; per-stage
    # gating lets the measured winner run at each resolution.  Param trees
    # are identical either way, so this is a pure dispatch decision.
    fused_attn_stages: Any = None
    # Stages where the round-5 whole-block (attn+MLP single-kernel) path
    # engages (None = none).  Requires fused_attn + fused_mlp at that stage;
    # eval-only per block (DropPath falls back).  Param trees identical.
    fused_block_stages: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B,H,W,3] -> 4-level pyramid FINE->COARSE NHWC (stage0..3),
        matching the reference backbone output order (swintransformer.py:638-650)."""
        ps = self.patch_size
        h, w = x.shape[1], x.shape[2]
        if h % ps or w % ps:
            x = jnp.pad(x, ((0, 0), (0, (-h) % ps), (0, (-w) % ps), (0, 0)))
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps), dtype=self.dtype,
                    name="patch_embed_proj")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_embed_norm")(x)

        outs = []
        dpr = drop_path_rates(self.drop_path_rate, self.depths)
        cur = 0
        for i, depth in enumerate(self.depths):
            dim = int(self.embed_dim * 2 ** i)
            fa = self.fused_attn and (self.fused_attn_stages is None
                                      or i in self.fused_attn_stages)
            # Window-resident serving (partition ONCE per stage, MLP in
            # window layout, SW-MSA-only permutes): exact
            # (test_swin_window_resident_eval_matches_unfused) but MEASURED
            # SLOWER on-chip — swin-s b16 1024^2 serving 86.1 -> 67.2 t/s
            # (benchmarks/swin_serve_ab.py).  Two causes, decomposed by
            # benchmarks/swin_glue_probe.py: (1) the windowed->windowed
            # composite permutation is only ~20% cheaper than the full
            # spatial round trip (4.25 vs 5.47 ms at stage0; the ws=7
            # strided transposes dominate, not the pad/roll bookkeeping),
            # and (2) the MLP's (B*nW,49,C)->(m,C) collapse is
            # sublane-misaligned (49 % 8 != 0), forcing a physical relayout
            # per block that the spatial path's free (B,H,W,C)->(BHW,C)
            # bitcast avoids.  Kept as an opt-in knob (SEGLAND_SWIN_WR=1,
            # trace-time) for future layouts; default OFF.
            import os as _os

            wr = (fa and self.fused_mlp and not train
                  and _os.environ.get("SEGLAND_SWIN_WR", "0") == "1")
            if wr:
                ws = self.window_size
                bh, hh, ww = x.shape[0], x.shape[1], x.shape[2]
                hp, wp = hh + (-hh) % ws, ww + (-ww) % ws
                if hp != hh or wp != ww:
                    x = jnp.pad(x, ((0, 0), (0, hp - hh), (0, wp - ww), (0, 0)))
                wins = _window_partition(x, ws)
                for j in range(depth):
                    wins = SwinBlock(
                        dim, self.num_heads[i], ws,
                        shift_size=0 if j % 2 == 0 else ws // 2,
                        drop_path=dpr[cur + j],
                        use_pallas=self.use_pallas, fused_mlp=self.fused_mlp,
                        fused_attn=fa,
                        dtype=self.dtype, name=f"layers_{i}_blocks_{j}",
                    )(wins, train=train, win_shape=(bh, hh, ww, hp, wp))
                x = _window_reverse(wins, ws, bh, hp, wp)[:, :hh, :ww, :]
            else:
                fb = (fa and self.fused_mlp
                      and self.fused_block_stages is not None
                      and i in self.fused_block_stages)
                for j in range(depth):
                    x = SwinBlock(
                        dim, self.num_heads[i], self.window_size,
                        shift_size=0 if j % 2 == 0 else self.window_size // 2,
                        drop_path=dpr[cur + j],
                        use_pallas=self.use_pallas, fused_mlp=self.fused_mlp,
                        fused_attn=fa, fused_block=fb,
                        dtype=self.dtype, name=f"layers_{i}_blocks_{j}",
                    )(x, train=train)
            cur += depth
            out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{i}")(x)
            outs.append(out)
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"layers_{i}_downsample")(x)
        return outs  # fine->coarse [stage0..stage3]


def get_swin(name: str, dtype=jnp.float32, use_pallas: bool = False,
             fused_mlp: bool = False, fused_attn: bool = False,
             fused_attn_stages="auto",
             fused_block_stages="auto") -> SwinTransformer:
    cfg = _CONFIGS[name]
    if fused_block_stages == "auto":
        # A/B override for on-chip measurement (trace-time): "all", "none",
        # or a comma list like "0,1,2".  Default pending the round-5 A/B.
        env = os.environ.get("SEGLAND_SWIN_V3_STAGES", "")
        if env == "all":
            fused_block_stages = (0, 1, 2, 3)
        elif env in ("", "none"):
            fused_block_stages = None
        else:
            fused_block_stages = tuple(int(s) for s in env.split(","))
    if fused_attn_stages == "auto":
        # Per-stage gating by measurement.  v1 kernel (rounds 1-3): fused
        # won 1.55x/1.7x/1.53x at stages 0-2 but LOST at stage 3 (6.97 vs
        # 5.93 ms/2 blocks b8, benchmarks/swin_stage_variants.py).  The
        # round-4 v2 kernel flips stage 3 decisively: its [NW,N,1]
        # mask/region DMA — proportionally worst at stage 3's tiny window
        # count — is gone, measuring 0.96 ms/pair at b16
        # (benchmarks/swin_attn_hg.py stage3) vs ~11.9 for the XLA path.
        fused_attn_stages = (0, 1, 2, 3)
    return SwinTransformer(dtype=dtype, use_pallas=use_pallas, fused_mlp=fused_mlp,
                           fused_attn=fused_attn,
                           fused_attn_stages=fused_attn_stages,
                           fused_block_stages=fused_block_stages, **cfg)
