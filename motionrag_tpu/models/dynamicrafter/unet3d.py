"""DynamiCrafter 3D UNet (Flax/NHWC, Pallas attention).

TPU-native re-design of the lvdm UNetModel the reference vendors
(``lvdm/modules/networks/openaimodel3d.py:284-636``, configured at
``configs/dynamicrafter/MotionRAG_open.yml:206-238``): SD-style UNet whose
every level carries ResBlock(+TemporalConv), SpatialTransformer and
TemporalTransformer; context is a dict {prompt, image, action}:

  - text cross-attention (77 OpenCLIP tokens),
  - per-frame image cross-attention branch sharing the text query
    (``attention.py:87-92, 191-204``: to_k_ip/to_v_ip, optional learnable
    tanh-gated scale),
  - Motion-Adapter action branch with its own query from the post-attention
    output (``attention.py:206-220``: to_q_a/to_k_a/to_v_a),
  - frame-stride (fs) embedding added to the time embedding
    (``openaimodel3d.py:602-610``),
  - init temporal attention after conv_in (addition_attention).

Layout: features flow as [(b t), h, w, c]; temporal layers reshape to
[(b h w), t, c] (t = 16 — tiny sequences, XLA attention; spatial attention
at 1024x... tokens goes through the Pallas flash kernel).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionrag_tpu.models.diffusion_blocks import (
    GEGLUFeedForward,
    TemporalConv3,
    TimestepEmbedding,
    Timesteps,
)
from motionrag_tpu.ops.attention import dot_product_attention
from motionrag_tpu.ops.norms import group_norm

__all__ = ["UNet3D"]


class LVDMCrossAttention(nn.Module):
    """Cross-attention with optional image and action branches
    (reference ``lvdm/modules/attention.py:38-223`` efficient_forward)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    image_branch: bool = False
    image_scale: float = 1.0
    image_scale_learnable: bool = False
    action_branch: bool = False
    action_scale: float = 1.0
    action_scale_learnable: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context: Optional[dict] = None):
        inner = self.heads * self.dim_head
        b, l, _ = x.shape
        ctx_dim = self.context_dim or self.query_dim
        self_attn = context is None or "prompt" not in context

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv_src = x if self_attn else context["prompt"]
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(kv_src)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(kv_src)

        def heads_of(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head)

        qh = heads_of(q)
        out = dot_product_attention(qh, heads_of(k), heads_of(v)).reshape(b, l, inner)

        if self.image_branch and context is not None and context.get("image") is not None:
            k_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")(context["image"])
            v_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")(context["image"])
            out_ip = dot_product_attention(qh, heads_of(k_ip), heads_of(v_ip)).reshape(b, l, inner)
            scale = self.image_scale
            if self.image_scale_learnable:
                alpha = self.param("alpha", nn.initializers.zeros, ())
                scale = scale * (jnp.tanh(alpha) + 1.0)
            out = out + scale * out_ip

        if self.action_branch and context is not None and context.get("action") is not None:
            q_a = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q_a")(out)
            k_a = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_a")(context["action"])
            v_a = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_a")(context["action"])
            out_a = dot_product_attention(
                heads_of(q_a), heads_of(k_a), heads_of(v_a)
            ).reshape(b, l, inner)
            scale = self.action_scale
            if self.action_scale_learnable:
                alpha = self.param("alpha_action", nn.initializers.zeros, ())
                scale = scale * (jnp.tanh(alpha) + 1.0)
            out = out + scale * out_a

        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class LVDMTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    image_branch: bool = False
    image_scale_learnable: bool = False
    action_branch: bool = False
    action_scale_learnable: bool = False
    self_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = x + LVDMCrossAttention(
            self.dim, None, self.heads, self.dim_head, dtype=self.dtype, name="attn1"
        )(ln("norm1")(x))
        if not self.self_only:
            x = x + LVDMCrossAttention(
                self.dim, self.context_dim, self.heads, self.dim_head,
                image_branch=self.image_branch,
                image_scale_learnable=self.image_scale_learnable,
                action_branch=self.action_branch,
                action_scale_learnable=self.action_scale_learnable,
                dtype=self.dtype, name="attn2",
            )(ln("norm2")(x), context=context)
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(ln("norm3")(x))
        return x


class SpatialTransformer3D(nn.Module):
    """Per-frame spatial transformer with the context dict
    (reference ``attention.py:269-332``)."""

    channels: int
    heads: int
    dim_head: int
    context_dim: int
    depth: int = 1
    image_branch: bool = False
    image_scale_learnable: bool = False
    action_branch: bool = False
    action_scale_learnable: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        bt, h, w, c = x.shape
        residual = x
        scale = self.param("norm_scale", nn.initializers.ones, (c,))
        bias = self.param("norm_bias", nn.initializers.zeros, (c,))
        hidden = group_norm(x, 32, scale, bias, eps=1e-6).reshape(bt, h * w, c)
        hidden = nn.Dense(c, dtype=self.dtype, name="proj_in")(hidden)
        for i in range(self.depth):
            hidden = LVDMTransformerBlock(
                c, self.heads, self.dim_head, self.context_dim,
                image_branch=self.image_branch,
                image_scale_learnable=self.image_scale_learnable,
                action_branch=self.action_branch,
                action_scale_learnable=self.action_scale_learnable,
                dtype=self.dtype, name=f"blocks_{i}",
            )(hidden, context=context)
        hidden = nn.Dense(c, dtype=self.dtype, name="proj_out")(hidden)
        return hidden.reshape(bt, h, w, c) + residual


class TemporalTransformer3D(nn.Module):
    """Per-pixel temporal transformer (reference ``attention.py:395-445``).

    Parity notes (verified against the vendored lvdm source):
      - hidden runs at ``inner = heads * dim_head`` between proj_in/proj_out
        (``attention.py``: inner_dim projection). For the per-level blocks
        inner == channels; the ``init_attn`` block uses 8 heads x 64 = 512
        over 320 channels.
      - each depth runs attn1 AND attn2 + FF (lvdm BasicTransformerBlock
        ``_forward`` always runs attn2; with only_self_att and no action
        branch its context_dim is None, i.e. a second self-attention).
    """

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        bt, h, w, c = x.shape
        b = bt // num_frames
        inner = self.heads * self.dim_head
        residual = x
        scale = self.param("norm_scale", nn.initializers.ones, (c,))
        bias = self.param("norm_bias", nn.initializers.zeros, (c,))
        # lvdm's temporal GroupNorm runs on [b, c, t, h, w] — statistics
        # reduce over t as well (attention.py:357,398), unlike the per-frame
        # spatial transformer norm
        hidden = group_norm(x.reshape(b, num_frames, h, w, c), 32, scale, bias, eps=1e-6)
        # [b, t, h, w, c] -> [(b h w), t, c]
        hidden = hidden.reshape(b, num_frames, h * w, c).transpose(0, 2, 1, 3)
        hidden = hidden.reshape(b * h * w, num_frames, c)
        hidden = nn.Dense(inner, dtype=self.dtype, name="proj_in")(hidden)
        for i in range(self.depth):
            for attn_name, ln_name in ((f"blocks_{i}_attn1", f"blocks_{i}_norm1"),
                                       (f"blocks_{i}_attn2", f"blocks_{i}_norm2")):
                ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=ln_name)
                attn = LVDMCrossAttention(
                    inner, None, self.heads, self.dim_head, dtype=self.dtype, name=attn_name
                )
                hidden = hidden + attn(ln(hidden))
            ln3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"blocks_{i}_norm3")
            hidden = hidden + GEGLUFeedForward(inner, dtype=self.dtype, name=f"blocks_{i}_ff")(ln3(hidden))
        hidden = nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="proj_out"
        )(hidden)
        hidden = hidden.reshape(b, h * w, num_frames, c).transpose(0, 2, 1, 3)
        return hidden.reshape(bt, h, w, c) + residual


class TemporalConvBlock(nn.Module):
    """Four-stage (3,1,1) temporal conv block with zero-init conv4
    (lvdm TemporalConvBlock, 4x [GN-SiLU-Conv3d] + identity; enabled via
    ``temporal_conv: true``; the reference's modelscope-derived block)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        bt, h, w, c = x.shape
        b = bt // num_frames
        xt = x.reshape(b, num_frames, h, w, c)
        residual = xt
        hid = xt
        for idx in (1, 2, 3, 4):
            s = self.param(f"norm{idx}_scale", nn.initializers.ones, (c,))
            bb = self.param(f"norm{idx}_bias", nn.initializers.zeros, (c,))
            hid = group_norm(hid, 32, s, bb, act="silu")
            # (3,1,1) conv as shifted GEMMs (diffusion_blocks.TemporalConv3):
            # identical params/math, ~matmul-rate instead of the slow XLA
            # 3D-conv lowering (per-block attribution, analyze_dc_blocks.py)
            hid = TemporalConv3(
                c,
                kernel_init=nn.initializers.zeros if idx == 4 else nn.initializers.lecun_normal(),
                dtype=self.dtype, name=f"conv{idx}",
            )(hid)
        return (residual + hid).reshape(bt, h, w, c)


class LVDMResBlock(nn.Module):
    """lvdm ResBlock: GN-SiLU-conv x2 with additive time embedding, optional
    trailing temporal conv block."""

    out_channels: int
    temb_dim: int
    temporal_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, num_frames: int):
        in_ch = x.shape[-1]
        residual = x
        s1 = self.param("norm1_scale", nn.initializers.ones, (in_ch,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (in_ch,))
        h = group_norm(x, 32, s1, b1, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + t[:, None, None, :]
        s2 = self.param("norm2_scale", nn.initializers.ones, (self.out_channels,))
        b2 = self.param("norm2_bias", nn.initializers.zeros, (self.out_channels,))
        h = group_norm(h, 32, s2, b2, act="silu")
        # zero-init out conv (lvdm zero_module(out_layers[-1]))
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros, dtype=self.dtype, name="conv2",
        )(h)
        if in_ch != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(residual)
        h = h + residual
        if self.temporal_conv:
            h = TemporalConvBlock(self.out_channels, dtype=self.dtype, name="temporal")(h, num_frames)
        return h


class _UNetBlockCell(nn.Module):
    """One structurally-uniform UNet unit — optional skip-concat, then
    ResBlock(+temporal conv) [+ SpatialTransformer3D + TemporalTransformer3D]
    — used as the body of the ``scan_blocks`` groups. Submodule names
    (res/spatial/temporal) are the suffixes of the unrolled block names so
    layout conversion is a pure re-stack."""

    out_channels: int
    temb_dim: int
    temporal_conv: bool
    attn: bool
    temporal_attention: bool
    num_head_channels: int
    transformer_depth: int
    context_dim: int
    image_branch: bool
    image_scale_learnable: bool
    action_branch: bool
    action_scale_learnable: bool
    remat: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, hidden, skip, emb, ctx, num_frames):
        if skip is not None:
            hidden = jnp.concatenate([hidden, skip], axis=-1)
        res_cls = (nn.remat(LVDMResBlock, static_argnums=(3,))
                   if self.remat else LVDMResBlock)
        hidden = res_cls(
            self.out_channels, self.temb_dim, self.temporal_conv,
            dtype=self.dtype, name="res",
        )(hidden, emb, num_frames)
        if self.attn:
            heads = self.out_channels // self.num_head_channels
            spatial_cls = (nn.remat(SpatialTransformer3D) if self.remat
                           else SpatialTransformer3D)
            hidden = spatial_cls(
                self.out_channels, heads, self.num_head_channels,
                self.context_dim, self.transformer_depth,
                image_branch=self.image_branch,
                image_scale_learnable=self.image_scale_learnable,
                action_branch=self.action_branch,
                action_scale_learnable=self.action_scale_learnable,
                dtype=self.dtype, name="spatial",
            )(hidden, ctx)
            if self.temporal_attention:
                temporal_cls = (
                    nn.remat(TemporalTransformer3D, static_argnums=(2,))
                    if self.remat else TemporalTransformer3D
                )
                hidden = temporal_cls(
                    self.out_channels, heads, self.num_head_channels,
                    self.transformer_depth, dtype=self.dtype, name="temporal",
                )(hidden, num_frames)
        return hidden


class _DownScanBody(nn.Module):
    """nn.scan body for a down-path group: carry = hidden; per-step output
    ys = the block output (the skip-connection residuals)."""

    cell_kw: dict

    @nn.compact
    def __call__(self, carry, emb, ctx, num_frames):
        h = _UNetBlockCell(**self.cell_kw, name="block")(
            carry, None, emb, ctx, num_frames)
        return h, h


class _UpScanBody(nn.Module):
    """nn.scan body for an up-path group: xs = the stacked skip tensors."""

    cell_kw: dict

    @nn.compact
    def __call__(self, carry, skip, emb, ctx, num_frames):
        h = _UNetBlockCell(**self.cell_kw, name="block")(
            carry, skip, emb, ctx, num_frames)
        return h, None


class UNet3D(nn.Module):
    in_channels: int = 8
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    temporal_conv: bool = True
    temporal_attention: bool = True
    addition_attention: bool = True
    image_cross_attention: bool = True
    image_scale_learnable: bool = False
    action_cross_attention: bool = False
    action_scale_learnable: bool = False
    default_fs: int = 10
    fs_condition: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    # compile each level's run of structurally identical blocks as ONE
    # nn.scan'd cell instead of unrolled copies (at DC-1024 scale: 11 of 22
    # down/up blocks collapse into 5 scan groups — down L0 x2, down L3 x2,
    # up L3 x3, up L2 x2, up L0 x2) — ~35% smaller sampler HLO on top of
    # the lax.map CFG dedup (VERDICT r3 #4: the 502 s cache-cold DC compile).
    # Param layout for grouped blocks becomes input_{L}_blocks/block/...
    # with a leading group axis; stack_block_params converts the unrolled
    # tree (checkpoints/porters adapt via checkpoints.adapt_block_layout).
    scan_blocks: bool = False

    def _groups(self):
        """(down_groups, up_groups): per level, the (start, length) of the
        maximal run of structurally identical blocks (length >= 2), derived
        from channel arithmetic — blocks are identical iff their input
        channel count matches (no skip 1x1, same concat width)."""
        ch0 = self.model_channels
        n = self.num_res_blocks
        chans = [ch0 * m for m in self.channel_mult]
        down_groups, stack = [], [ch0]
        prev = ch0
        for li, ch in enumerate(chans):
            start = 0 if prev == ch else 1
            length = n - start
            down_groups.append((start, length) if length >= 2 else None)
            stack.extend([ch] * n)
            if li != len(chans) - 1:
                stack.append(ch)
            prev = ch
        up_groups = []
        prev = chans[-1]
        for li in reversed(range(len(chans))):
            ch = chans[li]
            keys = []
            for i in range(n + 1):
                skip_ch = stack.pop()
                # identical structure = same hidden width (scan carry shape)
                # AND same skip width (concat width / res param shapes)
                keys.append((prev if i == 0 else ch, skip_ch))
            # maximal run of equal keys (at most one run >= 2 for any
            # channel_mult; verified by the scan-vs-loop parity tests)
            best = None
            s = 0
            while s <= n:
                e = s
                while e + 1 <= n and keys[e + 1] == keys[s]:
                    e += 1
                if e - s + 1 >= 2 and (best is None or e - s > best[1] - best[0]):
                    best = (s, e)
                s = e + 1
            up_groups.append(
                (best[0], best[1] - best[0] + 1) if best else None
            )
            prev = ch
        return down_groups, up_groups

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: dict,
        fs: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [b, t, h, w, in_ch]; context: {prompt [b,77,C], image [b,t*l,C],
        action [b,la,C]}; returns [b, t, h, w, out_ch]."""
        b, t, h, w, _ = x.shape
        ch0 = self.model_channels
        temb_dim = ch0 * 4

        t_emb = Timesteps(ch0, flip_sin_to_cos=True)(
            jnp.broadcast_to(jnp.asarray(timesteps), (b,))
        ).astype(self.dtype)
        emb = TimestepEmbedding(temb_dim, dtype=self.dtype, name="time_embed")(t_emb)
        if self.fs_condition:
            if fs is None:
                fs = jnp.full((b,), self.default_fs, jnp.float32)
            fs_emb = Timesteps(ch0, flip_sin_to_cos=True)(
                jnp.broadcast_to(jnp.asarray(fs), (b,))
            ).astype(self.dtype)
            emb = emb + TimestepEmbedding(temb_dim, dtype=self.dtype, name="fps_embedding")(fs_emb)
        emb = jnp.repeat(emb, t, axis=0)  # [(b t), temb]

        # per-frame context dict (reference openaimodel3d.py:586-594)
        ctx = {}
        if context.get("prompt") is not None:
            ctx["prompt"] = jnp.repeat(context["prompt"], t, axis=0)
        if context.get("image") is not None:
            img = context["image"]
            li = img.shape[1] // t
            ctx["image"] = img.reshape(b * t, li, img.shape[-1])
        if context.get("action") is not None:
            act = context["action"]
            r = (b * t) // act.shape[0]
            ctx["action"] = jnp.repeat(act, r, axis=0)

        xf = x.reshape(b * t, h, w, x.shape[-1])

        # gradient checkpointing must also cover the resblocks: their
        # 4-stage TemporalConvBlock keeps fp32 GroupNorm/tap intermediates
        # at full L0 resolution, and leaving them out of remat was the bulk
        # of the measured 29.5 GB adapter-train OOM on 16 GB
        # (.bench_logs/train_dc_r4b.err — f32 [*,40,64,320/640] temps)
        res_cls = (nn.remat(LVDMResBlock, static_argnums=(3,))
                   if self.remat else LVDMResBlock)

        def res(out_ch, name):
            return res_cls(
                out_ch, temb_dim, self.temporal_conv, dtype=self.dtype, name=name
            )

        # gradient checkpointing over the transformer blocks (reference
        # use_checkpoint: true in the shipped configs)
        spatial_cls = nn.remat(SpatialTransformer3D) if self.remat else SpatialTransformer3D
        temporal_cls = (
            nn.remat(TemporalTransformer3D, static_argnums=(2,))
            if self.remat else TemporalTransformer3D
        )

        def spatial(ch, name):
            heads = ch // self.num_head_channels
            return spatial_cls(
                ch, heads, self.num_head_channels, self.context_dim,
                self.transformer_depth,
                image_branch=self.image_cross_attention,
                image_scale_learnable=self.image_scale_learnable,
                action_branch=self.action_cross_attention,
                action_scale_learnable=self.action_scale_learnable,
                dtype=self.dtype, name=name,
            )

        def temporal(ch, name):
            heads = ch // self.num_head_channels
            return temporal_cls(
                ch, heads, self.num_head_channels, self.transformer_depth,
                dtype=self.dtype, name=name,
            )

        hidden = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(xf)
        if self.addition_attention:
            hidden = TemporalTransformer3D(
                ch0, 8, self.num_head_channels, 1, dtype=self.dtype, name="init_attn"
            )(hidden, t)
        residuals = [hidden]
        ds = 1
        down_groups, up_groups = (
            self._groups() if self.scan_blocks
            else ([None] * len(self.channel_mult),) * 2
        )

        def cell_kw(ch, attn):
            return dict(
                out_channels=ch, temb_dim=temb_dim,
                temporal_conv=self.temporal_conv, attn=attn,
                temporal_attention=self.temporal_attention,
                num_head_channels=self.num_head_channels,
                transformer_depth=self.transformer_depth,
                context_dim=self.context_dim,
                image_branch=self.image_cross_attention,
                image_scale_learnable=self.image_scale_learnable,
                action_branch=self.action_cross_attention,
                action_scale_learnable=self.action_scale_learnable,
                remat=self.remat, dtype=self.dtype,
            )

        bcast3 = (nn.broadcast, nn.broadcast, nn.broadcast)

        # down path
        for level, mult in enumerate(self.channel_mult):
            ch = ch0 * mult
            grp = down_groups[level]
            i = 0
            while i < self.num_res_blocks:
                if grp is not None and i == grp[0]:
                    scan = nn.scan(
                        _DownScanBody, variable_axes={"params": 0},
                        split_rngs={"params": True}, in_axes=bcast3,
                        out_axes=0, length=grp[1],
                    )(cell_kw(ch, ds in self.attention_resolutions),
                      name=f"input_{level}_blocks")
                    hidden, resid = scan(hidden, emb, ctx, t)
                    residuals.extend(resid[j] for j in range(grp[1]))
                    i += grp[1]
                    continue
                hidden = res(ch, f"input_{level}_{i}_res")(hidden, emb, t)
                if ds in self.attention_resolutions:
                    hidden = spatial(ch, f"input_{level}_{i}_spatial")(hidden, ctx)
                    if self.temporal_attention:
                        hidden = temporal(ch, f"input_{level}_{i}_temporal")(hidden, t)
                residuals.append(hidden)
                i += 1
            if level != len(self.channel_mult) - 1:
                # lvdm Downsample is stride-2 conv with SYMMETRIC padding=1
                # (openaimodel3d.py:61-71) — unlike the diffusers-VAE (0,1)
                # convention
                hidden = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"input_{level}_down",
                )(hidden)
                residuals.append(hidden)
                ds *= 2

        # mid
        ch = ch0 * self.channel_mult[-1]
        hidden = res(ch, "middle_res_0")(hidden, emb, t)
        hidden = spatial(ch, "middle_spatial")(hidden, ctx)
        if self.temporal_attention:
            hidden = temporal(ch, "middle_temporal")(hidden, t)
        hidden = res(ch, "middle_res_1")(hidden, emb, t)

        # up path
        for gi, (level, mult) in enumerate(reversed(list(enumerate(self.channel_mult)))):
            ch = ch0 * mult
            grp = up_groups[gi] if self.scan_blocks else None
            i = 0
            while i < self.num_res_blocks + 1:
                if grp is not None and i == grp[0]:
                    skips = jnp.stack([residuals.pop() for _ in range(grp[1])])
                    scan = nn.scan(
                        _UpScanBody, variable_axes={"params": 0},
                        split_rngs={"params": True},
                        in_axes=(0,) + bcast3, out_axes=0, length=grp[1],
                    )(cell_kw(ch, ds in self.attention_resolutions),
                      name=f"output_{level}_blocks")
                    hidden, _ = scan(hidden, skips, emb, ctx, t)
                    i += grp[1]
                else:
                    skip = residuals.pop()
                    hidden = jnp.concatenate([hidden, skip], axis=-1)
                    hidden = res(ch, f"output_{level}_{i}_res")(hidden, emb, t)
                    if ds in self.attention_resolutions:
                        hidden = spatial(ch, f"output_{level}_{i}_spatial")(hidden, ctx)
                        if self.temporal_attention:
                            hidden = temporal(ch, f"output_{level}_{i}_temporal")(hidden, t)
                    i += 1
                if i == self.num_res_blocks + 1 and level:
                    from motionrag_tpu.models.diffusion_blocks import nearest_upsample_2x

                    hidden = nearest_upsample_2x(hidden)
                    hidden = nn.Conv(
                        ch, (3, 3), padding=1, dtype=self.dtype, name=f"output_{level}_up"
                    )(hidden)
                    ds //= 2

        s = self.param("out_norm_scale", nn.initializers.ones, (hidden.shape[-1],))
        bb = self.param("out_norm_bias", nn.initializers.zeros, (hidden.shape[-1],))
        hidden = group_norm(hidden, 32, s, bb, act="silu")
        hidden = nn.Conv(
            self.out_channels, (3, 3), padding=1, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_out",
        )(hidden)
        return hidden.reshape(b, t, h, w, self.out_channels)
