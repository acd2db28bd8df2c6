"""SVD UNet-spatio-temporal (Flax/NHWC, Pallas attention).

TPU-native re-design of the denoiser behind the reference's
``StableVideoDiffusionPipeline`` (reference ``svd/module.py:37-47``; the
torch implementation lives in diffusers' UNetSpatioTemporalConditionModel).
Structure: per-frame spatial ResNet+transformer blocks alpha-blended with
temporal ResNet/attention mixing blocks, conditioned on a CLIP image token
and (fps, motion bucket, noise-aug) time ids.

Motion-Adapter injection: every *spatial* transformer block's cross-attention
can carry the extra action branch (reference adapter list
``configs/svd/MotionRAG_open.yml:115-131`` — all 16 attn2 sites). Sites are
addressed with the reference's dotted names
(``down_blocks.0.attentions.0.transformer_blocks.0.attn2.processor``) so
configs port verbatim.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from motionrag_tpu.models.diffusion_blocks import (
    AlphaBlender,
    BasicTransformerBlock,
    Downsample2D,
    SpatioTemporalResBlock,
    TemporalBasicTransformerBlock,
    TimestepEmbedding,
    Timesteps,
    Upsample2D,
)
from motionrag_tpu.ops.norms import group_norm

__all__ = ["UNetSpatioTemporal", "SVD_ADAPTER_SITES"]

SVD_ADAPTER_SITES = tuple(
    [f"down_blocks.{i}.attentions.{j}.transformer_blocks.0.attn2.processor"
     for i in range(3) for j in range(2)]
    + [f"up_blocks.{i}.attentions.{j}.transformer_blocks.0.attn2.processor"
       for i in (1, 2, 3) for j in range(3)]
    + ["mid_block.attentions.0.transformer_blocks.0.attn2.processor"]
)


class TransformerSpatioTemporal(nn.Module):
    """GroupNorm -> proj_in -> [spatial block | temporal block mixed] ->
    proj_out + residual."""

    channels: int
    heads: int
    context_dim: int
    num_layers: int = 1
    with_adapter: bool = False
    adapter_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, num_frames: int, action_emb=None):
        # x: [(b f), h, w, c]; context: [(b f), n_ctx, context_dim]
        bf, h, w, c = x.shape
        b = bf // num_frames
        dim_head = c // self.heads
        residual = x

        scale = self.param("norm_scale", nn.initializers.ones, (c,))
        bias = self.param("norm_bias", nn.initializers.zeros, (c,))
        hidden = group_norm(x, 32, scale, bias, eps=1e-6)
        hidden = hidden.reshape(bf, h * w, c)
        hidden = nn.Dense(c, dtype=self.dtype, name="proj_in")(hidden)

        # frame-position embedding for the temporal mixing block
        t_ids = jnp.arange(num_frames, dtype=jnp.float32)
        t_emb = Timesteps(c, flip_sin_to_cos=True)(t_ids)
        t_emb = TimestepEmbedding(
            c, inner_dim=4 * c, dtype=self.dtype, name="time_pos_embed"
        )(t_emb.astype(self.dtype))  # [f, c]

        # temporal cross-attn context: first frame's context per batch elem
        time_context = context.reshape(b, num_frames, *context.shape[1:])[:, 0]

        for i in range(self.num_layers):
            hidden = BasicTransformerBlock(
                c, self.heads, dim_head, self.context_dim,
                with_adapter=self.with_adapter, adapter_scale=self.adapter_scale,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(hidden, context=context, action_emb=action_emb)

            # [(b f), hw, c] -> [(b hw), f, c]
            mix = hidden.reshape(b, num_frames, h * w, c).transpose(0, 2, 1, 3)
            mix = mix.reshape(b * h * w, num_frames, c)
            mix = mix + t_emb[None, :, :]
            tc = jnp.repeat(time_context, h * w, axis=0)
            mix = TemporalBasicTransformerBlock(
                c, c, self.heads, dim_head, self.context_dim,
                dtype=self.dtype, name=f"temporal_transformer_blocks_{i}",
            )(mix, num_frames, context=tc)
            mix = mix.reshape(b, h * w, num_frames, c).transpose(0, 2, 1, 3)
            mix = mix.reshape(bf, h * w, c)
            hidden = AlphaBlender(name=f"time_mixer_{i}")(hidden, mix)

        hidden = nn.Dense(c, dtype=self.dtype, name="proj_out")(hidden)
        return hidden.reshape(bf, h, w, c) + residual


class UNetSpatioTemporal(nn.Module):
    """The SVD denoiser. Inputs NHWC: sample [b, f, h, w, in_channels]."""

    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    num_attention_heads: Sequence[int] = (5, 10, 20, 20)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    adapter_sites: Sequence[str] = ()
    adapter_scale: float = 1.0
    # gradient checkpointing over the attention transformers (reference
    # gradient_checkpointing / use_checkpoint parity; jax.checkpoint trades
    # recompute for activation memory)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def _transformer_cls(self):
        if not self.remat:
            return TransformerSpatioTemporal
        # num_frames (3rd call arg) must stay static under jax.checkpoint
        return nn.remat(TransformerSpatioTemporal, static_argnums=(3,))

    def _res_cls(self):
        """remat covers the resblocks too — the reference UNet checkpoints
        ResBlocks AND transformers (same lesson as the DC UNet, round 4:
        transformers-only remat left the full-res spatial+temporal resnet
        intermediates live and the b=1 16f 576x1024 adapter train step
        OOMed at 13.9 GB of HLO temps, bench_results/train_svd_r5)."""
        if not self.remat:
            return SpatioTemporalResBlock
        return nn.remat(SpatioTemporalResBlock, static_argnums=(3,))

    def _has_adapter(self, site: str) -> bool:
        return f"{site}.transformer_blocks.0.attn2.processor" in set(self.adapter_sites)

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        added_time_ids: jnp.ndarray,
        action_emb: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, f, h, w, _ = sample.shape
        ch0 = self.block_out_channels[0]
        temb_dim = ch0 * 4

        # timestep + added-time conditioning
        timestep = jnp.broadcast_to(jnp.asarray(timestep), (b,))
        t_emb = Timesteps(ch0, flip_sin_to_cos=True)(timestep).astype(self.dtype)
        emb = TimestepEmbedding(temb_dim, dtype=self.dtype, name="time_embedding")(t_emb)
        aug = Timesteps(self.addition_time_embed_dim, flip_sin_to_cos=True)(
            added_time_ids.reshape(-1)
        )
        aug = aug.reshape(b, -1).astype(self.dtype)
        emb = emb + TimestepEmbedding(temb_dim, dtype=self.dtype, name="add_embedding")(aug)

        # flatten frames
        x = sample.reshape(b * f, h, w, sample.shape[-1])
        emb = jnp.repeat(emb, f, axis=0)  # [(b f), temb]
        context = jnp.repeat(encoder_hidden_states, f, axis=0)  # [(b f), n, ctx]

        x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        residuals = [x]

        n_blocks = len(self.block_out_channels)
        # down path: 3 cross-attn blocks + 1 plain block
        for i, out_ch in enumerate(self.block_out_channels):
            is_final = i == n_blocks - 1
            for j in range(self.layers_per_block):
                x = self._res_cls()(
                    out_ch, temb_dim, dtype=self.dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(x, emb, f)
                if not is_final:
                    x = self._transformer_cls()(
                        out_ch, self.num_attention_heads[i], self.cross_attention_dim,
                        with_adapter=self._has_adapter(f"down_blocks.{i}.attentions.{j}"),
                        adapter_scale=self.adapter_scale,
                        dtype=self.dtype, name=f"down_blocks_{i}_attentions_{j}",
                    )(x, context, f, action_emb=action_emb)
                residuals.append(x)
            if not is_final:
                # diffusers UNet down blocks use the symmetric padding=1
                # convention (the asymmetric pad is the VAE encoder's)
                x = Downsample2D(out_ch, asymmetric=False, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsample")(x)
                residuals.append(x)

        # mid
        x = self._res_cls()(
            self.block_out_channels[-1], temb_dim, dtype=self.dtype, name="mid_block_resnets_0"
        )(x, emb, f)
        x = self._transformer_cls()(
            self.block_out_channels[-1], self.num_attention_heads[-1], self.cross_attention_dim,
            with_adapter=self._has_adapter("mid_block.attentions.0"),
            adapter_scale=self.adapter_scale, dtype=self.dtype, name="mid_block_attentions_0",
        )(x, context, f, action_emb=action_emb)
        x = self._res_cls()(
            self.block_out_channels[-1], temb_dim, dtype=self.dtype, name="mid_block_resnets_1"
        )(x, emb, f)

        # up path (reversed channels), layers_per_block+1 resnets each
        rev_channels = list(reversed(self.block_out_channels))
        for i, out_ch in enumerate(rev_channels):
            is_first = i == 0
            for j in range(self.layers_per_block + 1):
                res = residuals.pop()
                x = jnp.concatenate([x, res], axis=-1)
                x = self._res_cls()(
                    out_ch, temb_dim, dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}"
                )(x, emb, f)
                if not is_first:
                    x = self._transformer_cls()(
                        out_ch, list(reversed(self.num_attention_heads))[i],
                        self.cross_attention_dim,
                        with_adapter=self._has_adapter(f"up_blocks.{i}.attentions.{j}"),
                        adapter_scale=self.adapter_scale,
                        dtype=self.dtype, name=f"up_blocks_{i}_attentions_{j}",
                    )(x, context, f, action_emb=action_emb)
            if i < n_blocks - 1:
                x = Upsample2D(out_ch, dtype=self.dtype, name=f"up_blocks_{i}_upsample")(x)

        scale = self.param("conv_norm_out_scale", nn.initializers.ones, (ch0,))
        bias = self.param("conv_norm_out_bias", nn.initializers.zeros, (ch0,))
        x = group_norm(x, 32, scale, bias, eps=1e-5, act="silu")
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x.reshape(b, f, h, w, self.out_channels)
