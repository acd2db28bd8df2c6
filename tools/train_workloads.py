"""Shared training-workload builders for the training benches.

One builder per reference training stage, at config-exact scales (the same
module wiring `main.py fit` would construct from the shipped YAMLs), shared
by ``tools/bench_train.py`` (s/step measurement) and ``tools/overfit_train.py``
(learning-dynamics evidence). Reference stages
(``src/projects/{svd,cogvideox}/module.py``, ``condition/module.py``):

- ``cama``        stage-2 Motion Context Transformer
                  (configs/motion_transformer/condition_trans_dino_dc_open.yml)
- ``dc_adapter``  stage-1 DynamiCrafter Motion-Adapter
                  (configs/dynamicrafter/action_injection.yml)
- ``svd_adapter`` stage-1 SVD Motion-Adapter
                  (configs/svd/action_injection.yml, reference
                  src/projects/svd/module.py:130-224)
- ``cog_adapter`` stage-1 CogVideoX Motion-Adapter
                  (configs/cogvideox/action_injection.yml)
- ``action_clip`` ActionCLIP contrastive pretraining
                  (configs/motion_transformer/action_clip.yml, reference
                  src/projects/condition/module.py:15-85)

Each builder returns ``(module, make_batch, metric, lr)`` where ``make_batch``
is seed -> host batch dict (distinct batches per seed — the tunnel de-dupes
identical executions) and ``lr`` is the shipped config's learning rate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WORKLOADS = ("cama", "dc_adapter", "svd_adapter", "cog_adapter", "action_clip")


def build_workload(workload: str, small: bool, batch: int = 0,
                   dtype=jnp.bfloat16, overfit: bool = False):
    """``overfit=True`` zeroes the CFG drop probabilities (uncond/action
    drops) so a FIXED-rng evaluation loss always sees the adapter branch —
    an overfit-protocol knob only; the s/step benches stay config-exact.
    (Learned the hard way: a fixed eval rng that happens to draw the
    action-drop branch makes the eval loss constant in the trainables.)"""
    kw = dict(batch=batch, dtype=dtype, overfit=overfit)
    if workload == "cama":
        return _cama(small, **kw)
    if workload == "dc_adapter":
        return _dc_adapter(small, **kw)
    if workload == "svd_adapter":
        return _svd_adapter(small, **kw)
    if workload == "cog_adapter":
        return _cog_adapter(small, **kw)
    if workload == "action_clip":
        return _action_clip(small, **kw)
    raise ValueError(f"unknown workload {workload!r}")


def _cama(small, batch, dtype, overfit=False):
    from motionrag_tpu.models.cama import (
        ActionTransformer, SinusoidPositionalEmbeddings)
    from motionrag_tpu.models.cama_module import ActionTransformerModule
    from motionrag_tpu.models.encoders.condition import (
        DINOImageEmbedder, VideoMAEEmbedder)
    from motionrag_tpu.models.layers import TransformerEncoder
    from motionrag_tpu.models.resampler import Resampler

    if small:
        b, k, f, size, dim = batch or 1, 2, 4, 32, 64
        vm = VideoMAEEmbedder(num_frames=4, image_size=32, dim=32,
                              depth=1, heads=2, dtype=dtype)
        dino = DINOImageEmbedder(image_size=28, dim=32, depth=1, heads=2,
                                 dtype=dtype)
        rs = lambda ed: Resampler(dim=dim, depth=1, dim_head=16, heads=4,
                                  num_queries=4, embedding_dim=ed,
                                  output_dim=dim)
        ct_trans = TransformerEncoder(num_layers=1, d_model=dim, nhead=4,
                                      dim_feedforward=128)
    else:
        # condition_trans_dino_dc_open.yml scales. scan_blocks on the
        # frozen encoders: numerically identical (tests/test_vit_scan.py)
        # but ~depth-x smaller HLO — the unrolled 24-deep DINOv2-L +
        # VideoMAE train-step graph exceeded the remote compile
        # service's budget (>30 min, killed twice)
        b, k, f, size, dim = batch or 8, 9, 16, 224, 1024
        vm = VideoMAEEmbedder(dtype=dtype, scan_blocks=True)
        dino = DINOImageEmbedder(dtype=dtype, scan_blocks=True)
        rs = lambda ed: Resampler(dim=1024, depth=4, dim_head=64,
                                  heads=12, num_queries=25,
                                  embedding_dim=ed, output_dim=1024)
        ct_trans = TransformerEncoder(num_layers=4, d_model=1024,
                                      nhead=16, dim_feedforward=4096)
    module = ActionTransformerModule(ActionTransformer(
        vision_model=vm, vision_proj=rs(vm.dim),
        condition_model=dino, condition_proj=rs(dino.dim),
        transformer=ct_trans,
        vision_pe=SinusoidPositionalEmbeddings(dim, 2560),
        condition_pe=SinusoidPositionalEmbeddings(dim, 2560),
    ))

    def make_batch(seed):
        key = jax.random.key(seed)
        return {
            "ref_videos": jax.random.uniform(
                key, (b, k, f, 3, size, size), jnp.float32, -1, 1),
            "video": jax.random.uniform(
                jax.random.fold_in(key, 1), (b, f, 3, size, size),
                jnp.float32, -1, 1),
        }

    metric = (f"CAMA stage-2 train step (b={b} K={k} {f}f {size}px, "
              "frozen DINOv2-L+VideoMAE, Trainer path)")
    return module, make_batch, metric, 1e-4


def _dc_adapter(small, batch, dtype, overfit=False):
    from motionrag_tpu.models.dynamicrafter.module import (
        DynamiCrafterActionModule)
    from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
    from motionrag_tpu.models.encoders.condition import VideoMAEEmbedder
    from motionrag_tpu.models.resampler import Resampler

    if small:
        from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
        from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
        from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder

        b, k, f, h, w, ref = batch or 1, 1, 4, 64, 64, 32
        module = DynamiCrafterActionModule(
            unet=UNet3D(model_channels=32, channel_mult=(1, 2),
                        num_head_channels=16, context_dim=64,
                        action_cross_attention=True,
                        action_scale_learnable=True, dtype=dtype),
            vae=AutoencoderKL2D(block_out_channels=(32, 32, 32, 32),
                                dtype=dtype),
            text_encoder=CLIPTextEncoder(dim=64, depth=2, heads=2,
                                         dtype=dtype),
            image_encoder=CLIPImageEmbedder(image_size=64, patch_size=32,
                                            dim=64, depth=1, heads=2,
                                            pooled=False, dtype=dtype),
            image_proj=Resampler(dim=64, depth=1, dim_head=16, heads=4,
                                 num_queries=4, embedding_dim=64,
                                 output_dim=64, video_length=4,
                                 dtype=dtype),
            action_embedder=VideoMAEEmbedder(
                num_frames=4, image_size=32, dim=32, depth=1, heads=2,
                dtype=dtype),
            action_proj=Resampler(dim=64, depth=1, dim_head=16, heads=4,
                                  num_queries=4, embedding_dim=32,
                                  output_dim=64, dtype=dtype),
            uncond_prob=0.0 if overfit else 0.05,
            action_uncond_prob=0.0 if overfit else 0.05,
            full_trainable_modules=(
                "action_proj", "unet.*.to_q_a", "unet.*.to_k_a",
                "unet.*.to_v_a", "unet.*.alpha_action"),
            dtype=dtype,
        )
    else:
        # action_injection.yml scales: 16f 320x512, batch 2, gt ref.
        # remat=True is a documented single-16GB-chip adaptation (the
        # reference trains this on 80 GB A100s with use_checkpoint:
        # false — without remat the step needs 26.6 GB of activations,
        # measured OOM); scan_blocks shrinks the fwd+bwd HLO for the
        # remote compile service. action_scale_learnable=True is the
        # reference's optional tanh gate on the action branch
        # (lvdm/modules/attention.py:87-92) — it is what makes the
        # config's `unet.*.alpha_action` trainable pattern live.
        b, k, f, h, w, ref = batch or 2, 1, 16, 320, 512, 224
        module = DynamiCrafterActionModule(
            unet=UNet3D(action_cross_attention=True,
                        action_scale_learnable=True, remat=True,
                        scan_blocks=True, dtype=dtype),
            action_embedder=VideoMAEEmbedder(dtype=dtype, scan_blocks=True),
            action_proj=Resampler(dim=1024, depth=4, dim_head=64,
                                  heads=12, num_queries=25,
                                  embedding_dim=768, output_dim=1024,
                                  dtype=dtype),
            uncond_prob=0.0 if overfit else 0.05,
            action_uncond_prob=0.0 if overfit else 0.05,
            full_trainable_modules=(
                "action_proj", "unet.*.to_q_a", "unet.*.to_k_a",
                "unet.*.to_v_a", "unet.*.alpha_action"),
            dtype=dtype,
        )

    def make_batch(seed):
        key = jax.random.key(seed)
        return {
            "video": jax.random.uniform(
                key, (b, f, 3, h, w), jnp.float32, -1, 1),
            "prompt_ids": jnp.zeros((b, 77), jnp.int32),
            "ref_videos": jax.random.uniform(
                jax.random.fold_in(key, 1), (b, k, f, 3, ref, ref),
                jnp.float32, -1, 1),
        }

    metric = (f"DynamiCrafter Motion-Adapter train step (b={b} {f}f "
              f"{h}x{w}, Trainer path)")
    return module, make_batch, metric, 5e-5


def _svd_adapter(small, batch, dtype, overfit=False):
    # Stage-1 SVD Motion-Adapter training (configs/svd/action_injection.yml:
    # batch 1, 16f 576x1024, K=1 gt ref; trainable action_proj_model + the 16
    # attn2.processor adapter sites; EDM log-normal loss, reference
    # src/projects/svd/module.py:130-224). The 1.52B UNet fits one 16 GB chip
    # bf16-true; remat on the spatio-temporal transformers bounds activation
    # HBM at 72x128 latents (single-chip adaptation of the reference's
    # 80 GB A100 setting, same rationale as dc_adapter).
    from motionrag_tpu.models.encoders.condition import VideoMAEEmbedder
    from motionrag_tpu.models.resampler import Resampler
    from motionrag_tpu.models.svd.module import SVDActionModule
    from motionrag_tpu.models.svd.unet import UNetSpatioTemporal

    if small:
        from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder
        from motionrag_tpu.models.svd.vae import AutoencoderKLTemporalDecoder

        b, k, f, h, w, ref = batch or 1, 1, 4, 64, 64, 32
        sites = ("mid_block.attentions.0.transformer_blocks.0"
                 ".attn2.processor",)
        module = SVDActionModule(
            adapter_modules=sites,
            unet=UNetSpatioTemporal(
                block_out_channels=(32, 64, 64, 64), layers_per_block=1,
                cross_attention_dim=48, num_attention_heads=(1, 2, 2, 2),
                adapter_sites=sites, dtype=dtype),
            vae=AutoencoderKLTemporalDecoder(
                block_out_channels=(32, 32, 32, 32), dtype=dtype),
            image_encoder=CLIPImageEmbedder(image_size=28, patch_size=14,
                                            dim=32, depth=1, heads=2,
                                            projection_dim=48, dtype=dtype),
            action_embedder=VideoMAEEmbedder(
                num_frames=4, image_size=32, dim=32, depth=1, heads=2,
                dtype=dtype),
            action_proj_model=Resampler(dim=32, depth=1, dim_head=8,
                                        heads=4, num_queries=4,
                                        embedding_dim=32, output_dim=48,
                                        dtype=dtype),
            drop_prob=0.0 if overfit else 0.1,
            full_trainable_modules=("action_proj_model", "unet.*.processor"),
            dtype=dtype,
        )
    else:
        from motionrag_tpu.models.svd.unet import SVD_ADAPTER_SITES

        b, k, f, h, w, ref = batch or 1, 1, 16, 576, 1024, 224
        module = SVDActionModule(
            unet=UNetSpatioTemporal(adapter_sites=SVD_ADAPTER_SITES,
                                    remat=True, dtype=dtype),
            action_embedder=VideoMAEEmbedder(dtype=dtype, scan_blocks=True),
            action_proj_model=Resampler(dim=1024, depth=4, dim_head=64,
                                        heads=12, num_queries=25,
                                        embedding_dim=768, output_dim=1024,
                                        dtype=dtype),
            drop_prob=0.0 if overfit else 0.1,
            full_trainable_modules=("action_proj_model", "unet.*.processor"),
            dtype=dtype,
        )

    def make_batch(seed):
        key = jax.random.key(seed)
        return {
            "video": jax.random.uniform(
                key, (b, f, 3, h, w), jnp.float32, -1, 1),
            "ref_videos": jax.random.uniform(
                jax.random.fold_in(key, 1), (b, k, f, 3, ref, ref),
                jnp.float32, -1, 1),
        }

    metric = (f"SVD stage-1 Motion-Adapter train step (b={b} {f}f "
              f"{h}x{w}, frozen 1.52B UNet bf16-true, Trainer path)")
    return module, make_batch, metric, 5e-5


def _cog_adapter(small, batch, dtype, overfit=False):
    # Stage-1 CogVideoX Motion-Adapter training
    # (configs/cogvideox/action_injection.yml: batch 1/chip, 17f 480x720,
    # frozen 5.57B DiT, trainable action_proj + all 42 attn1.processor
    # adapters, precision bf16-true). Single-16GB-chip adaptations, both
    # documented in docs/benchmarks.md: (a) gradient_checkpointing=True
    # (the reference's 80 GB A100s run without), (b) precomputed
    # prompt_embeds via text_encoder=False (the reference's
    # src/data/text_cache.py idiom — T5-XXL at 9.5 GB bf16 cannot
    # co-reside with the DiT). scan_blocks keeps the 42-block bwd HLO
    # compilable by the remote service (trainable pattern '*.processor'
    # matches the stacked scan layout).
    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
    from motionrag_tpu.models.cogvideox.module import CogVideoX5BAction
    from motionrag_tpu.models.encoders.condition import VideoMAEEmbedder
    from motionrag_tpu.models.resampler import Resampler

    if small:
        from motionrag_tpu.models.cogvideox.vae3d import CogVideoXVAE

        b, k, f, h, w, ref, text_dim, s_text = (
            batch or 1), 1, 5, 48, 48, 32, 32, 8
        sites = tuple(f"transformer_blocks.{i}.attn1.processor"
                      for i in range(2))
        module = CogVideoX5BAction(
            adapter_modules=sites,
            transformer=CogVideoXTransformer3D(
                in_channels=32, out_channels=16, dim=64, depth=2, heads=4,
                head_dim=16, text_embed_dim=text_dim, time_embed_dim=32,
                adapter_sites=sites, remat=True,
                scan_blocks=True, dtype=dtype),
            vae=CogVideoXVAE(block_out_channels=(32, 32, 32, 32),
                             layers_per_block=1, dtype=dtype),
            text_encoder=False,
            action_embedder=VideoMAEEmbedder(
                num_frames=4, image_size=32, dim=32, depth=1, heads=2,
                dtype=dtype),
            action_proj_model=Resampler(
                dim=64, depth=1, dim_head=16, heads=4, num_queries=4,
                embedding_dim=32, output_dim=64, dtype=dtype),
            full_trainable_modules=("action_proj_model", "*.processor"),
            dtype=dtype,
        )
    else:
        b, k, f, h, w, ref, text_dim, s_text = (
            batch or 1), 1, 17, 480, 720, 224, 4096, 226
        sites = tuple(f"transformer_blocks.{i}.attn1.processor"
                      for i in range(42))
        module = CogVideoX5BAction(
            adapter_modules=sites,
            transformer=CogVideoXTransformer3D(
                adapter_sites=sites, remat=True, scan_blocks=True,
                dtype=dtype),
            text_encoder=False,
            action_embedder=VideoMAEEmbedder(dtype=dtype, scan_blocks=True),
            action_proj_model=Resampler(
                dim=1024, depth=4, dim_head=64, heads=12, num_queries=25,
                embedding_dim=768, output_dim=1024, dtype=dtype),
            full_trainable_modules=("action_proj_model", "*.processor"),
            dtype=dtype,
        )

    def make_batch(seed):
        key = jax.random.key(seed)
        return {
            "video": jax.random.uniform(
                key, (b, f, 3, h, w), jnp.float32, -1, 1),
            "prompt_embeds": jax.random.normal(
                jax.random.fold_in(key, 2), (b, s_text, text_dim), dtype),
            "ref_videos": jax.random.uniform(
                jax.random.fold_in(key, 1), (b, k, f, 3, ref, ref),
                jnp.float32, -1, 1),
        }

    metric = (f"CogVideoX-5B stage-1 Motion-Adapter train step (b={b} "
              f"{f}f {h}x{w}, frozen 5.57B DiT bf16-true, remat+scan, "
              "cached T5 embeds, Trainer path)")
    return module, make_batch, metric, 1e-4


def _action_clip(small, batch, dtype, overfit=False):
    # ActionCLIP contrastive text<->motion pretraining
    # (configs/motion_transformer/action_clip.yml: batch 8, 16f 224px,
    # frozen VideoMAE motion encoder, trainable resampler + logit_scale;
    # symmetric InfoNCE, reference src/projects/condition/module.py:15-85).
    # Text embeddings come precomputed (text_cache pattern) — synthesized
    # unit-norm vectors here.
    from motionrag_tpu.models.cama import ActionCLIP
    from motionrag_tpu.models.cama_module import ActionCLIPModule
    from motionrag_tpu.models.encoders.condition import (
        IdentityEncoder, VideoMAEEmbedder)
    from motionrag_tpu.models.resampler import Resampler

    if small:
        b, f, size, out_dim = batch or 4, 4, 32, 64
        vm = VideoMAEEmbedder(num_frames=4, image_size=32, dim=32,
                              depth=1, heads=2, dtype=dtype)
        rs = Resampler(dim=64, depth=1, dim_head=16, heads=4,
                       num_queries=4, embedding_dim=32, output_dim=out_dim,
                       with_cls_token=True)
    else:
        b, f, size, out_dim = batch or 8, 16, 224, 1024
        vm = VideoMAEEmbedder(dtype=dtype, scan_blocks=True)
        rs = Resampler(dim=1024, depth=4, dim_head=64, heads=12,
                       num_queries=25, embedding_dim=768, output_dim=out_dim,
                       with_cls_token=True)
    module = ActionCLIPModule(
        ActionCLIP(action_model=vm, text_model=IdentityEncoder(),
                   resampler=rs),
        full_trainable_modules=("resampler",),
    )

    def make_batch(seed):
        key = jax.random.key(seed)
        text = jax.random.normal(jax.random.fold_in(key, 1), (b, out_dim),
                                 jnp.float32)
        text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
        return {
            "video": jax.random.uniform(
                key, (b, f, 3, size, size), jnp.float32, -1, 1),
            "text_emb": text,
        }

    metric = (f"ActionCLIP contrastive pretrain step (b={b} {f}f {size}px, "
              "frozen VideoMAE, Trainer path)")
    return module, make_batch, metric, 1e-4
