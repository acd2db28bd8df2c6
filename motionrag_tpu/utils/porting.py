"""HF/torch checkpoint -> Flax param-tree converters.

Each converter maps a torch ``state_dict`` (HF transformers naming) onto the
parameter structure of our modules, verified by golden forward-parity tests
against randomly-initialized HF models (tests/test_porting.py). This is the
weight-porting layer SURVEY.md §7 lists as the biggest fidelity risk; the
production CogVideoX/SVD/DynamiCrafter checkpoints flow through the same
mappings.

Conventions: torch Linear weight [out, in] -> flax kernel [in, out] (transpose);
torch ConvNd weight [out, in, *k] -> flax [*k, in, out].
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "port_videomae",
    "port_videomae2",
    "port_dinov2",
    "port_clip_vision",
    "port_clip_text",
    "port_t5_encoder",
    "port_torch_transformer_encoder",
    "port_resampler",
    "port_gte",
]


def _t(w):
    return np.asarray(w).T


def _conv(w):
    """torch conv [out, in, *k] -> flax [*k, in, out]."""
    w = np.asarray(w)
    dims = list(range(w.ndim))
    return w.transpose(dims[2:] + [1, 0])


def _np(sd, key):
    v = sd[key]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def port_videomae(sd: dict, depth: int) -> dict:
    """HF VideoMAEModel state_dict -> VisionTransformer(variant='videomae')
    params['params'] tree."""
    dim = np.asarray(sd["embeddings.patch_embeddings.projection.bias"]).shape[0]
    p = {
        "patch_embed": {
            "kernel": _conv(_np(sd, "embeddings.patch_embeddings.projection.weight")),
            "bias": _np(sd, "embeddings.patch_embeddings.projection.bias"),
        },
        # use_mean_pooling checkpoints carry no final LN -> identity
        "ln_post": {
            "scale": _np(sd, "layernorm.weight") if "layernorm.weight" in sd else np.ones(dim, np.float32),
            "bias": _np(sd, "layernorm.bias") if "layernorm.bias" in sd else np.zeros(dim, np.float32),
        },
    }
    for i in range(depth):
        pre = f"encoder.layer.{i}"
        q_w = _t(_np(sd, f"{pre}.attention.attention.query.weight"))
        k_w = _t(_np(sd, f"{pre}.attention.attention.key.weight"))
        v_w = _t(_np(sd, f"{pre}.attention.attention.value.weight"))
        q_b = _np(sd, f"{pre}.attention.attention.q_bias")
        v_b = _np(sd, f"{pre}.attention.attention.v_bias")
        # key has no bias in VideoMAE; zero is score-invariant under softmax
        k_b = np.zeros_like(q_b)
        p[f"blocks_{i}"] = {
            "norm1": {
                "scale": _np(sd, f"{pre}.layernorm_before.weight"),
                "bias": _np(sd, f"{pre}.layernorm_before.bias"),
            },
            "qkv": {
                "kernel": np.concatenate([q_w, k_w, v_w], axis=1),
                "bias": np.concatenate([q_b, k_b, v_b]),
            },
            "proj": {
                "kernel": _t(_np(sd, f"{pre}.attention.output.dense.weight")),
                "bias": _np(sd, f"{pre}.attention.output.dense.bias"),
            },
            "norm2": {
                "scale": _np(sd, f"{pre}.layernorm_after.weight"),
                "bias": _np(sd, f"{pre}.layernorm_after.bias"),
            },
            "fc1": {
                "kernel": _t(_np(sd, f"{pre}.intermediate.dense.weight")),
                "bias": _np(sd, f"{pre}.intermediate.dense.bias"),
            },
            "fc2": {
                "kernel": _t(_np(sd, f"{pre}.output.dense.weight")),
                "bias": _np(sd, f"{pre}.output.dense.bias"),
            },
        }
    return {"params": p}


def port_videomae2(sd: dict, depth: int) -> dict:
    """VideoMAEv2 state_dict (OpenGVLab trust_remote_code model; the arch
    is the reference's vendored vit.py VisionTransformer) ->
    VisionTransformer(variant='videomae2') params tree.

    Keys may carry a 'model.' prefix (the remote-code wrapper nests the
    backbone as .model); both spellings are accepted."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    p = {
        "patch_embed": {
            "kernel": _conv(_np(sd, "patch_embed.proj.weight")),
            "bias": _np(sd, "patch_embed.proj.bias"),
        },
    }
    for i in range(depth):
        pre = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": {
                "scale": _np(sd, f"{pre}.norm1.weight"),
                "bias": _np(sd, f"{pre}.norm1.bias"),
            },
            "qkv": {"kernel": _t(_np(sd, f"{pre}.attn.qkv.weight"))},
            "q_bias": _np(sd, f"{pre}.attn.q_bias"),
            "v_bias": _np(sd, f"{pre}.attn.v_bias"),
            "proj": {
                "kernel": _t(_np(sd, f"{pre}.attn.proj.weight")),
                "bias": _np(sd, f"{pre}.attn.proj.bias"),
            },
            "norm2": {
                "scale": _np(sd, f"{pre}.norm2.weight"),
                "bias": _np(sd, f"{pre}.norm2.bias"),
            },
            "fc1": {
                "kernel": _t(_np(sd, f"{pre}.mlp.fc1.weight")),
                "bias": _np(sd, f"{pre}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": _t(_np(sd, f"{pre}.mlp.fc2.weight")),
                "bias": _np(sd, f"{pre}.mlp.fc2.bias"),
            },
        }
    return {"params": p}


def port_dinov2(sd: dict, depth: int) -> dict:
    """HF Dinov2Model state_dict -> VisionTransformer(variant='dino')."""
    p = {
        "cls_token": _np(sd, "embeddings.cls_token"),
        "pos_embed": _np(sd, "embeddings.position_embeddings"),
        "patch_embed": {
            "kernel": _conv(_np(sd, "embeddings.patch_embeddings.projection.weight")),
            "bias": _np(sd, "embeddings.patch_embeddings.projection.bias"),
        },
        "ln_post": {
            "scale": _np(sd, "layernorm.weight"),
            "bias": _np(sd, "layernorm.bias"),
        },
    }
    for i in range(depth):
        pre = f"encoder.layer.{i}"
        qkv_w = np.concatenate(
            [_t(_np(sd, f"{pre}.attention.attention.{n}.weight")) for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [_np(sd, f"{pre}.attention.attention.{n}.bias") for n in ("query", "key", "value")]
        )
        p[f"blocks_{i}"] = {
            "norm1": {"scale": _np(sd, f"{pre}.norm1.weight"), "bias": _np(sd, f"{pre}.norm1.bias")},
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": {
                "kernel": _t(_np(sd, f"{pre}.attention.output.dense.weight")),
                "bias": _np(sd, f"{pre}.attention.output.dense.bias"),
            },
            "ls1": _np(sd, f"{pre}.layer_scale1.lambda1"),
            "norm2": {"scale": _np(sd, f"{pre}.norm2.weight"), "bias": _np(sd, f"{pre}.norm2.bias")},
            "fc1": {
                "kernel": _t(_np(sd, f"{pre}.mlp.fc1.weight")),
                "bias": _np(sd, f"{pre}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": _t(_np(sd, f"{pre}.mlp.fc2.weight")),
                "bias": _np(sd, f"{pre}.mlp.fc2.bias"),
            },
            "ls2": _np(sd, f"{pre}.layer_scale2.lambda1"),
        }
    return {"params": p}


def port_clip_vision(sd: dict, depth: int, with_projection: bool = True) -> dict:
    """HF CLIPVisionModel(WithProjection) -> VisionTransformer(variant='clip')."""
    pre0 = "vision_model."
    p = {
        "cls_token": _np(sd, pre0 + "embeddings.class_embedding").reshape(1, 1, -1),
        "pos_embed": _np(sd, pre0 + "embeddings.position_embedding.weight")[None],
        "patch_embed": {
            "kernel": _conv(_np(sd, pre0 + "embeddings.patch_embedding.weight")),
        },
        "ln_pre": {
            "scale": _np(sd, pre0 + "pre_layrnorm.weight"),
            "bias": _np(sd, pre0 + "pre_layrnorm.bias"),
        },
        "ln_post": {
            "scale": _np(sd, pre0 + "post_layernorm.weight"),
            "bias": _np(sd, pre0 + "post_layernorm.bias"),
        },
    }
    if with_projection:
        p["visual_projection"] = {"kernel": _t(_np(sd, "visual_projection.weight"))}
    for i in range(depth):
        pre = f"{pre0}encoder.layers.{i}"
        qkv_w = np.concatenate(
            [_t(_np(sd, f"{pre}.self_attn.{n}_proj.weight")) for n in ("q", "k", "v")], axis=1
        )
        qkv_b = np.concatenate(
            [_np(sd, f"{pre}.self_attn.{n}_proj.bias") for n in ("q", "k", "v")]
        )
        p[f"blocks_{i}"] = {
            "norm1": {
                "scale": _np(sd, f"{pre}.layer_norm1.weight"),
                "bias": _np(sd, f"{pre}.layer_norm1.bias"),
            },
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": {
                "kernel": _t(_np(sd, f"{pre}.self_attn.out_proj.weight")),
                "bias": _np(sd, f"{pre}.self_attn.out_proj.bias"),
            },
            "norm2": {
                "scale": _np(sd, f"{pre}.layer_norm2.weight"),
                "bias": _np(sd, f"{pre}.layer_norm2.bias"),
            },
            "fc1": {
                "kernel": _t(_np(sd, f"{pre}.mlp.fc1.weight")),
                "bias": _np(sd, f"{pre}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": _t(_np(sd, f"{pre}.mlp.fc2.weight")),
                "bias": _np(sd, f"{pre}.mlp.fc2.bias"),
            },
        }
    return {"params": p}


def port_clip_text(sd: dict, depth: int, with_projection: bool = False) -> dict:
    """HF CLIPTextModel(WithProjection) -> CLIPTextEncoder params."""
    pre0 = "text_model."
    p = {
        "token_embedding": _np(sd, pre0 + "embeddings.token_embedding.weight"),
        "positional_embedding": _np(sd, pre0 + "embeddings.position_embedding.weight"),
        "ln_final": {
            "scale": _np(sd, pre0 + "final_layer_norm.weight"),
            "bias": _np(sd, pre0 + "final_layer_norm.bias"),
        },
    }
    if with_projection:
        p["text_projection"] = {"kernel": _t(_np(sd, "text_projection.weight"))}
    for i in range(depth):
        pre = f"{pre0}encoder.layers.{i}"
        qkv_w = np.concatenate(
            [_t(_np(sd, f"{pre}.self_attn.{n}_proj.weight")) for n in ("q", "k", "v")], axis=1
        )
        qkv_b = np.concatenate(
            [_np(sd, f"{pre}.self_attn.{n}_proj.bias") for n in ("q", "k", "v")]
        )
        p[f"blocks_{i}"] = {
            "ln_1": {
                "scale": _np(sd, f"{pre}.layer_norm1.weight"),
                "bias": _np(sd, f"{pre}.layer_norm1.bias"),
            },
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": {
                "kernel": _t(_np(sd, f"{pre}.self_attn.out_proj.weight")),
                "bias": _np(sd, f"{pre}.self_attn.out_proj.bias"),
            },
            "ln_2": {
                "scale": _np(sd, f"{pre}.layer_norm2.weight"),
                "bias": _np(sd, f"{pre}.layer_norm2.bias"),
            },
            "fc1": {
                "kernel": _t(_np(sd, f"{pre}.mlp.fc1.weight")),
                "bias": _np(sd, f"{pre}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": _t(_np(sd, f"{pre}.mlp.fc2.weight")),
                "bias": _np(sd, f"{pre}.mlp.fc2.bias"),
            },
        }
    return {"params": p}


def port_t5_encoder(sd: dict, depth: int) -> dict:
    """HF T5EncoderModel -> T5Encoder params."""
    p = {
        "token_embedding": _np(sd, "shared.weight"),
        "relative_attention_bias": _np(
            sd, "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "final_ln_scale": _np(sd, "encoder.final_layer_norm.weight"),
    }
    for i in range(depth):
        pre = f"encoder.block.{i}"
        p[f"blocks_{i}"] = {
            "ln1_scale": _np(sd, f"{pre}.layer.0.layer_norm.weight"),
            "attn": {
                "q": {"kernel": _t(_np(sd, f"{pre}.layer.0.SelfAttention.q.weight"))},
                "k": {"kernel": _t(_np(sd, f"{pre}.layer.0.SelfAttention.k.weight"))},
                "v": {"kernel": _t(_np(sd, f"{pre}.layer.0.SelfAttention.v.weight"))},
                "o": {"kernel": _t(_np(sd, f"{pre}.layer.0.SelfAttention.o.weight"))},
            },
            "ln2_scale": _np(sd, f"{pre}.layer.1.layer_norm.weight"),
            "wi_0": {"kernel": _t(_np(sd, f"{pre}.layer.1.DenseReluDense.wi_0.weight"))},
            "wi_1": {"kernel": _t(_np(sd, f"{pre}.layer.1.DenseReluDense.wi_1.weight"))},
            "wo": {"kernel": _t(_np(sd, f"{pre}.layer.1.DenseReluDense.wo.weight"))},
        }
    return {"params": p}


def port_torch_transformer_encoder(sd: dict, depth: int, prefix: str = "") -> dict:
    """torch ``nn.TransformerEncoder`` state_dict -> models.layers.
    TransformerEncoder params (the CAMA CT backbone; reference config
    ``configs/motion_transformer/...yml:130-144``). in_proj qkv is split
    into our separate q/k/v projections."""
    p = {}
    for i in range(depth):
        pre = f"{prefix}layers.{i}"
        in_w = _np(sd, f"{pre}.self_attn.in_proj_weight")  # [3d, d]
        in_b = _np(sd, f"{pre}.self_attn.in_proj_bias")
        d = in_w.shape[1]
        qw, kw, vw = in_w[:d], in_w[d:2*d], in_w[2*d:]
        qb, kb, vb = in_b[:d], in_b[d:2*d], in_b[2*d:]
        p[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": {"kernel": _t(qw), "bias": qb},
                "k_proj": {"kernel": _t(kw), "bias": kb},
                "v_proj": {"kernel": _t(vw), "bias": vb},
                "out_proj": {
                    "kernel": _t(_np(sd, f"{pre}.self_attn.out_proj.weight")),
                    "bias": _np(sd, f"{pre}.self_attn.out_proj.bias"),
                },
            },
            "linear1": {
                "kernel": _t(_np(sd, f"{pre}.linear1.weight")),
                "bias": _np(sd, f"{pre}.linear1.bias"),
            },
            "linear2": {
                "kernel": _t(_np(sd, f"{pre}.linear2.weight")),
                "bias": _np(sd, f"{pre}.linear2.bias"),
            },
            "norm1": {
                "scale": _np(sd, f"{pre}.norm1.weight"),
                "bias": _np(sd, f"{pre}.norm1.bias"),
            },
            "norm2": {
                "scale": _np(sd, f"{pre}.norm2.weight"),
                "bias": _np(sd, f"{pre}.norm2.bias"),
            },
        }
    return {"params": p}


def port_openclip_text(sd: dict, depth: int, prefix: str = "") -> dict:
    """OpenCLIP text tower (the naming inside released DynamiCrafter
    checkpoints: ``cond_stage_model.model.*`` — token_embedding,
    positional_embedding, transformer.resblocks.{i}.{ln_1,attn,ln_2,mlp},
    ln_final, text_projection) -> our CLIPTextEncoder tree."""
    p: dict = {
        "token_embedding": _np(sd, f"{prefix}token_embedding.weight"),
        "positional_embedding": _np(sd, f"{prefix}positional_embedding"),
        "ln_final": {
            "scale": _np(sd, f"{prefix}ln_final.weight"),
            "bias": _np(sd, f"{prefix}ln_final.bias"),
        },
    }
    for i in range(depth):
        pre = f"{prefix}transformer.resblocks.{i}"
        p[f"blocks_{i}"] = {
            "ln_1": {"scale": _np(sd, f"{pre}.ln_1.weight"),
                     "bias": _np(sd, f"{pre}.ln_1.bias")},
            "qkv": {"kernel": _t(_np(sd, f"{pre}.attn.in_proj_weight")),
                    "bias": _np(sd, f"{pre}.attn.in_proj_bias")},
            "proj": {"kernel": _t(_np(sd, f"{pre}.attn.out_proj.weight")),
                     "bias": _np(sd, f"{pre}.attn.out_proj.bias")},
            "ln_2": {"scale": _np(sd, f"{pre}.ln_2.weight"),
                     "bias": _np(sd, f"{pre}.ln_2.bias")},
            "fc1": {"kernel": _t(_np(sd, f"{pre}.mlp.c_fc.weight")),
                    "bias": _np(sd, f"{pre}.mlp.c_fc.bias")},
            "fc2": {"kernel": _t(_np(sd, f"{pre}.mlp.c_proj.weight")),
                    "bias": _np(sd, f"{pre}.mlp.c_proj.bias")},
        }
    if f"{prefix}text_projection" in sd:
        # open_clip stores the projection as a [width, embed] matrix applied
        # x @ W — already the flax kernel orientation, no transpose
        p["text_projection"] = {"kernel": _np(sd, f"{prefix}text_projection")}
    return {"params": p}


def port_openclip_visual(sd: dict, depth: int, prefix: str = "") -> dict:
    """OpenCLIP vision tower (``embedder.model.visual.*`` inside released
    DynamiCrafter checkpoints / open_clip ViT) -> our
    VisionTransformer(variant='clip') tree."""
    d = _np(sd, f"{prefix}class_embedding").shape[0]
    p: dict = {
        "patch_embed": {"kernel": _conv(_np(sd, f"{prefix}conv1.weight"))},
        "cls_token": _np(sd, f"{prefix}class_embedding").reshape(1, 1, d),
        "pos_embed": _np(sd, f"{prefix}positional_embedding")[None],
        "ln_pre": {"scale": _np(sd, f"{prefix}ln_pre.weight"),
                   "bias": _np(sd, f"{prefix}ln_pre.bias")},
    }
    for i in range(depth):
        pre = f"{prefix}transformer.resblocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": {"scale": _np(sd, f"{pre}.ln_1.weight"),
                      "bias": _np(sd, f"{pre}.ln_1.bias")},
            "qkv": {"kernel": _t(_np(sd, f"{pre}.attn.in_proj_weight")),
                    "bias": _np(sd, f"{pre}.attn.in_proj_bias")},
            "proj": {"kernel": _t(_np(sd, f"{pre}.attn.out_proj.weight")),
                     "bias": _np(sd, f"{pre}.attn.out_proj.bias")},
            "norm2": {"scale": _np(sd, f"{pre}.ln_2.weight"),
                      "bias": _np(sd, f"{pre}.ln_2.bias")},
            "fc1": {"kernel": _t(_np(sd, f"{pre}.mlp.c_fc.weight")),
                    "bias": _np(sd, f"{pre}.mlp.c_fc.bias")},
            "fc2": {"kernel": _t(_np(sd, f"{pre}.mlp.c_proj.weight")),
                    "bias": _np(sd, f"{pre}.mlp.c_proj.bias")},
        }
    if f"{prefix}ln_post.weight" in sd:
        p["ln_post"] = {"scale": _np(sd, f"{prefix}ln_post.weight"),
                        "bias": _np(sd, f"{prefix}ln_post.bias")}
    if f"{prefix}proj" in sd:
        p["visual_projection"] = {"kernel": _np(sd, f"{prefix}proj")}
    return {"params": p}


def _port_torch_mha(sd: dict, pre: str) -> dict:
    """torch nn.MultiheadAttention (packed in_proj) -> our MultiHeadAttention."""
    in_w = _np(sd, f"{pre}.in_proj_weight")
    in_b = _np(sd, f"{pre}.in_proj_bias")
    d = in_w.shape[1]
    qw, kw, vw = in_w[:d], in_w[d:2 * d], in_w[2 * d:]
    qb, kb, vb = in_b[:d], in_b[d:2 * d], in_b[2 * d:]
    return {
        "q_proj": {"kernel": _t(qw), "bias": qb},
        "k_proj": {"kernel": _t(kw), "bias": kb},
        "v_proj": {"kernel": _t(vw), "bias": vb},
        "out_proj": {
            "kernel": _t(_np(sd, f"{pre}.out_proj.weight")),
            "bias": _np(sd, f"{pre}.out_proj.bias"),
        },
    }


def port_torch_transformer_decoder(sd: dict, depth: int, prefix: str = "") -> dict:
    """torch ``nn.TransformerDecoder`` state_dict -> models.layers.
    TransformerDecoder params (the ConditionTransformer/SkillTransformer
    backbone; reference passes tgt=visions, memory=conditions,
    ``condition/module.py:168``)."""
    p = {}
    for i in range(depth):
        pre = f"{prefix}layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": _port_torch_mha(sd, f"{pre}.self_attn"),
            "multihead_attn": _port_torch_mha(sd, f"{pre}.multihead_attn"),
            "linear1": {
                "kernel": _t(_np(sd, f"{pre}.linear1.weight")),
                "bias": _np(sd, f"{pre}.linear1.bias"),
            },
            "linear2": {
                "kernel": _t(_np(sd, f"{pre}.linear2.weight")),
                "bias": _np(sd, f"{pre}.linear2.bias"),
            },
            "norm1": {
                "scale": _np(sd, f"{pre}.norm1.weight"),
                "bias": _np(sd, f"{pre}.norm1.bias"),
            },
            "norm2": {
                "scale": _np(sd, f"{pre}.norm2.weight"),
                "bias": _np(sd, f"{pre}.norm2.bias"),
            },
            "norm3": {
                "scale": _np(sd, f"{pre}.norm3.weight"),
                "bias": _np(sd, f"{pre}.norm3.bias"),
            },
        }
    return {"params": p}


def port_resampler(sd: dict, depth: int, prefix: str = "") -> dict:
    """Reference Resampler state_dict (``resampler.py:108-174`` naming:
    latents, proj_in/out, norm_out, layers.{i}.{0,1}) -> models.resampler.
    Resampler params."""
    g = lambda k: _np(sd, prefix + k)
    p = {
        "latents": g("latents"),
        "proj_in": {"kernel": _t(g("proj_in.weight")), "bias": g("proj_in.bias")},
        "proj_out": {"kernel": _t(g("proj_out.weight")), "bias": g("proj_out.bias")},
        "norm_out": {"scale": g("norm_out.weight"), "bias": g("norm_out.bias")},
    }
    for i in range(depth):
        a = f"layers.{i}.0"
        f_ = f"layers.{i}.1"
        p[f"layers_{i}_attn"] = {
            "norm1": {"scale": g(f"{a}.norm1.weight"), "bias": g(f"{a}.norm1.bias")},
            "norm2": {"scale": g(f"{a}.norm2.weight"), "bias": g(f"{a}.norm2.bias")},
            "to_q": {"kernel": _t(g(f"{a}.to_q.weight"))},
            "to_kv": {"kernel": _t(g(f"{a}.to_kv.weight"))},
            "to_out": {"kernel": _t(g(f"{a}.to_out.weight"))},
        }
        p[f"layers_{i}_ff"] = {
            "norm": {"scale": g(f"{f_}.0.weight"), "bias": g(f"{f_}.0.bias")},
            "fc1": {"kernel": _t(g(f"{f_}.1.weight"))},
            "fc2": {"kernel": _t(g(f"{f_}.3.weight"))},
        }
    return {"params": p}


def port_gte(sd: dict, depth: int = 12) -> dict:
    """Alibaba-NLP gte-*-en-v1.5 (HF ``NewModel`` custom code) state dict ->
    GTEEncoder params (models/encoders/gte.py). Accepts both bare
    ``embeddings./encoder.`` keys and the ``new.``-prefixed layout of the
    sentence-transformers save; golden-tested vs a HF-keyed torch mirror
    (tests/test_gte.py). Reference usage:
    ``tools/build_rag_database.py:17-33``, ``src/data/datamodule.py:296-304``.
    """
    prefix = "new." if any(k.startswith("new.") for k in sd) else ""

    def c(key):
        return _np(sd, prefix + key)

    def ln(key):
        return {"scale": c(f"{key}.weight"), "bias": c(f"{key}.bias")}

    params = {
        "word_embeddings": c("embeddings.word_embeddings.weight"),
        "token_type_embeddings": c("embeddings.token_type_embeddings.weight"),
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(depth):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "qkv_proj": {"kernel": _t(c(f"{p}.attention.qkv_proj.weight")),
                         "bias": c(f"{p}.attention.qkv_proj.bias")},
            "o_proj": {"kernel": _t(c(f"{p}.attention.o_proj.weight")),
                       "bias": c(f"{p}.attention.o_proj.bias")},
            "attn_ln": ln(f"{p}.attn_ln"),
            "up_gate_proj": {"kernel": _t(c(f"{p}.mlp.up_gate_proj.weight"))},
            "down_proj": {"kernel": _t(c(f"{p}.mlp.down_proj.weight")),
                          "bias": c(f"{p}.mlp.down_proj.bias")},
            "mlp_ln": ln(f"{p}.mlp_ln"),
        }
    return {"params": params}
