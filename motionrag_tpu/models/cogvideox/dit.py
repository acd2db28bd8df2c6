"""CogVideoX DiT (joint text+video transformer) — the flagship denoiser.

TPU-native re-design of the 5B CogVideoX-I2V transformer the reference loads
via diffusers (reference ``cogvideox/module.py:22-49``): 42 blocks, 48 heads
x 64, joint self-attention over [text tokens ++ video patch tokens] with QK
LayerNorm and 3D RoPE applied to the video part only, adaLN-Zero modulation
with *separate* (shift, scale, gate) for the text and video streams, and a
gelu-tanh MLP.

Motion-Adapter branch (reference ``attn_processor.py:144-283``): on selected
blocks, an extra attention with q = to_q_ip(post-attention hidden states over
the full joint sequence), kv from the adapted motion tokens, CFG-batch
broadcast, added with a scale before the output projection. The action
embedding is an explicit argument — no smuggling through the RoPE tuple.

Sharding: ``partition_rules()`` returns PartitionSpecs for tensor parallelism
over heads/MLP (tp axis) — the scale path the reference never had
(SURVEY.md §2.9: mesh is a first-class config axis here).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionrag_tpu.models.diffusion_blocks import TimestepEmbedding, Timesteps
from motionrag_tpu.ops.attention import dot_product_attention
from motionrag_tpu.ops.norms import layer_norm
from motionrag_tpu.ops.posemb import rope_3d_cache

__all__ = ["CogVideoXTransformer3D", "cogvideox_5b_config", "tp_partition_rules"]


def cogvideox_5b_config(**overrides):
    cfg = dict(
        in_channels=32,
        out_channels=16,
        dim=3072,
        depth=42,
        heads=48,
        head_dim=64,
        text_embed_dim=4096,
        time_embed_dim=512,
        patch_size=2,
        ff_mult=4,
        use_rotary_positional_embeddings=True,
    )
    cfg.update(overrides)
    return cfg


def tp_partition_rules():
    """Config-resolvable alias for ``CogVideoXTransformer3D.partition_rules``
    (``class_path`` specs resolve module-level symbols only): YAML configs
    pass ``trainer.partition_rules: {class_path: ...dit.tp_partition_rules}``
    to run the DiT tensor-parallel over the ``tp`` mesh axis."""
    return CogVideoXTransformer3D.partition_rules()


def _apply_rope_bshd(x: jnp.ndarray, cache: jnp.ndarray) -> jnp.ndarray:
    """RoPE on [b, s, h, d] with cache [s, d/2, 2]; interleaved pairs
    (diffusers apply_rotary_emb use_real+interleaved contract) — identical
    fp32 math to the previous BHSD formulation (same per-element
    products/sums) without the [b,s,h,d] <-> [b,h,s,d] round-trip
    transposes that layout forced at every call site (two ~40 MB
    materializations per q/k per block at 49f; dot_product_attention takes
    BSHD, so the transposes were pure HBM traffic). Bit-identity is pinned
    by the DiT activation-parity tests."""
    orig = x.dtype
    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (-1, 2))
    cos = cache[None, :, None, :, 0]
    sin = cache[None, :, None, :, 1]
    x0, x1 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return out.reshape(x.shape).astype(orig)


class CogVideoXBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    time_embed_dim: int
    ff_mult: int = 4
    with_adapter: bool = False
    adapter_scale: float = 1.0
    adapter_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    sequence_parallel: bool = False
    # 'ring' rotates K/V shards around the sp ICI ring (ops/ring_attention,
    # O(s/N) K/V residency, transfer overlaps compute); 'allgather' keeps
    # the seq-sharded flash path (XLA all-gathers K/V per block). Measured
    # on the sp=4 CPU mesh at the 49f token count (tools/compare_sp_modes.py):
    # ring moves 21.2 MB of collectives per 2-block fwd vs all-gather's
    # 73.9 MB and needs 3.9x less per-device temp (0.67 vs 2.59 GB) — ring
    # is the default; non-divisible seqs fall back to all-gather.
    sp_attention: str = "ring"

    def _sp_ring_size(self, s: int):
        """Ring engages only when sequence_parallel, the ambient mesh has an
        sp axis > 1, and the joint seq divides it; None otherwise."""
        if not (self.sequence_parallel and self.sp_attention == "ring"):
            return None
        from motionrag_tpu.parallel.sharding import ambient_mesh

        m = ambient_mesh()
        if m is None or "sp" not in m.axis_names or m.shape["sp"] == 1:
            return None
        return m.shape["sp"] if s % m.shape["sp"] == 0 else None

    @nn.compact
    def __call__(self, hidden, encoder_hidden, temb, rope_cache=None, action_emb=None):
        b, sv, c = hidden.shape
        st = encoder_hidden.shape[1]
        inner = self.heads * self.head_dim

        def ln_zero(name, n_chunks=6):
            mod = nn.Dense(n_chunks * self.dim, dtype=self.dtype, name=f"{name}_linear")(
                nn.silu(temb)
            )
            return jnp.split(mod[:, None, :], n_chunks, axis=-1)

        def affine_ln(name):
            # CogVideoXLayerNormZero holds an *affine* LayerNorm shared by the
            # text and video streams (diffusers norm_elementwise_affine=True
            # default; real CogVideoX-5b checkpoints carry norm1.norm.weight/
            # bias) — the learned scale/bias apply before the adaLN modulation
            s = self.param(f"{name}_norm_scale", nn.initializers.ones, (self.dim,))
            b_ = self.param(f"{name}_norm_bias", nn.initializers.zeros, (self.dim,))
            return s, b_

        # --- attention with adaLN-zero ------------------------------------
        shift, scale, gate, e_shift, e_scale, e_gate = ln_zero("norm1")
        n1_s, n1_b = affine_ln("norm1")
        h_n = layer_norm(hidden, n1_s, n1_b) * (1 + scale) + shift
        e_n = layer_norm(encoder_hidden, n1_s, n1_b) * (1 + e_scale) + e_shift
        joint = jnp.concatenate([e_n, h_n], axis=1)
        if self.sequence_parallel:
            from motionrag_tpu.parallel.sharding import maybe_shard_seq

            joint = maybe_shard_seq(joint)
        s = st + sv

        q = nn.Dense(inner, dtype=self.dtype, name="to_q")(joint)
        k = nn.Dense(inner, dtype=self.dtype, name="to_k")(joint)
        v = nn.Dense(inner, dtype=self.dtype, name="to_v")(joint)
        qh = q.reshape(b, s, self.heads, self.head_dim)
        kh = k.reshape(b, s, self.heads, self.head_dim)
        vh = v.reshape(b, s, self.heads, self.head_dim)
        # QK LayerNorm over head_dim (CogVideoX norm_q / norm_k)
        qh = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_q")(qh)
        kh = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_k")(kh)
        if rope_cache is not None:
            qh = jnp.concatenate(
                [qh[:, :st], _apply_rope_bshd(qh[:, st:], rope_cache)], axis=1)
            kh = jnp.concatenate(
                [kh[:, :st], _apply_rope_bshd(kh[:, st:], rope_cache)], axis=1)
        if self._sp_ring_size(s):
            from motionrag_tpu.ops.ring_attention import ring_attention_bshd

            attn_out = ring_attention_bshd(qh, kh, vh).reshape(b, s, inner)
        else:
            attn_out = dot_product_attention(qh, kh, vh).reshape(b, s, inner)

        if self.with_adapter and action_emb is not None:
            ip_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q_ip")(attn_out)
            ip_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")(action_emb)
            ip_v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")(action_emb)
            r = b // action_emb.shape[0]
            if r > 1:
                ip_k = jnp.repeat(ip_k, r, axis=0)
                ip_v = jnp.repeat(ip_v, r, axis=0)
            sa = ip_k.shape[1]
            ip_out = dot_product_attention(
                ip_q.reshape(b, s, self.heads, self.head_dim),
                ip_k.reshape(b, sa, self.heads, self.head_dim),
                ip_v.reshape(b, sa, self.heads, self.head_dim),
            ).reshape(b, s, inner)
            attn_out = attn_out + self.adapter_scale * ip_out

        attn_out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(attn_out)
        e_attn, h_attn = attn_out[:, :st], attn_out[:, st:]
        hidden = hidden + gate * h_attn
        encoder_hidden = encoder_hidden + e_gate * e_attn

        # --- feed-forward with adaLN-zero ----------------------------------
        shift, scale, gate, e_shift, e_scale, e_gate = ln_zero("norm2")
        n2_s, n2_b = affine_ln("norm2")
        h_n = layer_norm(hidden, n2_s, n2_b) * (1 + scale) + shift
        e_n = layer_norm(encoder_hidden, n2_s, n2_b) * (1 + e_scale) + e_shift
        joint = jnp.concatenate([e_n, h_n], axis=1)
        if self.sequence_parallel:
            from motionrag_tpu.parallel.sharding import maybe_shard_seq

            joint = maybe_shard_seq(joint)
        ff = nn.Dense(self.dim * self.ff_mult, dtype=self.dtype, name="ff_in")(joint)
        ff = nn.gelu(ff, approximate=True)
        ff = nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(ff)
        hidden = hidden + gate * ff[:, st:]
        encoder_hidden = encoder_hidden + e_gate * ff[:, :st]
        return hidden, encoder_hidden


class _ScanBlockCell(nn.Module):
    """scan-over-layers cell: carry = (hidden, enc); broadcast args follow.

    Wrapping ``CogVideoXBlock`` (name="block") so the scanned param tree is
    ``transformer_blocks/block/...`` with a leading depth axis — the exact
    stacked layout ``parallel/pipeline.py`` consumes."""

    dim: int
    heads: int
    head_dim: int
    time_embed_dim: int
    ff_mult: int
    with_adapter: bool
    adapter_scale: float
    dtype: jnp.dtype
    sequence_parallel: bool
    sp_attention: str
    remat: bool

    @nn.compact
    def __call__(self, carry, temb, rope, action_emb):
        hidden, enc = carry
        cls = CogVideoXBlock
        if self.remat:
            cls = nn.remat(CogVideoXBlock, prevent_cse=False)
        hidden, enc = cls(
            self.dim, self.heads, self.head_dim, self.time_embed_dim,
            self.ff_mult,
            with_adapter=self.with_adapter,
            adapter_scale=self.adapter_scale,
            dtype=self.dtype,
            sequence_parallel=self.sequence_parallel,
            sp_attention=self.sp_attention,
            name="block",
        )(hidden, enc, temb, rope, action_emb)
        return (hidden, enc), None


class CogVideoXTransformer3D(nn.Module):
    """Inputs: video latents [b, f_lat, h_lat, w_lat, in_channels] (NHWC),
    text embeddings [b, s_text, text_embed_dim], timestep [b]."""

    in_channels: int = 32
    out_channels: int = 16
    dim: int = 3072
    depth: int = 42
    heads: int = 48
    head_dim: int = 64
    text_embed_dim: int = 4096
    time_embed_dim: int = 512
    patch_size: int = 2
    ff_mult: int = 4
    use_rotary_positional_embeddings: bool = True
    adapter_sites: Sequence[str] = ()
    adapter_scale: float = 1.0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    # shard the token axis over the mesh's 'sp' axis (no-op without one);
    # with the flash q-seq partitioning rule this yields all-gather-KV
    # sequence parallelism through every block
    sequence_parallel: bool = False
    # sp attention algorithm: 'ring' (ops/ring_attention ppermute ring,
    # O(s/N) K/V residency — measured 3.5x fewer collective bytes and 3.9x
    # less per-device temp than 'allgather' at the 49f shape, see
    # tools/compare_sp_modes.py) or 'allgather' (seq-sharded flash with
    # XLA-inserted K/V all-gathers; also the automatic fallback when the
    # joint seq does not divide the sp axis)
    sp_attention: str = "ring"
    # compile the depth-42 stack as ONE nn.scan'd block instead of 42
    # unrolled copies: ~depth-x smaller HLO (compile time) and a stacked
    # [depth, ...] param layout that parallel/pipeline.py pipelines over a
    # 'pp' mesh axis. Requires uniform blocks (adapters on all or none —
    # the flagship config adapts all 42). Param layout differs from the
    # unrolled loop; convert with stack_block_params / unstack_block_params.
    scan_blocks: bool = False
    # with scan_blocks: when the ambient mesh has a 'pp' axis of size > 1,
    # run the block stack as a GPipe pipeline (parallel/pipeline.py) with
    # this many microbatches (batch must divide). 0 = plain nn.scan. The
    # param layout is identical either way, so the same checkpoint serves
    # both execution modes.
    pipeline_microbatches: int = 0

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        timestep: jnp.ndarray,
        action_emb: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, f, h, w, _ = hidden_states.shape
        p = self.patch_size
        ph, pw = h // p, w // p
        sv = f * ph * pw

        # patchify video: [b, f, h, w, c] -> [b, f*ph*pw, dim]
        x = hidden_states.reshape(b, f, ph, p, pw, p, -1)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, sv, p * p * hidden_states.shape[-1])
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed_proj")(x)
        if self.sequence_parallel:
            from motionrag_tpu.parallel.sharding import maybe_shard_seq

            x = maybe_shard_seq(x)
        text = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed_text_proj")(
            encoder_hidden_states
        )

        t_emb = Timesteps(self.dim, flip_sin_to_cos=True)(
            jnp.broadcast_to(jnp.asarray(timestep), (b,))
        ).astype(self.dtype)
        temb = TimestepEmbedding(self.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)

        rope = None
        if self.use_rotary_positional_embeddings:
            rope = rope_3d_cache(self.head_dim, f, ph, pw)

        adapter_set = {
            int(site.split(".")[1]) for site in self.adapter_sites
            if site.startswith("transformer_blocks.")
        }

        hidden, enc = x, text
        if self.scan_blocks:
            if adapter_set and len(adapter_set) != self.depth:
                raise ValueError(
                    "scan_blocks requires uniform blocks: adapter_sites must "
                    f"cover all {self.depth} blocks or none, got {len(adapter_set)}"
                )
            pp_mesh = None
            if self.pipeline_microbatches > 0:
                from motionrag_tpu.parallel.sharding import ambient_mesh

                m = ambient_mesh()
                if m is not None and "pp" in m.axis_names and m.shape["pp"] > 1:
                    pp_mesh = m
            if pp_mesh is not None:
                hidden, enc = self._pipelined_blocks(
                    hidden, enc, temb, rope, action_emb, bool(adapter_set), pp_mesh
                )
            else:
                scanned = nn.scan(
                    _ScanBlockCell,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                    length=self.depth,
                )(
                    self.dim, self.heads, self.head_dim, self.time_embed_dim,
                    self.ff_mult,
                    with_adapter=bool(adapter_set),
                    adapter_scale=self.adapter_scale,
                    dtype=self.dtype,
                    sequence_parallel=self.sequence_parallel,
                    sp_attention=self.sp_attention,
                    remat=self.remat,
                    name="transformer_blocks",
                )
                (hidden, enc), _ = scanned((hidden, enc), temb, rope, action_emb)
        else:
            block_cls = CogVideoXBlock
            if self.remat:
                block_cls = nn.remat(CogVideoXBlock, static_argnums=())

            for i in range(self.depth):
                hidden, enc = block_cls(
                    self.dim, self.heads, self.head_dim, self.time_embed_dim,
                    self.ff_mult,
                    with_adapter=i in adapter_set,
                    adapter_scale=self.adapter_scale,
                    dtype=self.dtype,
                    sequence_parallel=self.sequence_parallel,
                    sp_attention=self.sp_attention,
                    name=f"transformer_blocks_{i}",
                )(hidden, enc, temb, rope, action_emb)

        joint = jnp.concatenate([enc, hidden], axis=1)
        joint = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_final")(joint)
        hidden = joint[:, enc.shape[1]:]

        # AdaLayerNorm out: silu(temb) -> (shift, scale); the inner LayerNorm
        # is affine (diffusers AdaLayerNorm norm.weight/bias in released ckpts)
        mod = nn.Dense(2 * self.dim, dtype=self.dtype, name="norm_out_linear")(nn.silu(temb))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        no_s = self.param("norm_out_norm_scale", nn.initializers.ones, (self.dim,))
        no_b = self.param("norm_out_norm_bias", nn.initializers.zeros, (self.dim,))
        hidden = layer_norm(hidden, no_s, no_b) * (1 + scale) + shift
        out = nn.Dense(p * p * self.out_channels, dtype=self.dtype, name="proj_out")(hidden)

        # unpatchify
        out = out.reshape(b, f, ph, pw, p, p, self.out_channels)
        out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, f, h, w, self.out_channels)
        return out

    def _pipelined_blocks(self, hidden, enc, temb, rope, action_emb,
                          with_adapter, mesh):
        """Run the block stack as a GPipe pipeline over the mesh's ``pp``
        axis. The stacked params are declared directly (``self.param``) in
        the exact tree layout ``nn.scan`` produces (``transformer_blocks ->
        block -> ...`` with a leading depth axis), so scan-mode and
        pipeline-mode execution share one checkpoint format."""
        from motionrag_tpu.parallel.pipeline import pipeline_apply

        cell = CogVideoXBlock(
            self.dim, self.heads, self.head_dim, self.time_embed_dim,
            self.ff_mult,
            with_adapter=with_adapter,
            adapter_scale=self.adapter_scale,
            dtype=self.dtype,
            sequence_parallel=self.sequence_parallel,
            sp_attention=self.sp_attention,
        )
        b = hidden.shape[0]
        a_full = None
        if with_adapter and action_emb is not None:
            # pre-broadcast the CFG-batch so every stream in the microbatch
            # pytree shares the leading batch dim
            r = b // action_emb.shape[0]
            a_full = jnp.repeat(action_emb, r, axis=0) if r > 1 else action_emb

        def init_stacked(rng):
            zh = jnp.zeros((1,) + hidden.shape[1:], hidden.dtype)
            ze = jnp.zeros((1,) + enc.shape[1:], enc.dtype)
            zt = jnp.zeros((1,) + temb.shape[1:], temb.dtype)
            za = None if a_full is None else jnp.zeros(
                (1,) + a_full.shape[1:], a_full.dtype
            )
            layers = [
                cell.init(k, zh, ze, zt, rope, za)["params"]
                for k in jax.random.split(rng, self.depth)
            ]
            return {"block": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers)}

        stacked = self.param("transformer_blocks", init_stacked)["block"]

        if a_full is None:
            def layer_fn(p, x):
                h, e, t = x
                h2, e2 = cell.apply({"params": p}, h, e, t, rope)
                return (h2, e2, t)

            carry = (hidden, enc, temb)
        else:
            def layer_fn(p, x):
                h, e, t, a = x
                h2, e2 = cell.apply({"params": p}, h, e, t, rope, a)
                return (h2, e2, t, a)

            carry = (hidden, enc, temb, a_full)
        if self.remat:
            layer_fn = jax.checkpoint(layer_fn)
        out = pipeline_apply(
            layer_fn, stacked, carry, mesh,
            microbatches=self.pipeline_microbatches,
        )
        return out[0], out[1]

    @staticmethod
    def partition_rules(scan_blocks: bool = False):
        """PartitionSpec rules (regex on canonical dotted path -> spec) for
        TP sharding of the 5B model over the ``tp`` mesh axis.

        With ``scan_blocks=True`` the block kernels carry a leading depth
        axis (``transformer_blocks.block.*`` stacked ``[L, in, out]``), so
        the tp axis shifts one dim right; the depth axis itself is the one
        ``parallel/pipeline.py`` shards over ``pp``."""
        from jax.sharding import PartitionSpec as P

        if scan_blocks:
            blk = r".*transformer_blocks.*"
            return [
                (blk + r"(to_q|to_k|to_v|to_q_ip|to_k_ip|to_v_ip)\.kernel",
                 P(None, None, "tp")),
                (blk + r"to_out\.kernel", P(None, "tp", None)),
                (blk + r"ff_in\.kernel", P(None, None, "tp")),
                (blk + r"ff_out\.kernel", P(None, "tp", None)),
                (r".*patch_embed_proj\.kernel", P(None, "tp")),
                (r".*", P()),
            ]
        return [
            (r".*(to_q|to_k|to_v|to_q_ip|to_k_ip|to_v_ip)\.kernel", P(None, "tp")),
            (r".*to_out\.kernel", P("tp", None)),
            (r".*ff_in\.kernel", P(None, "tp")),
            (r".*ff_out\.kernel", P("tp", None)),
            (r".*patch_embed_proj\.kernel", P(None, "tp")),
            (r".*", P()),
        ]

    @staticmethod
    def stack_block_params(params, depth: int):
        """Unrolled-loop layout (``transformer_blocks_{i}`` subtrees — the
        layout checkpoints and the porting converters use) -> scan layout
        (``transformer_blocks.block`` with a leading depth axis)."""
        inner = params["params"] if "params" in params else params
        out = {k: v for k, v in inner.items() if not k.startswith("transformer_blocks_")}
        blocks = [inner[f"transformer_blocks_{i}"] for i in range(depth)]
        out["transformer_blocks"] = {
            "block": jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
        }
        return {"params": out} if "params" in params else out

    @staticmethod
    def unstack_block_params(params, depth: int):
        """Inverse of :meth:`stack_block_params`."""
        inner = params["params"] if "params" in params else params
        out = {k: v for k, v in inner.items() if k != "transformer_blocks"}
        stacked = inner["transformer_blocks"]["block"]
        for i in range(depth):
            out[f"transformer_blocks_{i}"] = jax.tree.map(lambda x: x[i], stacked)
        return {"params": out} if "params" in params else out
