"""Int8 (W8A8) quantized serving for frozen diffusion backbones.

TPU-native capability beyond the reference (which serves every backbone in
bf16 CUDA, reference ``cogvideox/module.py:25``): the v5e/v5p MXU executes
int8 x int8 -> int32 matmuls at 2x the bf16 rate, and int8 weights halve the
HBM footprint of the 5.57B-param CogVideoX DiT (11.1 GB bf16 -> 5.6 GB) —
enough headroom for batched CFG and T5 co-residency on a single 16 GB chip.

Scheme (standard W8A8 dynamic quantization):
  - weights: symmetric per-output-channel int8, scale = absmax/127 (fp32),
    computed once from the loaded checkpoint;
  - activations: symmetric per-token (per row of the matmul) int8, scales
    computed on the fly — a cheap VPU reduction XLA fuses into the
    surrounding elementwise work;
  - accumulation in int32 on the MXU, rescale in fp32, bias in fp32.

Only 2-D ``nn.Dense`` kernels are quantized (attention/MLP projections — the
FLOPs). Convolutions, norms, adaLN modulation projections, and adapter
branches stay in bf16 (quality-critical, negligible FLOPs).

Execution is routed through a Flax method interceptor rather than swapping
module classes: ``quantized_calls()`` makes every bound ``nn.Dense`` whose
params carry a ``kernel_scale`` leaf run the int8 path, so an unchanged
model definition serves quantized checkpoints (mirroring how the reference's
config surface never names dtypes per layer).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionrag_tpu.training.optim import path_tokens, pattern_matches


def np_prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out

__all__ = [
    "quantize_dense_tree",
    "quantized_calls",
    "dense_quant_bytes",
    "QuantizedTreeCache",
]


class QuantizedTreeCache:
    """Memoizes the int8 copy of a params tree across eval calls.

    Keyed by the *identity* of the tree's first leaf plus the leaf count.
    The anchor leaf is held with a strong reference, so CPython can never
    reuse its address while the cache is alive — an ``is`` comparison is
    therefore sound (a plain ``id()`` key can collide after the old tree is
    garbage-collected and a fresh leaf lands at the recycled address,
    silently serving stale quantized weights, e.g. across LoRA-merged eval
    epochs). Cost: one extra fp leaf kept alive alongside the int8 tree.
    """

    def __init__(self):
        self._anchor = None
        self._n = -1
        self._value = None

    @property
    def tree(self):
        """The current quantized tree (None before the first get)."""
        return self._value

    def get(self, tree, include, exclude):
        leaves = jax.tree_util.tree_leaves(tree)
        anchor = leaves[0] if leaves else None
        if (
            self._value is not None
            and anchor is self._anchor
            and len(leaves) == self._n
        ):
            return self._value
        self._value = jax.jit(
            quantize_dense_tree, static_argnames=("include", "exclude")
        )(tree, include=include, exclude=exclude)
        self._anchor = anchor
        self._n = len(leaves)
        return self._value

_EPS = 1e-8


def _canon_pattern(pattern: str) -> str:
    """Canonicalize a dotted config pattern through the same token splitter
    used for param paths ('norm1_linear' -> 'norm1.linear'), so patterns can
    be written in natural module-name form."""
    return ".".join(path_tokens(pattern.split(".")))


def quantize_kernel(kernel: jnp.ndarray, in_axis: int = 0):
    """fp kernel -> (int8 kernel, fp32 per-out-channel scale), reducing over
    ``in_axis``. 2-D ``[in, out]`` gives scale ``[out]``; stacked scanned
    layers ``[L, in, out]`` (``in_axis=1``) give scale ``[L, out]`` — which
    ``nn.scan``'s per-layer slicing turns back into ``[out]`` inside the
    block, so the serving interceptor needs no layout awareness."""
    k = kernel.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=in_axis), _EPS) / 127.0
    q = jnp.clip(
        jnp.round(k / jnp.expand_dims(scale, in_axis)), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_dense_tree(
    tree,
    include: Sequence[str] = ("*",),
    exclude: Sequence[str] = (),
    stacked: Sequence[str] = ("transformer_blocks.block",),
    _prefix: tuple = (),
):
    """Replace matching 2-D Dense kernels in a variables/params pytree with
    ``{kernel: int8, kernel_scale: fp32[out]}``.

    ``include``/``exclude`` are reference-style dotted module patterns
    (``training/optim.py`` semantics: prefix match, ``*`` wildcard segment).
    Already-quantized leaves and non-2-D kernels are left untouched — except
    under ``stacked`` paths (the DiT's ``scan_blocks`` layout, where Dense
    kernels carry a leading depth axis ``[L, in, out]``), which quantize with
    a per-layer-per-channel ``[L, out]`` scale. ``stacked`` is an explicit
    opt-in list because 3-D kernels elsewhere are real Conv1ds. The returned
    tree is new; the input is not mutated. Pure in the array leaves, so the
    transform itself can be ``jax.jit``-ed for a one-launch device
    conversion.
    """
    inc = [_canon_pattern(p) for p in include]
    exc = [_canon_pattern(p) for p in exclude]
    stk = [_canon_pattern(p) for p in stacked]

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            out[name] = walk(child, path + (name,)) if isinstance(child, dict) else child
        kernel = out.get("kernel")
        if (
            kernel is not None
            and not isinstance(kernel, dict)
            and "kernel_scale" not in out
            and jnp.issubdtype(jnp.asarray(kernel).dtype, jnp.floating)
        ):
            toks = path_tokens(path)
            nd = getattr(kernel, "ndim", 0)
            is_stacked = nd == 3 and any(pattern_matches(toks, p) for p in stk)
            if (
                (nd == 2 or is_stacked)
                and any(pattern_matches(toks, p) for p in inc)
                and not any(pattern_matches(toks, p) for p in exc)
            ):
                q, scale = quantize_kernel(kernel, in_axis=1 if is_stacked else 0)
                out["kernel"] = q
                out["kernel_scale"] = scale
        return out

    return walk(tree, tuple(_prefix))


def quantize_dense_tree_lowmem(
    tree,
    include: Sequence[str] = ("*",),
    exclude: Sequence[str] = (),
):
    """Like :func:`quantize_dense_tree` but subtree-by-subtree, DELETING the
    source device buffers as it goes — peak extra HBM is one subtree instead
    of a full int8 copy. This is how a 11 GB bf16 checkpoint quantizes on a
    16 GB chip. The input tree's arrays are dead afterwards; use only the
    returned tree."""

    jq = jax.jit(
        quantize_dense_tree,
        static_argnames=("include", "exclude", "stacked", "_prefix"),
    )

    def convert(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if isinstance(child, dict):
                q = jq(child, include=include, exclude=exclude, _prefix=path + (name,))
                jax.block_until_ready(q)
                for leaf in jax.tree_util.tree_leaves(child):
                    if hasattr(leaf, "delete"):
                        leaf.delete()
                out[name] = q
            else:
                out[name] = child
        return out

    # descend through single-child wrapper levels ('params') so the unit of
    # work is one module subtree, then convert its children one by one
    if isinstance(tree, dict) and set(tree) == {"params"}:
        return {"params": convert(tree["params"], ("params",))}
    return convert(tree, ())


def dense_quant_bytes(tree) -> tuple[int, int]:
    """(quantized_kernel_bytes, total_param_bytes) — for footprint reporting."""
    qb = tb = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        n = leaf.size * leaf.dtype.itemsize
        tb += n
        if leaf.dtype == jnp.int8:
            qb += n
    return qb, tb


def _int8_dense(mod: nn.Dense, x: jnp.ndarray) -> jnp.ndarray:
    import os

    kernel = mod.get_variable("params", "kernel")          # int8 [in, out]
    k_scale = mod.get_variable("params", "kernel_scale")   # f32 [out]
    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), _EPS) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    out_dtype = mod.dtype or x.dtype
    bias = mod.get_variable("params", "bias") if mod.use_bias else None

    # fused Pallas path (ops/int8_matmul.py). Measured SLOWER than the XLA
    # s8xs8->s32 lowering at every DiT shape on the real v5e (2026-08-19,
    # tools/bench_int8_gemm.py: 130-172 vs 236-330 TFLOP/s) — XLA already
    # fuses the dequant epilogue and its auto-tiling wins. Kept opt-in
    # (MRT_INT8_PALLAS=1) as a reference kernel only; the default serving
    # path below is the fast one.
    if (
        kernel.ndim == 2
        and jax.default_backend() == "tpu"
        and os.environ.get("MRT_INT8_PALLAS", "0") == "1"
    ):
        from motionrag_tpu.ops.int8_matmul import (
            int8_matmul_dequant, pallas_int8_supported)

        lead = xq.shape[:-1]
        m = int(np_prod(lead))
        k, n = kernel.shape
        if m >= 256 and pallas_int8_supported(m, k, n):
            y = int8_matmul_dequant(
                xq.reshape(m, k), kernel, a_scale.reshape(m, 1), k_scale,
                bias, out_dtype=out_dtype)
            return y.reshape(*lead, n)

    y = jax.lax.dot_general(
        xq, kernel,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * a_scale * k_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if (
        context.method_name == "__call__"
        and type(mod) is nn.Dense
        and mod.has_variable("params", "kernel_scale")
    ):
        return _int8_dense(mod, args[0])
    return next_fun(*args, **kwargs)


@contextmanager
def quantized_calls():
    """Context under which ``module.apply`` runs int8-quantized Dense layers
    (those whose params carry a ``kernel_scale`` leaf). A no-op for
    unquantized trees."""
    with nn.intercept_methods(_interceptor):
        yield
