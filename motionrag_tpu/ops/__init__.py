from motionrag_tpu.ops.posemb import (
    sinusoid_table,
    timestep_embedding,
    rope_cache,
    apply_rope,
)
from motionrag_tpu.ops.attention import dot_product_attention, block_causal_mask
from motionrag_tpu.ops.norms import group_norm, layer_norm, rms_norm
from motionrag_tpu.ops.quant import (
    quantize_dense_tree,
    quantize_dense_tree_lowmem,
    quantized_calls,
)

__all__ = [
    "quantize_dense_tree",
    "quantize_dense_tree_lowmem",
    "quantized_calls",
    "sinusoid_table",
    "timestep_embedding",
    "rope_cache",
    "apply_rope",
    "dot_product_attention",
    "block_causal_mask",
    "group_norm",
    "layer_norm",
    "rms_norm",
]
