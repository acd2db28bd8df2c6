"""Int8 W8A8 quantized serving (ops/quant.py).

Covers: tree transform selection semantics, numerical closeness of the
int8 Dense path, footprint halving, and the DiT-level wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from motionrag_tpu.ops import quant


def _dense_tree(rng, din=64, dout=96):
    mod = nn.Dense(dout, dtype=jnp.float32)
    x = jax.random.normal(rng, (8, din), jnp.float32)
    params = mod.init(jax.random.fold_in(rng, 1), x)
    return mod, params, x


def test_quantize_dense_tree_selects_and_converts():
    rng = jax.random.PRNGKey(0)
    k = jax.random.normal(rng, (32, 48), jnp.float32)
    tree = {
        "params": {
            "transformer_blocks_3": {"to_q": {"kernel": k, "bias": jnp.zeros((48,))}},
            "norm1_linear": {"kernel": k},
            "conv": {"kernel": jnp.zeros((3, 3, 8, 8))},  # non-2D: untouched
        }
    }
    out = quant.quantize_dense_tree(
        tree, include=("transformer_blocks",), exclude=("norm1_linear",)
    )
    q = out["params"]["transformer_blocks_3"]["to_q"]
    assert q["kernel"].dtype == jnp.int8
    assert q["kernel_scale"].shape == (48,)
    assert q["bias"].dtype != jnp.int8
    assert out["params"]["norm1_linear"]["kernel"].dtype == jnp.float32
    assert out["params"]["conv"]["kernel"].shape == (3, 3, 8, 8)
    assert out["params"]["conv"]["kernel"].dtype != jnp.int8
    # input not mutated
    assert tree["params"]["transformer_blocks_3"]["to_q"]["kernel"].dtype == jnp.float32
    # idempotent
    again = quant.quantize_dense_tree(out, include=("transformer_blocks",))
    assert again["params"]["transformer_blocks_3"]["to_q"]["kernel"].dtype == jnp.int8


def test_underscore_pattern_canonicalization():
    """Patterns written with natural names ('norm1_linear') must match the
    digit-split path tokens."""
    k = jnp.ones((8, 8), jnp.float32)
    tree = {"norm1_linear": {"kernel": k}, "ff_in": {"kernel": k}}
    out = quant.quantize_dense_tree(tree, include=("*",), exclude=("*.norm1_linear",))
    assert out["norm1_linear"]["kernel"].dtype == jnp.float32
    assert out["ff_in"]["kernel"].dtype == jnp.int8


def test_int8_dense_close_to_exact():
    rng = jax.random.PRNGKey(2)
    mod, params, x = _dense_tree(rng)
    exact = mod.apply(params, x)
    qparams = quant.quantize_dense_tree(params)
    with quant.quantized_calls():
        approx = mod.apply(qparams, x)
    assert approx.dtype == exact.dtype
    err = np.linalg.norm(np.asarray(approx - exact)) / np.linalg.norm(np.asarray(exact))
    assert err < 0.02, err
    # quantization noise must actually be present (int8 path taken)
    assert float(jnp.abs(approx - exact).max()) > 0


def test_quantized_calls_noop_without_scales():
    rng = jax.random.PRNGKey(3)
    mod, params, x = _dense_tree(rng)
    exact = mod.apply(params, x)
    with quant.quantized_calls():
        same = mod.apply(params, x)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(same))


def test_footprint_halves():
    rng = jax.random.PRNGKey(4)
    _, params, _ = _dense_tree(rng, din=256, dout=256)
    qb0, tb0 = quant.dense_quant_bytes(params)
    assert qb0 == 0
    qparams = quant.quantize_dense_tree(params)
    qb, tb = quant.dense_quant_bytes(qparams)
    assert qb > 0 and tb < tb0 * 0.3 + 2048  # f32 kernel -> int8 (+scales)


def test_cogvideox_dit_quantized_forward():
    """Tiny DiT: quantized serving output stays close to the bf16 reference;
    adaLN modulation and adapter branches stay unquantized."""
    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
    from motionrag_tpu.models.cogvideox.module import cogvideox_quant_patterns

    model = CogVideoXTransformer3D(
        in_channels=8, out_channels=4, dim=64, depth=2, heads=4, head_dim=16,
        text_embed_dim=32, time_embed_dim=32, dtype=jnp.float32,
        adapter_sites=("transformer_blocks.1",),
    )
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (1, 2, 8, 8, 8), jnp.float32)
    text = jax.random.normal(jax.random.fold_in(rng, 1), (1, 7, 32), jnp.float32)
    action = jax.random.normal(jax.random.fold_in(rng, 2), (1, 5, 64), jnp.float32)
    t = jnp.array([10])
    params = model.init(jax.random.fold_in(rng, 3), x, text, t, action_emb=action)

    include, exclude = cogvideox_quant_patterns()
    qparams = quant.quantize_dense_tree(params, include, exclude)

    blk = qparams["params"]["transformer_blocks_0"]
    assert blk["to_q"]["kernel"].dtype == jnp.int8
    assert blk["ff_in"]["kernel"].dtype == jnp.int8
    assert blk["norm1_linear"]["kernel"].dtype != jnp.int8
    adapter = qparams["params"]["transformer_blocks_1"]
    assert adapter["to_q_ip"]["kernel"].dtype != jnp.int8

    exact = model.apply(params, x, text, t, action_emb=action)
    with quant.quantized_calls():
        approx = model.apply(qparams, x, text, t, action_emb=action)
    assert np.isfinite(np.asarray(approx)).all()
    err = np.linalg.norm(np.asarray(approx - exact)) / np.linalg.norm(np.asarray(exact))
    assert err < 0.1, err


def test_scan_blocks_quantized_forward_matches_loop_quant():
    """int8 serving composes with the scan_blocks layout: stacked [L,in,out]
    kernels quantize with [L,out] scales (nn.scan slices both per layer), the
    adaLN/adapter exclusions still apply, and the scanned int8 forward agrees
    with the unrolled int8 forward."""
    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
    from motionrag_tpu.models.cogvideox.module import cogvideox_quant_patterns

    depth = 2
    common = dict(
        in_channels=8, out_channels=4, dim=64, depth=depth, heads=4,
        head_dim=16, text_embed_dim=32, time_embed_dim=32, dtype=jnp.float32,
        adapter_sites=tuple(f"transformer_blocks.{i}" for i in range(depth)),
    )
    loop = CogVideoXTransformer3D(**common)
    scan = CogVideoXTransformer3D(**common, scan_blocks=True)

    rng = jax.random.PRNGKey(9)
    x = jax.random.normal(rng, (1, 2, 8, 8, 8), jnp.float32)
    text = jax.random.normal(jax.random.fold_in(rng, 1), (1, 7, 32), jnp.float32)
    action = jax.random.normal(jax.random.fold_in(rng, 2), (1, 5, 64), jnp.float32)
    t = jnp.array([10])
    p_loop = loop.init(jax.random.fold_in(rng, 3), x, text, t, action_emb=action)
    p_scan = CogVideoXTransformer3D.stack_block_params(p_loop, depth)

    include, exclude = cogvideox_quant_patterns()
    q_loop = quant.quantize_dense_tree(p_loop, include, exclude)
    q_scan = quant.quantize_dense_tree(p_scan, include, exclude)

    blk = q_scan["params"]["transformer_blocks"]["block"]
    assert blk["to_q"]["kernel"].dtype == jnp.int8
    assert blk["to_q"]["kernel"].shape[0] == depth
    assert blk["to_q"]["kernel_scale"].shape == (depth, 64)
    assert blk["norm1_linear"]["kernel"].dtype != jnp.int8   # adaLN excluded
    assert blk["to_q_ip"]["kernel"].dtype != jnp.int8        # adapter excluded

    # stacked quantization == per-layer quantization of the same kernels
    per_layer = q_loop["params"]["transformer_blocks_0"]["to_q"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(blk["to_q"]["kernel"][0]), np.asarray(per_layer)
    )

    with quant.quantized_calls():
        out_loop = loop.apply(q_loop, x, text, t, action_emb=action)
        out_scan = scan.apply(q_scan, x, text, t, action_emb=action)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), rtol=1e-4, atol=1e-4
    )


def test_lowmem_blockwise_quantize_matches():
    """quantize_dense_tree_lowmem: same result tree as the one-shot
    transform; source buffers are deleted."""
    from motionrag_tpu.models.cogvideox.dit import CogVideoXBlock

    blk = CogVideoXBlock(dim=32, heads=2, head_dim=16, time_embed_dim=16,
                         dtype=jnp.float32)
    rng = jax.random.PRNGKey(7)
    h = jax.random.normal(rng, (1, 6, 32), jnp.float32)
    e = jax.random.normal(jax.random.fold_in(rng, 1), (1, 3, 32), jnp.float32)
    temb = jax.random.normal(jax.random.fold_in(rng, 2), (1, 16), jnp.float32)
    params = blk.init(jax.random.fold_in(rng, 3), h, e, temb)
    params2 = jax.tree.map(lambda x: x + 0, params)  # independent buffers

    oneshot = quant.quantize_dense_tree(params, include=("*",), exclude=("*.norm1_linear",))
    lowmem = quant.quantize_dense_tree_lowmem(params2, include=("*",), exclude=("*.norm1_linear",))
    flat1 = jax.tree_util.tree_leaves_with_path(oneshot)
    flat2 = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(lowmem)}
    assert len(flat1) == len(flat2)
    for p, v in flat1:
        w = flat2[jax.tree_util.keystr(p)]
        assert v.dtype == w.dtype, p
        if v.dtype == jnp.int8:
            # jit/unjit scale rounding can shift a value at a .5 boundary
            assert np.abs(np.asarray(v, np.int32) - np.asarray(w, np.int32)).max() <= 1
        else:
            np.testing.assert_allclose(
                np.asarray(v, np.float64), np.asarray(w, np.float64), rtol=1e-5
            )
    # source buffers were released
    assert any(l.is_deleted() for l in jax.tree_util.tree_leaves(params2))


def test_quantize_checkpoint_tool(tmp_path):
    """tools/quantize_checkpoint.py: Orbax ckpt -> int8 Orbax ckpt that the
    quantized pipeline serves directly (no startup transform)."""
    import subprocess
    import sys

    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
    from motionrag_tpu.training.checkpoints import restore_checkpoint, save_checkpoint

    model = CogVideoXTransformer3D(
        in_channels=8, out_channels=4, dim=64, depth=2, heads=4, head_dim=16,
        text_embed_dim=32, time_embed_dim=32, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(8)
    x = jax.random.normal(rng, (1, 2, 8, 8, 8), jnp.float32)
    text = jax.random.normal(jax.random.fold_in(rng, 1), (1, 7, 32), jnp.float32)
    t = jnp.array([3])
    params = model.init(jax.random.fold_in(rng, 2), x, text, t)
    save_checkpoint(tmp_path / "src", {"transformer": params})

    out = subprocess.run(
        [sys.executable, "tools/quantize_checkpoint.py",
         "--ckpt", str(tmp_path / "src"), "--out", str(tmp_path / "dst"),
         "--family", "cogvideox"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert "quantized" in out.stderr
    assert "no kernels matched" not in out.stderr

    restored = restore_checkpoint(tmp_path / "dst")
    qp = restored["transformer"]
    blk = qp["params"]["transformer_blocks_0"]
    assert np.asarray(blk["to_q"]["kernel"]).dtype == np.int8
    assert np.asarray(blk["norm1_linear"]["kernel"]).dtype != np.int8
    # the quantized artifact serves directly under quantized_calls
    exact = model.apply(params, x, text, t)
    with quant.quantized_calls():
        served = model.apply(jax.tree.map(jnp.asarray, qp), x, text, t)
    err = np.linalg.norm(np.asarray(served - exact)) / np.linalg.norm(np.asarray(exact))
    assert err < 0.1, err


def test_int8_dot_reaches_compiler():
    """The quantized Dense must lower to an s8 x s8 -> s32 dot in the HLO —
    a silent float upcast would forfeit the 2x MXU int8 rate."""
    rng = jax.random.PRNGKey(9)
    mod, params, x = _dense_tree(rng)
    qparams = quant.quantize_dense_tree(params)

    def fn(p, x):
        with quant.quantized_calls():
            return mod.apply(p, x)

    hlo = jax.jit(fn).lower(qparams, x).as_text()
    dot_lines = [l for l in hlo.splitlines() if "dot_general" in l]
    assert any("xi8>" in l and "xi32>" in l for l in dot_lines), dot_lines


def test_quantized_dit_tensor_parallel_equivalence():
    """int8 serving composes with TP sharding: the quantized DiT forward
    with params sharded by the tp partition rules equals the unsharded
    quantized forward (kernel_scale leaves default to replicated)."""
    from jax.sharding import Mesh

    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
    from motionrag_tpu.models.cogvideox.module import cogvideox_quant_patterns
    from motionrag_tpu.parallel.sharding import shard_params

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.array(devs[:4]), ("tp",))

    dit = CogVideoXTransformer3D(
        in_channels=8, out_channels=4, dim=32, depth=2, heads=4, head_dim=8,
        text_embed_dim=16, time_embed_dim=32, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(11)
    x = jax.random.normal(rng, (1, 2, 8, 8, 8), jnp.float32)
    text = jax.random.normal(jax.random.fold_in(rng, 1), (1, 6, 16), jnp.float32)
    t = jnp.asarray([3], jnp.int32)
    params = dit.init(jax.random.fold_in(rng, 2), x, text, t)
    include, exclude = cogvideox_quant_patterns()
    qparams = quant.quantize_dense_tree(params, include, exclude)

    def fwd(p, x, c, t):
        with quant.quantized_calls():
            return dit.apply(p, x, c, t)

    ref = fwd(qparams, x, text, t)
    sharded = shard_params(qparams, CogVideoXTransformer3D.partition_rules(), mesh)
    with mesh:
        out = jax.jit(fwd)(sharded, x, text, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_quantized_tree_jits():
    """The transform is pure in the leaves: one jitted launch device-side."""
    rng = jax.random.PRNGKey(6)
    _, params, _ = _dense_tree(rng)
    jitted = jax.jit(quant.quantize_dense_tree, static_argnames=("include", "exclude"))
    out = jitted(params)
    assert out["params"]["kernel"].dtype == jnp.int8


def test_quantized_tree_cache_invalidates_on_new_tree():
    """QuantizedTreeCache must recompute when a structurally identical but
    value-different tree arrives (regression: an id()-keyed cache could
    serve stale int8 weights after address reuse)."""
    cache = quant.QuantizedTreeCache()
    t1 = {"params": {"kernel": jnp.ones((4, 4), jnp.float32)}}
    q1 = cache.get(t1, include=("*",), exclude=())
    assert cache.get(t1, include=("*",), exclude=()) is q1  # hit on same tree
    t2 = {"params": {"kernel": 2.0 * jnp.ones((4, 4), jnp.float32)}}
    q2 = cache.get(t2, include=("*",), exclude=())
    assert q2 is not q1
    assert float(q2["params"]["kernel_scale"][0]) != float(
        q1["params"]["kernel_scale"][0]
    )


def test_pallas_int8_matmul_matches_xla_path():
    """The fused Pallas kernel (interpret mode on CPU) must reproduce the
    XLA W8A8 math: same int8 operands, same fp32 rescale + bias epilogue.
    Exact s32 accumulation means the only divergence is fp32-multiply
    rounding order in the epilogue — tolerance per the jit-vs-unjit note in
    CLAUDE.md."""
    from motionrag_tpu.ops.int8_matmul import int8_matmul_dequant

    rng = jax.random.PRNGKey(0)
    m, k, n = 300, 512, 512  # m deliberately NOT a block multiple (pad path)
    x = jax.random.normal(rng, (m, k), jnp.float32)
    kern = jax.random.normal(jax.random.fold_in(rng, 1), (k, n), jnp.float32)
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (n,), jnp.float32)

    kq, ks = quant.quantize_kernel(kern)
    a = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / a), -127, 127).astype(jnp.int8)

    ref = jax.lax.dot_general(
        xq, kq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * a * ks + bias

    got = int8_matmul_dequant(
        xq, kq, a, ks, bias, out_dtype=jnp.float32,
        block_m=128, block_n=256, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6,
                               atol=2e-5)


def test_pallas_int8_matmul_no_bias_bf16_out():
    from motionrag_tpu.ops.int8_matmul import int8_matmul_dequant

    rng = jax.random.PRNGKey(3)
    m, k, n = 256, 256, 512
    x = jax.random.normal(rng, (m, k), jnp.float32)
    kern = jax.random.normal(jax.random.fold_in(rng, 1), (k, n), jnp.float32)
    kq, ks = quant.quantize_kernel(kern)
    a = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / a), -127, 127).astype(jnp.int8)

    ref = (jax.lax.dot_general(
        xq, kq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * a * ks).astype(jnp.bfloat16)
    got = int8_matmul_dequant(xq, kq, a, ks, None, out_dtype=jnp.bfloat16,
                              block_m=128, block_n=256, block_k=128,
                              interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=1e-2)
