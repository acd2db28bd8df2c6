"""scan_blocks mode of the CogVideoX DiT: one nn.scan'd block must be
numerically identical to the unrolled 42-copy loop (here at toy depth), the
param-layout converters must round-trip, and the stacked layout must pipeline
over a pp mesh to the same output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D


def _toy_dit(scan_blocks, adapters=False, depth=4):
    sites = tuple(f"transformer_blocks.{i}.attn1.processor" for i in range(depth)) if adapters else ()
    return CogVideoXTransformer3D(
        in_channels=8, out_channels=4, dim=32, depth=depth, heads=2, head_dim=16,
        text_embed_dim=16, time_embed_dim=24, adapter_sites=sites,
        dtype=jnp.float32, scan_blocks=scan_blocks,
    )


@pytest.mark.parametrize("adapters", [False, True])
def test_scan_blocks_matches_loop(rng, adapters):
    depth = 4
    loop = _toy_dit(False, adapters, depth)
    scan = _toy_dit(True, adapters, depth)

    sample = jnp.asarray(rng.standard_normal((2, 3, 4, 4, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    action = (
        jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32) if adapters else None
    )

    p_loop = loop.init(jax.random.key(0), sample, text, t, action)
    p_scan = CogVideoXTransformer3D.stack_block_params(p_loop, depth)

    out_loop = loop.apply(p_loop, sample, text, t, action)
    out_scan = scan.apply(p_scan, sample, text, t, action)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), rtol=1e-5, atol=1e-5
    )


def test_block_param_layout_roundtrip(rng):
    depth = 3
    loop = _toy_dit(False, depth=depth)
    sample = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    t = jnp.asarray([0], jnp.int32)
    p = loop.init(jax.random.key(1), sample, text, t)
    back = CogVideoXTransformer3D.unstack_block_params(
        CogVideoXTransformer3D.stack_block_params(p, depth), depth
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        back,
        p,
    )


def test_scan_init_layout_matches_stacked(rng):
    """Directly initializing a scan_blocks module yields the same tree
    structure/shapes as stacking a loop init."""
    depth = 3
    scan = _toy_dit(True, depth=depth)
    loop = _toy_dit(False, depth=depth)
    sample = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    t = jnp.asarray([0], jnp.int32)
    p_scan = scan.init(jax.random.key(2), sample, text, t)
    p_stacked = CogVideoXTransformer3D.stack_block_params(
        loop.init(jax.random.key(2), sample, text, t), depth
    )
    assert jax.tree.structure(p_scan) == jax.tree.structure(p_stacked)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
                 p_scan, p_stacked)


def test_checkpoint_layout_adaptation_both_ways(rng, tmp_path):
    """One released artifact serves both execution modes: a loop-layout
    checkpoint restores into a scan_blocks param tree (auto-stacked) and a
    scan-layout checkpoint restores into a loop tree (auto-unstacked),
    including strict=False partial (incremental) checkpoints."""
    from motionrag_tpu.training.checkpoints import (
        adapt_block_layout,
        merge_into,
        restore_into,
        save_checkpoint,
    )

    depth = 3
    loop = _toy_dit(False, depth=depth)
    sample = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    t = jnp.asarray([0], jnp.int32)
    p_loop = loop.init(jax.random.key(3), sample, text, t)
    p_scan = CogVideoXTransformer3D.stack_block_params(p_loop, depth)

    # loop checkpoint -> scan template
    ck = tmp_path / "loop_ck"
    save_checkpoint(ck, p_loop)
    zero_scan = jax.tree.map(jnp.zeros_like, p_scan)
    merged = restore_into(ck, zero_scan)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        merged, p_scan,
    )

    # scan checkpoint -> loop template
    ck2 = tmp_path / "scan_ck"
    save_checkpoint(ck2, p_scan)
    zero_loop = jax.tree.map(jnp.zeros_like, p_loop)
    merged2 = restore_into(ck2, zero_loop)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        merged2, p_loop,
    )

    # incremental (pruned) checkpoint: only to_q trainable in every block
    pruned = jax.tree_util.tree_map_with_path(
        lambda path, x: x if any(
            getattr(k, "key", None) == "to_q" for k in path
        ) else None,
        p_loop,
    )
    adapted = adapt_block_layout(p_scan["params"], pruned["params"])
    blk = adapted["transformer_blocks"]["block"]
    assert blk["to_q"]["kernel"].shape[0] == depth
    assert blk["ff_in"]["kernel"] is None


def test_scan_blocks_rejects_partial_adapters():
    dit = CogVideoXTransformer3D(
        in_channels=8, out_channels=4, dim=32, depth=4, heads=2, head_dim=16,
        text_embed_dim=16, time_embed_dim=24,
        adapter_sites=("transformer_blocks.0.attn1.processor",),
        scan_blocks=True,
    )
    with pytest.raises(ValueError, match="uniform"):
        dit.init(
            jax.random.key(0),
            jnp.zeros((1, 3, 4, 4, 8)),
            jnp.zeros((1, 5, 16)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 6, 32)),
        )


@pytest.mark.parametrize("adapters", [False, True])
def test_pipeline_microbatches_matches_loop(rng, adapters):
    """Config-reachable pipeline parallelism on the real DiT: with an ambient
    pp mesh, scan_blocks + pipeline_microbatches executes the block stack as
    a GPipe pipeline — same checkpoint layout, same output as the unrolled
    loop."""
    from motionrag_tpu.parallel import MeshConfig, build_mesh

    depth = 4
    loop = _toy_dit(False, adapters, depth)
    pipe_kw = dict(
        in_channels=8, out_channels=4, dim=32, depth=depth, heads=2,
        head_dim=16, text_embed_dim=16, time_embed_dim=24,
        adapter_sites=tuple(
            f"transformer_blocks.{i}.attn1.processor" for i in range(depth)
        ) if adapters else (),
        dtype=jnp.float32, scan_blocks=True, pipeline_microbatches=2,
    )
    pipe = CogVideoXTransformer3D(**pipe_kw)

    sample = jnp.asarray(rng.standard_normal((4, 3, 4, 4, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((4, 5, 16)), jnp.float32)
    t = jnp.asarray([1, 2, 3, 4], jnp.int32)
    action = (
        jnp.asarray(rng.standard_normal((4, 6, 32)), jnp.float32) if adapters else None
    )

    p_loop = loop.init(jax.random.key(0), sample, text, t, action)
    p_scan = CogVideoXTransformer3D.stack_block_params(p_loop, depth)
    out_loop = loop.apply(p_loop, sample, text, t, action)

    mesh = build_mesh(MeshConfig(pp=2, dp=4))
    with mesh:
        out_pp = pipe.apply(p_scan, sample, text, t, action)
    np.testing.assert_allclose(
        np.asarray(out_pp), np.asarray(out_loop), rtol=1e-5, atol=1e-5
    )
    # without an ambient pp mesh the same module falls back to nn.scan
    out_scan = pipe.apply(p_scan, sample, text, t, action)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), rtol=1e-5, atol=1e-5
    )
    # init in pipeline mode produces the same tree layout (checkpoint compat)
    with mesh:
        p_init = pipe.init(jax.random.key(1), sample, text, t, action)
    assert jax.tree.structure(p_init) == jax.tree.structure(p_scan)


def test_trainable_patterns_select_adapters_in_scan_layout(rng):
    """Reference-style trainable patterns keep working against the scanned
    param tree: `transformer_blocks.*.processor` selects exactly the adapter
    branch leaves (to_q_ip/to_k_ip/to_v_ip) whether the blocks are unrolled
    or stacked."""
    from motionrag_tpu.training.optim import trainable_mask

    depth = 2
    scan = _toy_dit(True, adapters=True, depth=depth)
    sample = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    action = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    p = scan.init(jax.random.key(0), sample, text, jnp.zeros((1,), jnp.int32), action)

    mask = trainable_mask(p, ["transformer_blocks.*.processor"])
    flat = jax.tree_util.tree_leaves_with_path(mask)
    selected = {
        ".".join(str(getattr(k, "key", k)) for k in path)
        for path, m in flat if m
    }
    assert selected, "no adapter params selected in scan layout"
    assert all(any(s in name for s in ("to_q_ip", "to_k_ip", "to_v_ip"))
               for name in selected), selected
    n_adapter = sum(1 for _, m in flat if m)
    assert n_adapter == 3  # q/k/v ip kernels (bias-free), stacked over depth


def test_scanned_partition_rules_fit_stacked_leaves(rng):
    """scan-layout TP rules shard the stacked kernels on the correct dim."""
    from motionrag_tpu.parallel import MeshConfig, build_mesh
    from motionrag_tpu.parallel.sharding import apply_partition_rules

    depth = 2
    scan = _toy_dit(True, depth=depth)
    sample = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    p = scan.init(jax.random.key(0), sample, text, jnp.zeros((1,), jnp.int32))
    mesh = build_mesh(MeshConfig(dp=4, tp=2))
    rules = CogVideoXTransformer3D.partition_rules(scan_blocks=True)
    shardings = apply_partition_rules(p, rules, mesh)
    # every sharding must be placeable (no rank/divisibility errors)
    placed = jax.tree.map(jax.device_put, p, shardings)
    jax.block_until_ready(placed)
    blk = placed["params"]["transformer_blocks"]["block"]
    spec = blk["to_q"]["kernel"].sharding.spec
    assert tuple(spec) == (None, None, "tp")
