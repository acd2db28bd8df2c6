"""scan_blocks mode of the ViT encoders (vit.py): one nn.scan'd block must
be numerically identical to the unrolled loop for every variant (incl. the
penultimate tap, carried through the scan), and adapt_block_layout must
convert an unrolled checkpoint into the scanned tree (so the HF-ported
encoder weights serve both layouts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.models.encoders.vit import VisionTransformer
from motionrag_tpu.training.checkpoints import adapt_block_layout


def _vits(variant, **kw):
    base = dict(variant=variant, image_size=28, patch_size=14, num_frames=4,
                tubelet_size=2, dim=32, depth=3, heads=2, dtype=jnp.float32,
                **kw)
    return (VisionTransformer(**base),
            VisionTransformer(scan_blocks=True, **base))


def _input(rng, variant):
    if variant.startswith("videomae"):
        return jnp.asarray(rng.standard_normal((2, 4, 3, 28, 28)), jnp.float32)
    return jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)


@pytest.mark.parametrize("variant", ["clip", "dino", "videomae", "videomae2"])
def test_vit_scan_matches_loop(rng, variant):
    kw = {"layerscale_init": 1e-5} if variant == "dino" else {}
    loop, scan = _vits(variant, **kw)
    x = _input(rng, variant)
    p_loop = loop.init(jax.random.key(0), x)
    p_scan = scan.init(jax.random.key(0), x)
    # the adapter converts the unrolled tree into the scanned layout
    p_conv = adapt_block_layout(p_scan, jax.tree.map(np.asarray, p_loop))
    chex_tree = jax.tree.map(lambda a, b: a.shape == b.shape, p_scan, p_conv)
    assert all(jax.tree.leaves(chex_tree))
    out_loop = loop.apply(p_loop, x)
    out_scan = scan.apply(p_conv, x)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               rtol=1e-5, atol=1e-5)


def test_vit_scan_penultimate_tap(rng):
    loop, scan = _vits("clip")
    x = _input(rng, "clip")
    p_loop = loop.init(jax.random.key(0), x)
    p_conv = adapt_block_layout(
        scan.init(jax.random.key(0), x), jax.tree.map(np.asarray, p_loop))
    ref = loop.apply(p_loop, x, penultimate=True)
    got = scan.apply(p_conv, x, penultimate=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_embedder_scan_flag_threads(rng):
    """DINO/VideoMAE embedders expose scan_blocks and produce the same
    tokens either way (adapter-converted params)."""
    from motionrag_tpu.models.encoders.condition import DINOImageEmbedder

    kw = dict(image_size=28, dim=32, depth=3, heads=2)
    loop = DINOImageEmbedder(**kw)
    scan = DINOImageEmbedder(scan_blocks=True, **kw)
    img = jnp.asarray(rng.standard_normal((1, 3, 28, 28)), jnp.float32)
    p_loop = loop.init(jax.random.key(0), img)
    p_conv = adapt_block_layout(
        scan.init(jax.random.key(0), img), jax.tree.map(np.asarray, p_loop))
    np.testing.assert_allclose(
        np.asarray(scan.apply(p_conv, img)),
        np.asarray(loop.apply(p_loop, img)), rtol=1e-5, atol=1e-5)
