"""ActionCLIP contrastive pretraining (reference ``condition/module.py:15-85``).

Covers: symmetric-CE loss behavior, and the grad-synced cross-device batch
gather — the dp-sharded loss (and its gradients) must equal the single-device
loss over the concatenated global batch, which is the whole point of the
reference's ``all_gather(sync_grads=True)``.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from motionrag_tpu.models.cama import ActionCLIP
from motionrag_tpu.models.cama_module import ActionCLIPModule
from motionrag_tpu.models.encoders.condition import VideoMAEEmbedder
from motionrag_tpu.models.resampler import Resampler


def _make(axis_name=None):
    return ActionCLIP(
        action_model=VideoMAEEmbedder(num_frames=4, image_size=32, dim=16,
                                      depth=1, heads=2, dtype=jnp.float32),
        text_model=None,
        resampler=Resampler(dim=16, depth=1, dim_head=8, heads=2, num_queries=2,
                            embedding_dim=16, output_dim=16, with_cls_token=True,
                            dtype=jnp.float32),
        axis_name=axis_name,
    )


def _batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    video = jnp.asarray(rng.uniform(-1, 1, (b, 4, 3, 32, 32)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(b, 16)), jnp.float32)
    return video, text


def test_action_clip_loss_properties():
    model = _make()
    video, text = _batch()
    params = model.init(jax.random.key(0), video, text)
    loss = model.apply(params, video, text)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # shuffling the text-video pairing changes the contrastive loss
    perm = jnp.asarray([3, 0, 1, 2, 5, 4, 7, 6])
    loss_perm = model.apply(params, video, text[perm])
    assert abs(float(loss) - float(loss_perm)) > 1e-6


def test_action_clip_gather_matches_global_batch():
    """dp=8-sharded loss == single-device loss on the full gathered batch,
    and so do the gradients (grad-synced all_gather)."""
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    video, text = _batch(b=8)

    local = _make()
    dist = _make(axis_name="dp")
    params = local.init(jax.random.key(0), video, text)

    def global_loss(p):
        return local.apply(p, video, text)

    @jax.jit
    def sharded_loss(p):
        def f(v, t):
            return dist.apply(p, v, t)

        per = shard_map(
            f, mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P(),
            check_rep=False,
        )(video, text)
        return per

    l_ref, g_ref = jax.value_and_grad(global_loss)(params)
    l_sh, g_sh = jax.value_and_grad(lambda p: sharded_loss(p))(params)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=2e-5)
    ref_leaves = jax.tree.leaves(g_ref)
    sh_leaves = jax.tree.leaves(g_sh)
    for a, b in zip(ref_leaves, sh_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5)


def test_action_clip_module_trainable_patterns():
    module = ActionCLIPModule(_make())
    video, text = _batch(b=4)
    params = module.init_params(jax.random.key(0), {"video": video, "text_emb": text})
    loss, metrics = module.loss(params, {"video": video, "text_emb": text}, jax.random.key(1))
    assert np.isfinite(float(loss))
    pats = module.trainable_patterns
    assert "action_clip.logit_scale" in pats
