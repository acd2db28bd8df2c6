"""Tests for the config instantiation system and mesh construction."""

import jax
import jax.numpy as jnp
import numpy as np

from motionrag_tpu.config import apply_overrides, instantiate_tree, to_partial
from motionrag_tpu.parallel import MeshConfig, build_mesh
from jax.sharding import NamedSharding, PartitionSpec as P


def test_instantiate_class_path():
    cfg = {
        "model": {
            "class_path": "collections.OrderedDict",
            "init_args": {"a": 1, "b": {"class_path": "fractions.Fraction", "init_args": {"numerator": 1, "denominator": 2}}},
        }
    }
    out = instantiate_tree(cfg)
    from fractions import Fraction

    assert out["model"]["a"] == 1
    assert out["model"]["b"] == Fraction(1, 2)


def test_to_partial():
    spec = {"class_path": "fractions.Fraction", "init_args": {"denominator": 4}}
    factory = to_partial(spec)
    from fractions import Fraction

    assert factory(numerator=3) == Fraction(3, 4)


def test_apply_overrides_descends_init_args():
    cfg = {
        "model": {"class_path": "x.Y", "init_args": {"lr": 0.1}},
        "data": {"batch_size": 4},
    }
    out = apply_overrides(cfg, ["--model.lr=0.5", "--data.batch_size=8", "--trainer.steps=10"])
    assert out["model"]["init_args"]["lr"] == 0.5
    assert out["data"]["batch_size"] == 8
    assert out["trainer"]["steps"] == 10
    assert cfg["model"]["init_args"]["lr"] == 0.1  # original untouched


def test_mesh_resolution_and_sharding():
    mesh = build_mesh(MeshConfig(dp=-1, tp=2))
    assert mesh.devices.size == 8
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "pp": 1, "dp": 4, "fsdp": 1, "tp": 2, "sp": 1,
    }
    x = jnp.zeros((8, 16))
    xs = jax.device_put(x, NamedSharding(mesh, P(("dp", "fsdp"), "tp")))
    assert xs.sharding.shard_shape(x.shape) == (2, 8)


def test_mesh_psum_collective(mesh8):
    def f(x):
        return jax.lax.psum(x, axis_name="dp")

    x = jnp.arange(8.0).reshape(2, 2, 2)
    out = jax.shard_map(f, mesh=mesh8, in_specs=P("dp"), out_specs=P())(x)
    assert out.shape == (1, 2, 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0] + x[1]))


def test_collectives_helpers(mesh8):
    import numpy as np
    from motionrag_tpu.parallel.collectives import all_gather_batch, psum_mean

    def f(x):
        return psum_mean({"g": x}, axis_name="dp")["g"], all_gather_batch(x, axis_name="dp")

    x = jnp.arange(8.0).reshape(4, 2)
    mean, gathered = jax.shard_map(
        f, mesh=mesh8, in_specs=P("dp"), out_specs=(P("dp"), P("dp")),
    )(x)
    # psum_mean of the two dp shards = elementwise mean
    np.testing.assert_allclose(np.asarray(mean)[:2], np.asarray((x[:2] + x[2:]) / 2))


def test_dit_sequence_parallel_equivalence(rng):
    """sequence_parallel=True constrains the DiT token axis over the sp
    mesh axis; the result must equal the unsharded forward (the constraint
    is a layout hint, not a math change), and it is a no-op without a mesh."""
    import numpy as np
    from jax.sharding import Mesh

    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D

    devs = jax.devices()
    if len(devs) < 2:
        import pytest

        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(devs[:2]), ("sp",))

    kw = dict(in_channels=8, out_channels=4, dim=32, depth=2, heads=2,
              head_dim=16, text_embed_dim=16, time_embed_dim=32,
              dtype=jnp.float32)
    dit_sp = CogVideoXTransformer3D(sequence_parallel=True, **kw)
    dit = CogVideoXTransformer3D(**kw)

    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 6, 16)), jnp.float32)
    t = jnp.asarray([3], jnp.int32)
    params = dit.init(jax.random.key(0), x, text, t)

    ref = dit.apply(params, x, text, t)
    # same params work in the sp module (fields don't change the tree)
    with mesh:
        out = jax.jit(lambda p, x, c, t: dit_sp.apply(p, x, c, t))(params, x, text, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
    # outside any mesh the constraint is skipped entirely
    out2 = dit_sp.apply(params, x, text, t)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=0, rtol=0)
