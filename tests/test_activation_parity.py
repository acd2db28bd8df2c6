"""Full-model activation parity, torch <-> Flax, through the converters.

The vendored reference lvdm stack runs on the installed CPU torch
(``/root/reference/src/projects/dynamicrafter/DynamiCrafter``). We build
reduced-width but structurally complete instances, randomize every torch
parameter, port the state_dict through ``utils/porting_diffusion.py``, and
assert forward activations match — the strongest offline proof that real
DynamiCrafter checkpoints will load and run correctly (VERDICT r1 item 2).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference/src/projects/dynamicrafter"


def _import_lvdm():
    """Import the vendored lvdm tree as the 'DynamiCrafter' namespace package
    with a minimal lightning stub (lightning is not installed here)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "lightning" not in sys.modules:
        pl_stub = types.ModuleType("lightning.pytorch")
        pl_stub.LightningModule = torch.nn.Module
        lightning_stub = types.ModuleType("lightning")
        lightning_stub.pytorch = pl_stub
        sys.modules["lightning"] = lightning_stub
        sys.modules["lightning.pytorch"] = pl_stub
    import DynamiCrafter.lvdm  # noqa: F401

    return sys.modules["DynamiCrafter"]


def _randomize(model: torch.nn.Module, seed: int = 0, scale: float = 0.08):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    model.eval()


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.slow
def test_unet3d_activation_parity():
    """Reduced-width lvdm UNetModel (torch, the reference's own vendored
    source: openaimodel3d.py:284-636) vs our UNet3D via port_lvdm_unet3d —
    same inputs, activations must agree."""
    _import_lvdm()
    from DynamiCrafter.lvdm.modules.networks.openaimodel3d import UNetModel

    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
    from motionrag_tpu.utils.porting_diffusion import port_lvdm_unet3d

    b, t, h, w = 1, 4, 16, 16
    ctx_dim, mc = 32, 32

    tmodel = UNetModel(
        in_channels=8, model_channels=mc, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2], context_dim=ctx_dim,
        num_head_channels=16, transformer_depth=1, use_linear=True,
        temporal_conv=True, temporal_attention=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=t, addition_attention=True,
        image_cross_attention=True, action_cross_attention=True,
        fs_condition=True, dropout=0.0,
    )
    _randomize(tmodel)

    junet = UNet3D(
        in_channels=8, out_channels=4, model_channels=mc, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_head_channels=16,
        transformer_depth=1, context_dim=ctx_dim, temporal_conv=True,
        temporal_attention=True, addition_attention=True,
        image_cross_attention=True, action_cross_attention=True,
        fs_condition=True, dtype=jnp.float32,
    )
    ported = port_lvdm_unet3d(
        _sd_numpy(tmodel), channel_mult=(1, 2), num_res_blocks=1,
        attention_levels=(0, 1), temporal_attention=True, strict=True,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, 8, t, h, w)).astype(np.float32)
    prompt = rng.standard_normal((b, 5, ctx_dim)).astype(np.float32)
    image = rng.standard_normal((b, t * 3, ctx_dim)).astype(np.float32)
    action = rng.standard_normal((b, 4, ctx_dim)).astype(np.float32)
    timesteps = np.asarray([451.0], np.float32)
    fs = np.asarray([7.0], np.float32)

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(x), torch.from_numpy(timesteps),
            context={
                "prompt": torch.from_numpy(prompt),
                "image": torch.from_numpy(image),
                "action": torch.from_numpy(action),
            },
            fs=torch.from_numpy(fs).long(),
        ).numpy()

    j_out = junet.apply(
        ported,
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(timesteps),
        {"prompt": jnp.asarray(prompt), "image": jnp.asarray(image),
         "action": jnp.asarray(action)},
        fs=jnp.asarray(fs),
    )
    j_out = np.asarray(j_out).transpose(0, 4, 1, 2, 3)

    np.testing.assert_allclose(j_out, t_out, rtol=2e-4, atol=2e-4)
