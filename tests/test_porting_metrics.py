"""Golden activation tests for the metric-backbone converters.

torch mirrors are written to the PUBLIC checkpoint naming conventions
(piergiaj InceptionI3d for the torchscript FVD I3D; torchvision
inception_v3 / raft_large), randomized, exported as state_dicts, ported via
utils/porting_metrics.py, and compared activation-for-activation. This
pins every layout/BN/padding convention the real checkpoints rely on.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F


def _randomize(model, seed=0, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) * 0.5 + 0.5)
    model.eval()


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# I3D (piergiaj InceptionI3d naming = the torchscript FVD checkpoint)
# ---------------------------------------------------------------------------


def _same_pad_3d(x, kernel, stride):
    """TF-SAME padding (what the TF-ported I3D checkpoint assumes)."""
    pads = []
    for i, (k, s) in enumerate(zip(kernel, stride)):
        size = x.shape[2 + i]
        out = -(-size // s)
        pad = max(0, (out - 1) * s + k - size)
        pads.append((pad // 2, pad - pad // 2))
    # F.pad takes reversed (w, h, t) order
    flat = [v for pair in reversed(pads) for v in pair]
    return F.pad(x, flat)


class TUnit3D(tnn.Module):
    def __init__(self, in_ch, out_ch, kernel=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, act=True):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv3d = tnn.Conv3d(in_ch, out_ch, kernel, stride, bias=not use_bn)
        self.bn = tnn.BatchNorm3d(out_ch, eps=1e-3) if use_bn else None
        self.act = act

    def forward(self, x):
        x = self.conv3d(_same_pad_3d(x, self.kernel, self.stride))
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.act else x


class TMixed(tnn.Module):
    def __init__(self, in_ch, c):
        super().__init__()
        b0, b1a, b1b, b2a, b2b, b3b = c
        self.Branch_0 = tnn.Module()
        self.Branch_0.Conv3d_0a_1x1 = TUnit3D(in_ch, b0)
        self.Branch_1 = tnn.Module()
        self.Branch_1.Conv3d_0a_1x1 = TUnit3D(in_ch, b1a)
        self.Branch_1.Conv3d_0b_3x3 = TUnit3D(b1a, b1b, (3, 3, 3))
        self.Branch_2 = tnn.Module()
        self.Branch_2.Conv3d_0a_1x1 = TUnit3D(in_ch, b2a)
        self.Branch_2.Conv3d_0b_3x3 = TUnit3D(b2a, b2b, (3, 3, 3))
        self.Branch_3 = tnn.Module()
        self.Branch_3.Conv3d_0b_1x1 = TUnit3D(in_ch, b3b)

    def forward(self, x):
        mp = _same_pad_3d(x, (3, 3, 3), (1, 1, 1))
        return torch.cat([
            self.Branch_0.Conv3d_0a_1x1(x),
            self.Branch_1.Conv3d_0b_3x3(self.Branch_1.Conv3d_0a_1x1(x)),
            self.Branch_2.Conv3d_0b_3x3(self.Branch_2.Conv3d_0a_1x1(x)),
            self.Branch_3.Conv3d_0b_1x1(F.max_pool3d(mp, (3, 3, 3), (1, 1, 1))),
        ], dim=1)


_I3D_CFG = {
    "3b": (192, (64, 96, 128, 16, 32, 32)),
    "3c": (256, (128, 128, 192, 32, 96, 64)),
    "4b": (480, (192, 96, 208, 16, 48, 64)),
    "4c": (512, (160, 112, 224, 24, 64, 64)),
    "4d": (512, (128, 128, 256, 24, 64, 64)),
    "4e": (512, (112, 144, 288, 32, 64, 64)),
    "4f": (528, (256, 160, 320, 32, 128, 128)),
    "5b": (832, (256, 160, 320, 32, 128, 128)),
    "5c": (832, (384, 192, 384, 48, 128, 128)),
}


class TI3D(tnn.Module):
    """piergiaj InceptionI3d topology + naming (rgb Kinetics-400)."""

    def __init__(self):
        super().__init__()
        self.Conv3d_1a_7x7 = TUnit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = TUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TUnit3D(64, 192, (3, 3, 3))
        for blk, (in_ch, c) in _I3D_CFG.items():
            setattr(self, f"Mixed_{blk}", TMixed(in_ch, c))
        self.logits = TUnit3D(1024, 400, use_bn=False, act=False)

    def forward(self, x):
        # x: [b, c, t, h, w] in [-1, 1]
        x = self.Conv3d_1a_7x7(x)
        x = F.max_pool3d(_same_pad_3d(x, (1, 3, 3), (1, 2, 2)), (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x))
        x = F.max_pool3d(_same_pad_3d(x, (1, 3, 3), (1, 2, 2)), (1, 3, 3), (1, 2, 2))
        x = self.Mixed_3c(self.Mixed_3b(x))
        x = F.max_pool3d(_same_pad_3d(x, (3, 3, 3), (2, 2, 2)), (3, 3, 3), (2, 2, 2))
        for blk in ("4b", "4c", "4d", "4e", "4f"):
            x = getattr(self, f"Mixed_{blk}")(x)
        x = F.max_pool3d(_same_pad_3d(x, (2, 2, 2), (2, 2, 2)), (2, 2, 2), (2, 2, 2))
        x = self.Mixed_5c(self.Mixed_5b(x))
        x = x.mean(dim=(3, 4))  # spatial avg -> [b, c, t']
        x = self.logits(x[:, :, :, None, None])[:, :, :, 0, 0]
        return x.mean(dim=2)  # temporal avg -> [b, 400]


@pytest.mark.slow
def test_i3d_converter_activation_parity():
    import jax.numpy as jnp

    from motionrag_tpu.metrics.i3d import I3D
    from motionrag_tpu.utils.porting_metrics import port_i3d

    tmodel = TI3D()
    _randomize(tmodel, seed=1, scale=0.05)
    variables = port_i3d(_sd(tmodel), strict=True)

    rng = np.random.default_rng(0)
    videos = rng.integers(0, 255, (1, 9, 3, 224, 224), dtype=np.uint8)
    with torch.no_grad():
        x = torch.from_numpy(videos.astype(np.float32)) / 127.5 - 1.0
        t_out = tmodel(x.permute(0, 2, 1, 3, 4)).numpy()

    j_out = np.asarray(I3D().apply(variables, jnp.asarray(videos)))
    np.testing.assert_allclose(j_out, t_out, rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# InceptionV3 (torchvision naming)
# ---------------------------------------------------------------------------


class TBasicConv(tnn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(out_ch, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(F.avg_pool2d(x, 3, 1, 1)),
        ], 1)


class TInceptionB(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = TBasicConv(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2),
        ], 1)


class TInceptionC(tnn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = TBasicConv(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv(in_ch, 192, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
            self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x))))),
            self.branch_pool(F.avg_pool2d(x, 3, 1, 1)),
        ], 1)


class TInceptionD(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = TBasicConv(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2),
        ], 1)


class TInceptionE(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch1x1 = TBasicConv(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        return torch.cat([
            self.branch1x1(x),
            torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1),
            torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1),
            self.branch_pool(F.avg_pool2d(x, 3, 1, 1)),
        ], 1)


class TInceptionV3(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280)
        self.Mixed_7c = TInceptionE(2048)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for blk in ("5b", "5c", "5d", "6a", "6b", "6c", "6d", "6e", "7a", "7b", "7c"):
            x = getattr(self, f"Mixed_{blk}")(x)
        return x.mean(dim=(2, 3))  # pool3 features [b, 2048]


class TViCLIPVision(tnn.Module):
    """InternVideo ViCLIP vision topology + naming (tiny config)."""

    def __init__(self, dim=32, depth=2, heads=2, patch=16, frames=4, out=24,
                 image=32):
        super().__init__()
        l = (image // patch) ** 2
        self.conv1 = tnn.Conv3d(3, dim, (1, patch, patch), (1, patch, patch), bias=False)
        self.class_embedding = tnn.Parameter(torch.randn(dim) * 0.02)
        self.positional_embedding = tnn.Parameter(torch.randn(l + 1, dim) * 0.02)
        self.temporal_positional_embedding = tnn.Parameter(torch.zeros(1, frames, dim))
        self.ln_pre = tnn.LayerNorm(dim)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList()
        for _ in range(depth):
            blk = tnn.Module()
            blk.ln_1 = tnn.LayerNorm(dim)
            blk.attn = tnn.MultiheadAttention(dim, heads, batch_first=True)
            blk.ln_2 = tnn.LayerNorm(dim)
            blk.mlp = tnn.Module()
            blk.mlp.c_fc = tnn.Linear(dim, 4 * dim)
            blk.mlp.c_proj = tnn.Linear(4 * dim, dim)
            self.transformer.resblocks.append(blk)
        self.ln_post = tnn.LayerNorm(dim)
        self.proj = tnn.Parameter(torch.randn(dim, out) * 0.02)
        self._l = l

    def forward(self, video):
        # video: [b, c, t, h, w]
        b, _, t = video.shape[:3]
        x = self.conv1(video)  # [b, dim, t, gh, gw]
        dim = x.shape[1]
        x = x.permute(0, 2, 3, 4, 1).reshape(b, -1, dim)  # [b, t*l, dim]
        x = x + self.positional_embedding[1:].tile(t, 1)
        x = x + self.temporal_positional_embedding[0, :t].repeat_interleave(self._l, 0)
        cls = (self.class_embedding + self.positional_embedding[0]).expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            h = blk.ln_1(x)
            a, _ = blk.attn(h, h, h, need_weights=False)
            x = x + a
            h = blk.ln_2(x)
            x = x + blk.mlp.c_proj(F.gelu(blk.mlp.c_fc(h)))
        return self.ln_post(x[:, 0]) @ self.proj


@pytest.mark.slow
def test_viclip_converter_activation_parity():
    import jax.numpy as jnp

    from motionrag_tpu.models.encoders.viclip import ViCLIPVision, port_viclip_vision

    tmodel = TViCLIPVision()
    _randomize(tmodel, seed=3, scale=0.05)
    # MultiheadAttention stores in_proj_weight/bias at the module level —
    # rename to the ViCLIP checkpoint layout handled by the converter
    sd = {}
    for k, v in tmodel.state_dict().items():
        sd[k] = v.detach().numpy()
    variables = port_viclip_vision(sd, depth=2, prefix="")

    jmodel = ViCLIPVision(image_size=32, patch_size=16, num_frames=4, dim=32,
                          depth=2, heads=2, output_dim=24, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    video = rng.standard_normal((2, 4, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(video.transpose(0, 2, 1, 3, 4))).numpy()
    j_out = np.asarray(jmodel.apply(variables, jnp.asarray(video)))
    np.testing.assert_allclose(j_out, t_out, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_inception_v3_converter_activation_parity():
    import jax.numpy as jnp

    from motionrag_tpu.metrics.inception import InceptionV3
    from motionrag_tpu.utils.porting_metrics import port_inception_v3

    tmodel = TInceptionV3()
    _randomize(tmodel, seed=2, scale=0.05)
    variables = port_inception_v3(_sd(tmodel), strict=True)

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (1, 3, 299, 299), dtype=np.uint8)
    with torch.no_grad():
        x = torch.from_numpy(frames.astype(np.float32)) / 127.5 - 1.0
        t_out = tmodel(x).numpy()

    j_out = np.asarray(InceptionV3().apply(variables, jnp.asarray(frames)))
    np.testing.assert_allclose(j_out, t_out, rtol=5e-3, atol=5e-4)
