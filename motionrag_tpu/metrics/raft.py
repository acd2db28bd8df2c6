"""RAFT optical flow (Flax) — the Motion-KL flow backbone.

Faithful RAFT-large architecture (feature/context ResNet encoders with
instance norm, 4-level all-pairs correlation pyramid with radius-4 bilinear
lookup, SepConvGRU update block, convex 8x upsampling) matching
torchvision's ``raft_large`` that the reference uses for MotionDistance
(reference ``src/metrics/motion.py:9-72``). Weights port from the
torchvision checkpoint via ``port_raft`` conventions; random init exercises
the plumbing (tests check shapes/iteration behavior).

Inputs: frame pairs in [-1, 1], [b, 3, h, w] with h, w multiples of 8.
Output: flow [b, 2, h, w] (pixels).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["RAFT"]


def instance_norm(x, scale, bias, eps=1e-5, mode="instance"):
    # x: [b, h, w, c]; stats per (b, c) over spatial. mode='affine' applies
    # only scale/bias — inference-time BatchNorm with running stats folded
    # in at port time (torchvision raft_large context encoder is BN).
    if mode == "affine":
        return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    return (xf * scale + bias).astype(x.dtype)


class ResUnit(nn.Module):
    features: int
    stride: int = 1
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        s1 = self.param("norm1_scale", nn.initializers.ones, (self.features,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (self.features,))
        s2 = self.param("norm2_scale", nn.initializers.ones, (self.features,))
        b2 = self.param("norm2_bias", nn.initializers.zeros, (self.features,))
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(instance_norm(h, s1, b1, mode=self.norm))
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = instance_norm(h, s2, b2, mode=self.norm)
        if self.stride != 1 or in_ch != self.features:
            sd = self.param("down_scale", nn.initializers.ones, (self.features,))
            bd = self.param("down_bias", nn.initializers.zeros, (self.features,))
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, name="downsample")(x)
            x = instance_norm(x, sd, bd, mode=self.norm)
        return nn.relu(x + h)


class FeatureEncoder(nn.Module):
    out_channels: int = 256
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [b, h, w, 3] -> [b, h/8, w/8, out]
        s0 = self.param("norm1_scale", nn.initializers.ones, (64,))
        b0 = self.param("norm1_bias", nn.initializers.zeros, (64,))
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(instance_norm(h, s0, b0, mode=self.norm))
        h = ResUnit(64, norm=self.norm, dtype=self.dtype, name="layer1_0")(h)
        h = ResUnit(64, norm=self.norm, dtype=self.dtype, name="layer1_1")(h)
        h = ResUnit(96, 2, norm=self.norm, dtype=self.dtype, name="layer2_0")(h)
        h = ResUnit(96, norm=self.norm, dtype=self.dtype, name="layer2_1")(h)
        h = ResUnit(128, 2, norm=self.norm, dtype=self.dtype, name="layer3_0")(h)
        h = ResUnit(128, norm=self.norm, dtype=self.dtype, name="layer3_1")(h)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv2")(h)


def bilinear_sample(img, coords):
    """img: [b, h, w, c]; coords: [b, n, 2] (x, y) -> [b, n, c] with
    zero padding outside."""
    b, h, w, c = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx, dy = x - x0, y - y0

    def gather(xi, yi):
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, h * w, c)
        idx = yi_c * w + xi_c
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        return vals * valid[..., None]

    v00 = gather(x0, y0) * ((1 - dx) * (1 - dy))[..., None]
    v01 = gather(x0, y0 + 1) * ((1 - dx) * dy)[..., None]
    v10 = gather(x0 + 1, y0) * (dx * (1 - dy))[..., None]
    v11 = gather(x0 + 1, y0 + 1) * (dx * dy)[..., None]
    return v00 + v01 + v10 + v11


def build_corr_pyramid(fmap1, fmap2, num_levels=4):
    """All-pairs correlation: fmaps [b, h, w, c] -> list of
    [b*h*w, hl, wl, 1] volumes."""
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c).astype(jnp.float32)
    f2 = fmap2.reshape(b, h * w, c).astype(jnp.float32)
    corr = jnp.einsum("bnc,bmc->bnm", f1, f2) / jnp.sqrt(float(c))
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyramid.append(corr)
    return pyramid


def lookup_corr(pyramid, coords, radius=4):
    """coords: [b, h, w, 2] at 1/8 res -> [b, h, w, num_levels*(2r+1)^2]."""
    b, h, w, _ = coords.shape
    out = []
    r = radius
    delta = jnp.stack(
        jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="xy"),
        axis=-1,
    ).reshape(-1, 2).astype(jnp.float32)  # [(2r+1)^2, 2]
    n_pts = delta.shape[0]
    flat_coords = coords.reshape(b * h * w, 1, 2)
    for lvl, corr in enumerate(pyramid):
        scaled = flat_coords / (2 ** lvl) + delta[None]
        sampled = bilinear_sample(corr, scaled)  # [bhw, n_pts, 1]
        out.append(sampled.reshape(b, h, w, n_pts))
    return jnp.concatenate(out, axis=-1)


class SepConvGRU(nn.Module):
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        for name, kern, pad in (("h", (1, 5), ((0, 0), (2, 2))), ("v", (5, 1), ((2, 2), (0, 0)))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden, kern, padding=pad, dtype=self.dtype, name=f"convz_{name}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, kern, padding=pad, dtype=self.dtype, name=f"convr_{name}")(hx))
            q = jnp.tanh(nn.Conv(self.hidden, kern, padding=pad, dtype=self.dtype, name=f"convq_{name}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class UpdateBlock(nn.Module):
    hidden: int = 128
    corr_dim: int = 4 * 81
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        # motion encoder
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="convf2")(f))
        m = nn.relu(nn.Conv(126, (3, 3), padding=1, dtype=self.dtype, name="conv")(
            jnp.concatenate([c, f], axis=-1)))
        motion = jnp.concatenate([m, flow], axis=-1)  # 128

        net = SepConvGRU(self.hidden, dtype=self.dtype, name="gru")(
            net, jnp.concatenate([inp, motion], axis=-1)
        )
        dflow = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype, name="flow_head2")(
            nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="flow_head1")(net))
        )
        mask = nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask2")(
            nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="mask1")(net))
        ) * 0.25
        return net, dflow, mask


def convex_upsample(flow, mask):
    """flow: [b, h, w, 2] (1/8 res); mask: [b, h, w, 9*64] -> [b, 8h, 8w, 2]."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # gather 3x3 neighborhoods of the (scaled) flow
    flow8 = flow * 8.0
    pad = jnp.pad(flow8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [pad[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)], axis=3
    )  # [b, h, w, 9, 2]
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neigh)
    up = up.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * 8, w * 8, 2)
    return up


class RAFT(nn.Module):
    iters: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image1, image2):
        """[-1,1] [b, 3, h, w] pairs -> flow [b, 2, h, w]."""
        x1 = image1.transpose(0, 2, 3, 1).astype(self.dtype)
        x2 = image2.transpose(0, 2, 3, 1).astype(self.dtype)
        fnet = FeatureEncoder(256, dtype=self.dtype, name="fnet")
        fmap1 = fnet(x1)
        fmap2 = fnet(x2)
        # torchvision raft_large: context encoder uses BatchNorm (folded to
        # an affine at port time); feature encoder uses InstanceNorm
        cmap = FeatureEncoder(256, norm="affine", dtype=self.dtype, name="cnet")(x1)
        net = jnp.tanh(cmap[..., :128])
        inp = nn.relu(cmap[..., 128:])

        pyramid = build_corr_pyramid(fmap1, fmap2)
        b, h, w, _ = fmap1.shape
        gy, gx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        coords0 = jnp.stack([gx, gy], axis=-1).astype(jnp.float32)[None].repeat(b, 0)
        coords = coords0

        update = UpdateBlock(dtype=self.dtype, name="update_block")
        flow_up = None
        for _ in range(self.iters):
            corr = lookup_corr(pyramid, coords)
            flow = coords - coords0
            net, dflow, mask = update(net, inp, corr.astype(self.dtype), flow.astype(self.dtype))
            coords = coords + dflow.astype(jnp.float32)
            flow_up = convex_upsample(coords - coords0, mask.astype(jnp.float32))
        return flow_up.transpose(0, 3, 1, 2)
