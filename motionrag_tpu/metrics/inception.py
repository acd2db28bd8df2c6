"""InceptionV3 (pool3 features) in Flax — the FID feature network.

The reference's FID comes from torchmetrics' FrechetInceptionDistance
(reference ``fvd.py:29-32`` applies it to frames), which uses InceptionV3
pool3 2048-d features. This is the standard torchvision InceptionV3
topology (BasicConv2d = conv + BN(eps=1e-3) + relu); weights port with the
usual conv/bn conventions.

Input: uint8 frames [b, c, h, w]; resized to 299 and scaled to [-1, 1]
(FID convention).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["InceptionV3"]


class BasicConv(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: str | tuple = "VALID"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=self.padding,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


def _pad(p):
    return ((p, p), (p, p))


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=_pad(2), dtype=self.dtype, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=_pad(1), dtype=self.dtype, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=_pad(1), dtype=self.dtype, name="branch3x3dbl_3")(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        bp = BasicConv(self.pool_features, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=_pad(1), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=_pad(1), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """uint8 [b, c, h, w] -> pool3 features [b, 2048]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames_u8: jnp.ndarray) -> jnp.ndarray:
        x = frames_u8.astype(jnp.float32) / 127.5 - 1.0
        x = x.transpose(0, 2, 3, 1)
        b, h, w, c = x.shape
        if (h, w) != (299, 299):
            x = jax.image.resize(x, (b, 299, 299, c), method="bilinear")
        x = x.astype(self.dtype)

        x = BasicConv(32, (3, 3), (2, 2), dtype=self.dtype, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=_pad(1), dtype=self.dtype, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5d")(x)
        x = InceptionB(self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, self.dtype, name="Mixed_6e")(x)
        x = InceptionD(self.dtype, name="Mixed_7a")(x)
        x = InceptionE(self.dtype, name="Mixed_7b")(x)
        x = InceptionE(self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool -> [b, 2048]
