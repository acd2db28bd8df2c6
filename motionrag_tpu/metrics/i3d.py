"""I3D (Inflated Inception-v1) video feature network in Flax.

JAX re-implementation of the torchscript I3D the reference downloads for
FVD / I3D ActionScore (reference ``src/metrics/models.py:54-69``,
``fvd.py:9-18``): Kinetics-400 classifier whose 400-d logits are the FVD
feature space. Weights port from the public I3D checkpoints; random init is
used by tests (metric *math* is exercised; scores need ported weights).

Input: uint8 [b, t, c, h, w] videos; internal preprocessing matches the
torchscript model's ``rescale/resize`` behavior (resize to 224, scale to
[-1, 1]).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["I3D"]


class Unit3D(nn.Module):
    features: int
    kernel: tuple = (1, 1, 1)
    strides: tuple = (1, 1, 1)
    act: bool = True
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding="SAME",
            use_bias=not self.use_bn, dtype=self.dtype, name="conv3d",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-3, dtype=self.dtype, name="bn"
            )(x)
        if self.act:
            x = nn.relu(x)
        return x


class InceptionBlock(nn.Module):
    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3b: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        br0 = Unit3D(self.b0, dtype=self.dtype, name="b0")(x)
        br1 = Unit3D(self.b1a, dtype=self.dtype, name="b1a")(x)
        br1 = Unit3D(self.b1b, (3, 3, 3), dtype=self.dtype, name="b1b")(br1)
        br2 = Unit3D(self.b2a, dtype=self.dtype, name="b2a")(x)
        br2 = Unit3D(self.b2b, (3, 3, 3), dtype=self.dtype, name="b2b")(br2)
        br3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        br3 = Unit3D(self.b3b, dtype=self.dtype, name="b3b")(br3)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


class I3D(nn.Module):
    num_classes: int = 400
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, videos_u8: jnp.ndarray) -> jnp.ndarray:
        """uint8 [b, t, c, h, w] -> [b, num_classes] features."""
        x = videos_u8.astype(jnp.float32) / 127.5 - 1.0
        x = x.transpose(0, 1, 3, 4, 2)  # [b, t, h, w, c]
        b, t, h, w, c = x.shape
        if (h, w) != (224, 224):
            x = jax.image.resize(x, (b, t, 224, 224, c), method="bilinear")
        x = x.astype(self.dtype)

        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype, name="conv1a")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, dtype=self.dtype, name="conv2b")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="conv2c")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionBlock(64, 96, 128, 16, 32, 32, self.dtype, name="mixed_3b")(x)
        x = InceptionBlock(128, 128, 192, 32, 96, 64, self.dtype, name="mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock(192, 96, 208, 16, 48, 64, self.dtype, name="mixed_4b")(x)
        x = InceptionBlock(160, 112, 224, 24, 64, 64, self.dtype, name="mixed_4c")(x)
        x = InceptionBlock(128, 128, 256, 24, 64, 64, self.dtype, name="mixed_4d")(x)
        x = InceptionBlock(112, 144, 288, 32, 64, 64, self.dtype, name="mixed_4e")(x)
        x = InceptionBlock(256, 160, 320, 32, 128, 128, self.dtype, name="mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock(256, 160, 320, 32, 128, 128, self.dtype, name="mixed_5b")(x)
        x = InceptionBlock(384, 192, 384, 48, 128, 128, self.dtype, name="mixed_5c")(x)

        x = jnp.mean(x, axis=(2, 3))  # spatial average -> [b, t', 1024]
        x = Unit3D(
            self.num_classes, act=False, use_bn=False, dtype=self.dtype, name="logits"
        )(x[:, :, None, None, :])[:, :, 0, 0, :]
        return jnp.mean(x, axis=1)  # temporal average -> [b, 400]
