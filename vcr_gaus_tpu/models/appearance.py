"""Decoupled appearance model + semantic classifier (flax).

Appearance (scene/appearance_network.py:19-47 + the L1_loss_appearance
consumer, tools/loss_utils.py:303-324): a per-image 64-d embedding is tiled
onto a 32x-downsampled center crop of the rendered image; a CNN with four
pixel-shuffle upsample blocks + a final bilinear 2x produces a full-res 3-ch
multiplicative map in (0,1).

Semantic classifier (scene/gaussian_model.py:82-86): a 1x1 conv from the
rasterized semantic feature channels to class logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(H, W, C*r^2) -> (H*r, W*r, C), torch PixelShuffle channel order."""
    h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(h, w, co, r, r)
    x = x.transpose(0, 3, 1, 4, 2)        # H, r, W, r, Co
    return x.reshape(h * r, w * r, co)


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """align_corners=True bilinear resize for (H, W, C) (matches
    F.interpolate(..., mode='bilinear', align_corners=True))."""
    h, w, _ = x.shape
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    a = x[y0][:, x0]
    b = x[y0][:, x1]
    c = x[y1][:, x0]
    d = x[y1][:, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


class UpsampleBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = pixel_shuffle(x, 2)
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME")(x)
        return nn.relu(x)


class AppearanceNetwork(nn.Module):
    """Input (H/32, W/32, 3+64) -> multiplicative map (H, W, 3) in (0,1)."""
    out_ch: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME")(x))
        x = UpsampleBlock(128)(x)
        x = UpsampleBlock(64)(x)
        x = UpsampleBlock(32)(x)
        x = UpsampleBlock(16)(x)
        x = bilinear_resize(x, x.shape[0] * 2, x.shape[1] * 2)
        x = nn.relu(nn.Conv(16, (3, 3), padding="SAME")(x))
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME")(x)
        return nn.sigmoid(x)


class SemanticClassifier(nn.Module):
    """1x1 conv over semantic feature channels -> class logits."""
    num_cls: int

    @nn.compact
    def __call__(self, feat_chw):
        # (C, H, W) -> (H, W, C) -> dense over channels -> (num_cls, H, W)
        x = jnp.moveaxis(feat_chw, 0, -1)
        x = nn.Dense(self.num_cls)(x)
        return jnp.moveaxis(x, -1, 0)


def init_appearance(rng, num_images: int, height: int, width: int,
                    embed_dim: int = 64, embed_std: float = 1e-4):
    """Initialize (embeddings, network params). Embeddings ~ N(0, 1e-4)
    (scene/gaussian_model.py:72-79)."""
    k1, k2 = jax.random.split(rng)
    embeddings = embed_std * jax.random.normal(k1, (num_images, embed_dim))
    net = AppearanceNetwork()
    h32, w32 = height // 32, width // 32
    params = net.init(k2, jnp.zeros((h32, w32, 3 + embed_dim)))
    return embeddings, params


def appearance_transform(net_params, embeddings, image, view_idx):
    """The L1_loss_appearance image pathway (tools/loss_utils.py:303-324):
    center-crop to a /32 multiple, downsample 32x (bilinear align-corners),
    concat the view embedding, run the CNN, multiply with the crop.
    Returns (transformed_crop (3,h,w), gt-crop slicer (top, left, h, w))."""
    emb = embeddings[view_idx]
    _, orig_h, orig_w = image.shape
    h = orig_h // 32 * 32
    w = orig_w // 32 * 32
    top = orig_h // 2 - h // 2
    left = orig_w // 2 - w // 2
    crop = jax.lax.dynamic_slice(image, (0, top, left), (3, h, w))
    hwc = jnp.moveaxis(crop, 0, -1)
    down = bilinear_resize(hwc, h // 32, w // 32)
    emb_map = jnp.broadcast_to(emb[None, None, :], (h // 32, w // 32,
                                                    emb.shape[0]))
    inp = jnp.concatenate([down, emb_map], axis=-1)
    mapping = AppearanceNetwork().apply(net_params, inp)      # (h, w, 3)
    transformed = jnp.moveaxis(mapping, -1, 0) * crop
    return transformed, (top, left, h, w)
