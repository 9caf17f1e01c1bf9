"""Perceptual losses — both reference variants.

- ``pan_loss`` (version 2): weighted L1/L2 over the 4 discriminator feature
  maps (/root/reference/util.py:41-70). Weight vector is normalized to sum 1.
  The reference's hook features are detached so this term contributes zero
  gradient to G (SURVEY.md section 3.6 quirk 2); the caller controls that via
  ``stop_gradient`` on the features (train/step.py makes it explicit).
- ``vgg_perceptual_loss`` (version 1): frozen VGG16 feature-space L1
  (/root/reference/util.py:100-144) — ImageNet-normalized, resized to 224^2,
  weighted over 4 blocks. See models/vgg.py for the tower + weight loading.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def _gram(feat: jax.Array) -> jax.Array:
    """Channel-gram matrix. feat: [N,H,W,C] → [N,C,C] (float32 accumulate)."""
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c).astype(jnp.float32)
    return jnp.einsum("npc,npd->ncd", f, f, preferred_element_type=jnp.float32)


def pan_loss(
    real_features: Sequence[jax.Array],
    fake_features: Sequence[jax.Array],
    mode: str = "normal",
    loss_type: str = "l1",
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> jax.Array:
    if mode not in ("normal", "gram"):
        raise ValueError("mode must be normal or gram")
    if loss_type not in ("l1", "l2"):
        raise ValueError("loss_type must be l1 or l2")
    if len(weights) != 4:
        raise ValueError("weights must be a list of 4 numbers")

    w = jnp.asarray(weights, jnp.float32)
    w = w / jnp.sum(w)

    def elem(a, b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        return jnp.mean(jnp.abs(d)) if loss_type == "l1" else jnp.mean(d * d)

    total = jnp.float32(0.0)
    for i in range(4):
        if mode == "normal":
            total = total + elem(real_features[i], fake_features[i]) * w[i]
        else:
            total = total + elem(_gram(real_features[i]),
                                 _gram(fake_features[i])) * w[i]
    return total


# ImageNet statistics used by the reference (/root/reference/util.py:114-115).
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def vgg_perceptual_loss(
    vgg_apply,
    vgg_params,
    input_img: jax.Array,
    target_img: jax.Array,
    weights: Sequence[float] = (0.25, 0.25, 0.25, 0.25),
    resize: bool = True,
    feature_layers: Sequence[int] = (0, 1, 2, 3),
    style_layers: Sequence[int] = (),
) -> jax.Array:
    """V1 perceptual loss. input/target: NHWC.

    Mirrors VGGPerceptualLoss.forward (/root/reference/util.py:119-144): both
    images are ImageNet-normalized (note: the reference feeds its [-1,1]/[0,1]
    images straight through this normalization — we reproduce that, not
    "fix" it), optionally bilinear-resized to 224^2, and compared block-wise
    with L1.
    """
    from tactile_gan_tpu.ops.resize import resize_bilinear

    mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(_IMAGENET_STD, jnp.float32)

    def prep(img):
        img = img.astype(jnp.float32)
        if img.shape[-1] != 3:
            img = jnp.repeat(img, 3, axis=-1)
        img = (img - mean) / std
        if resize:
            img = resize_bilinear(img, (224, 224))
        return img

    x_feats = vgg_apply(vgg_params, prep(input_img))
    y_feats = vgg_apply(vgg_params, prep(target_img))

    loss = jnp.float32(0.0)
    for i, (x, y) in enumerate(zip(x_feats, y_feats)):
        if i in feature_layers:
            loss = loss + l1_loss(x, y) * weights[i]
        if i in style_layers:
            loss = loss + l1_loss(_gram(x), _gram(y)) * weights[i]
    return loss
