"""Photometric training augmentations, implemented as pure JAX functions.

Covers /root/reference/omnivggt/datasets/utils/augmentation.py:11-74 (a
torchvision Compose of random ColorJitter + RandomGrayscale + GaussianBlur).
Here each augmentation is a pure function of (rng key, image) so the pipeline
is jit/vmap-able and reproducible — the TPU-native equivalent of torchvision's
stateful RNG transforms. Images are (..., H, W, 3) float in [0, 1].
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

DEFAULT_JITTER = {
    "brightness": 0.5,
    "contrast": 0.5,
    "saturation": 0.5,
    "hue": 0.1,
    "p": 0.9,
}

_LUMA = jnp.asarray([0.299, 0.587, 0.114])


def _rgb_to_hsv(img):
    return jax.vmap(jax.vmap(lambda p: jnp.stack(_px_rgb_to_hsv(p))))(img)


def _px_rgb_to_hsv(p):
    r, g, b = p[0], p[1], p[2]
    mx = jnp.max(p)
    mn = jnp.min(p)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, (g - b) / safe_d % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0),
    ) / 6.0
    h = jnp.where(d == 0, 0.0, h)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    mean = jnp.mean(img @ _LUMA)
    return jnp.clip((img - mean) * factor + mean, 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = (img @ _LUMA)[..., None]
    return jnp.clip(gray + (img - gray) * factor, 0.0, 1.0)


def adjust_hue(img, shift):
    hsv = _rgb_to_hsv(img)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
    return jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)


def to_grayscale(img):
    gray = img @ _LUMA
    return jnp.broadcast_to(gray[..., None], img.shape)


def gaussian_blur(img, sigma, kernel_size: int = 5):
    x = jnp.arange(kernel_size) - (kernel_size - 1) / 2
    k = jnp.exp(-(x**2) / (2 * sigma**2))
    k = k / jnp.sum(k)
    # separable: along H then W, per channel
    pad = kernel_size // 2
    img_p = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    img = sum(img_p[i : i + img.shape[0]] * k[i] for i in range(kernel_size))
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    img = sum(img_p[:, i : i + img.shape[1]] * k[i] for i in range(kernel_size))
    return img


def color_jitter(key, img, brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1):
    """torchvision-style ColorJitter: random factors in [max(0,1-x), 1+x]
    (hue in [-hue, hue]), applied in a random order."""
    k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 5)
    fb = jax.random.uniform(k_b, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(k_c, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(k_s, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(k_h, (), minval=-hue, maxval=hue)

    ops = [
        lambda im: adjust_brightness(im, fb),
        lambda im: adjust_contrast(im, fc),
        lambda im: adjust_saturation(im, fs),
        lambda im: adjust_hue(im, fh),
    ]
    perm = jax.random.permutation(k_perm, 4)

    def apply_idx(im, idx):
        return jax.lax.switch(idx, ops, im), None

    img, _ = jax.lax.scan(apply_idx, img, perm)
    return img


def make_augmentation(
    color_jitter_params: Optional[Dict[str, float]] = None,
    gray_scale: bool = True,
    gau_blur: bool = False,
):
    """Returns augment(key, img) applying: ColorJitter with prob p,
    grayscale with prob 0.05, gaussian blur with prob 0.05 — the reference's
    composition with the same defaults."""
    params = {**DEFAULT_JITTER, **(color_jitter_params or {})}

    def augment(key, img):
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        img = jax.lax.cond(
            jax.random.uniform(k1) < params["p"],
            lambda im: color_jitter(
                k2, im, params["brightness"], params["contrast"],
                params["saturation"], params["hue"],
            ),
            lambda im: im,
            img,
        )
        if gray_scale:
            img = jnp.where(jax.random.uniform(k3) < 0.05, to_grayscale(img), img)
        if gau_blur:
            sigma = jax.random.uniform(k5, (), minval=0.1, maxval=1.0)
            img = jnp.where(
                jax.random.uniform(k4) < 0.05, gaussian_blur(img, sigma), img
            )
        return img

    return augment
