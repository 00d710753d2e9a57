"""Color-space helpers (rebuild of utopian/shaders/include/view.glsl:47-66)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def luminance(rgb: jax.Array) -> jax.Array:
    """BT.709 luminance (view.glsl:47-51). rgb: (..., 3) -> (...)."""
    w = jnp.asarray([0.2126, 0.7152, 0.0722], rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def linear_to_srgb(linear: jax.Array) -> jax.Array:
    """Piecewise sRGB OETF (view.glsl:53-66); elementwise."""
    return jnp.where(
        linear < 0.0031308,
        linear * 12.92,
        1.055 * jnp.power(jnp.maximum(linear, 1e-12), 1.0 / 2.4) - 0.055,
    )


def srgb_to_linear(srgb: jax.Array) -> jax.Array:
    """Inverse OETF (the reference approximates this as pow 2.2 when decoding
    gbuffer albedo, deferred.frag:60; exact form kept for texture decode)."""
    return jnp.where(
        srgb < 0.04045,
        srgb / 12.92,
        jnp.power(jnp.maximum((srgb + 0.055) / 1.055, 1e-12), 2.4),
    )
