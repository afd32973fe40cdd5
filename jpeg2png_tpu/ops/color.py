"""Color conversion for output.

Matches write_png's YCbCr -> RGB with centered chroma and its exact
clamp-then-scale order (reference: png.c:37-62): luma has +128 re-added
by the driver first (jpeg2png.c:156-159), chroma stays centered at 0,
each RGB value is clamped to [0, 255] and only then scaled by
bitfactor = (1 << bits) / 256, so 16-bit white is 65280, not 65535.
The float -> unsigned C cast truncates toward zero; we mirror that.
"""

from __future__ import annotations

import jax.numpy as jnp


def ycbcr_to_rgb_packed(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray,
                        bits: int = 8) -> jnp.ndarray:
    """[H, W] channels (luma already +128) -> [H, W, 3] uint8/uint16."""
    r = y + 1.402 * cr
    g = y - 0.34414 * cb - 0.71414 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    rgb = jnp.clip(rgb, 0.0, 255.0)
    bitfactor = (1 << bits) / 256.0
    rgb = rgb * bitfactor
    if bits == 8:
        return rgb.astype(jnp.uint8)
    return rgb.astype(jnp.uint16)


def gray_packed(y: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """Grayscale output (capability beyond the 3-component-only reference)."""
    g = jnp.clip(y, 0.0, 255.0) * ((1 << bits) / 256.0)
    return g.astype(jnp.uint8 if bits == 8 else jnp.uint16)
