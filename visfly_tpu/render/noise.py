"""Camera/sensor noise models, applied on-device under the per-step PRNG.

TPU-native counterpart of the habitat-sim sensor noise models the reference
wires into every camera spec (`/root/reference/utils/SceneManager.py:1030-1033`
— ``sensor_spec.noise_model`` / ``noise_model_kwargs`` looked up per sensor
uuid from ``random_kwargs["noise_kwargs"]``, `droneEnv.py:53,81`).

RGB models (uint8 images, (N, 3, H, W)):
* ``GaussianNoiseModel``      — additive sensor read noise
* ``SaltAndPepperNoiseModel`` — dead/saturated pixels
* ``PoissonNoiseModel``       — photon shot noise (Gaussian approximation
  ``x + sqrt(x)·η`` — exact for the luminances cameras see, and avoids the
  rejection-sampler Poisson path inside jit)
* ``SpeckleNoiseModel``       — multiplicative speckle

Depth model ((N, 1, H, W) metres):
* ``RedwoodDepthNoiseModel``  — Redwood/Kinect-style: disparity quantization,
  depth-dependent axial noise (Nguyen et al. σ_z(z) fit), lateral jitter
  (realised with jnp.roll blends — no gathers, which run ~1e8 elem/s on TPU),
  and dropout at depth discontinuities (the grazing-angle failure mode).

All functions are pure (key, img, **kwargs) → img and jit/vmap/grad-safe.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import Array


def gaussian(key: Array, img: Array, intensity_constant: float = 0.2,
             mean: float = 0.0) -> Array:
    """Additive Gaussian read noise on uint8 RGB (habitat
    GaussianNoiseModel semantics: σ = intensity_constant·255)."""
    x = img.astype(jnp.float32)
    noise = jax.random.normal(key, x.shape) * (intensity_constant * 255.0) + mean
    return jnp.clip(x + noise, 0, 255).astype(img.dtype)


def salt_and_pepper(key: Array, img: Array, s_vs_p: float = 0.5,
                    amount: float = 0.05) -> Array:
    """Dead (pepper=0) / saturated (salt=255) pixels on uint8 RGB."""
    u = jax.random.uniform(key, img.shape)
    salt = u < amount * s_vs_p
    pepper = u > 1.0 - amount * (1.0 - s_vs_p)
    out = jnp.where(salt, jnp.asarray(255, img.dtype), img)
    return jnp.where(pepper, jnp.asarray(0, img.dtype), out)


def poisson(key: Array, img: Array, intensity_constant: float = 1.0) -> Array:
    """Photon shot noise: variance proportional to intensity. Gaussian
    approximation of Poisson(λ=x·k)/k."""
    x = img.astype(jnp.float32) * intensity_constant
    noise = jax.random.normal(key, x.shape) * jnp.sqrt(jnp.maximum(x, 0.0))
    return jnp.clip((x + noise) / intensity_constant, 0, 255).astype(img.dtype)


def speckle(key: Array, img: Array, mean: float = 0.0,
            sigma: float = 0.1) -> Array:
    """Multiplicative speckle: x·(1 + η), η ~ N(mean, sigma)."""
    x = img.astype(jnp.float32)
    noise = jax.random.normal(key, x.shape) * sigma + mean
    return jnp.clip(x * (1.0 + noise), 0, 255).astype(img.dtype)


# Redwood/Kinect constants: baseline·focal product for the disparity model
# and the Nguyen et al. axial-noise polynomial σ_z(z) = 0.0012 + 0.0019(z−0.4)²
_REDWOOD_DISPARITY = 35.130
_REDWOOD_QUANT = 8.0  # disparity quantization steps


def redwood_depth(key: Array, depth: Array, noise_multiplier: float = 1.0,
                  lateral_prob: float = 0.5, dropout_scale: float = 0.25,
                  invalid_value: float = 0.0) -> Array:
    """Redwood-style depth sensor noise on metres-valued (N, 1, H, W) maps.

    1. lateral jitter: each pixel reads a 1-px-shifted neighbour with
       probability ``lateral_prob`` (split across ±x/±y) — jnp.roll blends,
       no gathers
    2. axial noise: z += σ_z(z)·η·noise_multiplier
    3. disparity quantization: d = round(35.130/z · 8)/8, z = 35.130/d
    4. dropout at depth discontinuities (grazing surfaces): pixels whose
       local depth gradient is large drop to ``invalid_value`` with
       probability ∝ dropout_scale (the Kinect's edge-invalid behaviour)
    """
    k_lat, k_ax, k_drop, k_dir = jax.random.split(key, 4)
    z = depth.astype(jnp.float32)

    # 1. lateral jitter via roll blends over the last two (H, W) axes;
    # the 4-way pick is a select chain, not a take_along_axis gather
    # (TPU gathers measured ~1e8 elem/s — a select chain fuses for free)
    pick = jax.random.randint(k_dir, z.shape, 0, 4)
    lateral = jnp.roll(z, 1, axis=-1)
    for i, shifted in enumerate([
        jnp.roll(z, -1, axis=-1),
        jnp.roll(z, 1, axis=-2),
        jnp.roll(z, -1, axis=-2),
    ]):
        lateral = jnp.where(pick == i + 1, shifted, lateral)
    use_lat = jax.random.uniform(k_lat, z.shape) < lateral_prob
    z = jnp.where(use_lat, lateral, z)

    # 2. axial noise (Nguyen et al. σ_z fit)
    sigma = (0.0012 + 0.0019 * (z - 0.4) ** 2) * noise_multiplier
    z = z + jax.random.normal(k_ax, z.shape) * sigma

    # 3. disparity quantization
    safe = jnp.maximum(z, 1e-3)
    disp = jnp.round(_REDWOOD_DISPARITY / safe * _REDWOOD_QUANT) / _REDWOOD_QUANT
    z_q = _REDWOOD_DISPARITY / jnp.maximum(disp, 1e-3)
    z = jnp.where(z > 1e-3, z_q, z)

    # 4. dropout at discontinuities: |∇z| in px units as the grazing proxy
    gx = jnp.abs(z - jnp.roll(z, 1, axis=-1))
    gy = jnp.abs(z - jnp.roll(z, 1, axis=-2))
    grad = jnp.maximum(gx, gy)
    p_drop = jnp.clip(grad * dropout_scale, 0.0, 0.9)
    drop = jax.random.uniform(k_drop, z.shape) < p_drop
    z = jnp.where(drop, invalid_value, z)
    return z.astype(depth.dtype)


_RGB_MODELS = {
    "GaussianNoiseModel": gaussian,
    "SaltAndPepperNoiseModel": salt_and_pepper,
    "PoissonNoiseModel": poisson,
    "SpeckleNoiseModel": speckle,
}
_DEPTH_MODELS = {
    "RedwoodDepthNoiseModel": redwood_depth,
    "GaussianNoiseModel": None,  # resolved below (depth flavour)
}


def _gaussian_depth(key: Array, depth: Array, mean: float = 0.0,
                    sigma: float = 0.01) -> Array:
    z = depth.astype(jnp.float32)
    return (z + jax.random.normal(key, z.shape) * sigma + mean).astype(depth.dtype)


def apply_noise(key: Array, uuid: str, img: Array,
                settings: Dict[str, Any]) -> Array:
    """Dispatch a sensor's configured noise model
    (``noise_kwargs[uuid] = {"model": ..., "kwargs": {...}}``, matching the
    reference hookup `SceneManager.py:1030-1033`)."""
    spec = settings.get(uuid)
    if not spec:
        return img
    model = spec.get("model", "None")
    if model in (None, "None", "none"):
        return img
    kwargs = dict(spec.get("kwargs", {}))
    is_depth = jnp.issubdtype(img.dtype, jnp.floating)
    if is_depth:
        fn = redwood_depth if model == "RedwoodDepthNoiseModel" else (
            _gaussian_depth if model == "GaussianNoiseModel" else None
        )
    else:
        fn = _RGB_MODELS.get(model)
    if fn is None:
        raise ValueError(
            f"unknown noise model {model!r} for sensor {uuid!r} "
            f"({'depth' if is_depth else 'rgb'})"
        )
    return fn(key, img, **kwargs)
