"""Batched quaternion algebra on ``(..., 4)`` arrays, TPU-native.

Quaternions are stored as a single trailing-dim-4 array ``[w, x, y, z]``
(the reference keeps four parallel ``(N,)`` tensors; see
``/root/reference/utils/maths.py:4-293``). A fused layout lets XLA keep the
whole quaternion in registers and vectorise over the batch dim on the VPU.

All functions are pure, dtype-preserving, and broadcast over leading dims, so
they compose with ``jax.vmap`` / ``jax.grad`` / ``lax.scan`` directly.

Convention: Hamilton product, scalar-first, rotation of a vector v by unit
quaternion q is ``q ⊗ (0, v) ⊗ q*`` (world-from-body), matching the reference
``Quaternion.rotate`` (`maths.py:32-38`).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def identity(shape=(), dtype=jnp.float32) -> Array:
    """Unit quaternion(s) ``[1, 0, 0, 0]`` with the given batch shape."""
    q = jnp.zeros((*shape, 4), dtype=dtype)
    return q.at[..., 0].set(1.0)


def mul(q: Array, p: Array) -> Array:
    """Hamilton product q ⊗ p. Matches `maths.py:168-174`."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def conjugate(q: Array) -> Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def norm(q: Array) -> Array:
    return jnp.linalg.norm(q, axis=-1)


def normalize(q: Array) -> Array:
    return q / norm(q)[..., None]


def rotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) v (..., 3) into the world frame: q ⊗ (0,v) ⊗ q*.

    Uses the same quaternion-product expansion as the reference
    (`maths.py:32-38`) so rollouts agree to the last ulp; XLA fuses the two
    products into one VPU chain anyway.
    """
    zero = jnp.zeros_like(v[..., :1])
    vq = jnp.concatenate([zero, v], axis=-1)
    return mul(mul(q, vq), conjugate(q))[..., 1:]


def rotate_fused(q: Array, v: Array) -> Array:
    """Rotation via the Rodrigues-style fused form (fewer flops, different
    last-ulp rounding than :func:`rotate`). Use where bit-parity with the
    reference does not matter (rendering, rewards)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def inv_rotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) into the body frame: q* ⊗ (0,v) ⊗ q (`maths.py:40-49`)."""
    zero = jnp.zeros_like(v[..., :1])
    vq = jnp.concatenate([zero, v], axis=-1)
    return mul(mul(conjugate(q), vq), q)[..., 1:]


def to_rotation_matrix(q: Array) -> Array:
    """(..., 3, 3) world-from-body rotation matrix. Matches `maths.py:110-120`."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def x_axis(q: Array) -> Array:
    """Body x-axis in world frame (drone forward direction), `maths.py:122-133`."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w)],
        axis=-1,
    )


def xz_axis(q: Array) -> Array:
    """(..., 2, 3) stacked body x and z axes in world frame (`maths.py:134-151`).

    NOTE: replicates the reference formula verbatim, whose first row is the
    matrix row [R00, R01, R02] rather than the x column — kept for parity.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row_x = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        axis=-1,
    )
    row_z = jnp.stack(
        [2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row_x, row_z], axis=-2)


def to_euler(q: Array, order: str = "zyx") -> Array:
    """(..., 3) [roll, pitch, yaw]; matches `maths.py:244-254`."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    if order == "zyx":
        roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
        pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
        yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    elif order == "xyz":
        roll = jnp.arctan2(2 * (w * y - x * z), 1 - 2 * (x * x + y * y))
        pitch = jnp.arcsin(jnp.clip(2 * (w * z - y * x), -1.0, 1.0))
        yaw = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + z * z))
    else:
        raise ValueError(f"unknown euler order {order!r}")
    return jnp.stack([roll, pitch, yaw], axis=-1)


def yaw(q: Array) -> Array:
    """Heading angle about world z; matches `maths.py:56-57` / `:248`."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def from_euler(roll: Array, pitch: Array, yaw_: Array, order: str = "zyx") -> Array:
    """Build quaternion(s) from euler angles, matching `maths.py:256-281`."""
    roll, pitch, yaw_ = jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw_)
    cy, sy = jnp.cos(yaw_ * 0.5), jnp.sin(yaw_ * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    if order == "zyx":
        w = cr * cp * cy + sr * sp * sy
        x = sr * cp * cy - cr * sp * sy
        y = cr * sp * cy + sr * cp * sy
        z = cr * cp * sy - sr * sp * cy
    elif order == "xyz":
        w = cr * cp * cy - sr * sp * sy
        x = sr * cp * cy + cr * sp * sy
        y = cr * sp * cy - sr * cp * sy
        z = cr * cp * sy + sr * sp * cy
    else:
        raise ValueError(f"unknown euler order {order!r}")
    return jnp.stack([w, x, y, z], axis=-1)


def extract_yaw_only(q: Array) -> Array:
    """Quaternion keeping only the yaw rotation (`maths.py:51-64`)."""
    half = yaw(q) * 0.5
    w = jnp.cos(half)
    z = jnp.sin(half)
    zeros = jnp.zeros_like(w)
    return jnp.stack([w, zeros, zeros, z], axis=-1)


def world_to_head(q: Array, v: Array) -> Array:
    """Project world vector into the heading (yaw-only) frame (`maths.py:87-92`)."""
    return inv_rotate(extract_yaw_only(q), v)


def local_to_head(q: Array, v: Array) -> Array:
    """Body vector → heading frame: local→world→heading (`maths.py:94-101`)."""
    return world_to_head(q, rotate(q, v))


def extract_pitch_roll(q: Array) -> Array:
    """Quaternion keeping only pitch and roll (`maths.py:66-85`)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pitch = jnp.arctan2(2 * (w * y + x * z), 1 - 2 * (x * x + z * z))
    roll = jnp.arctan2(2 * (w * x - y * z), 1 - 2 * (y * y + z * z))
    hp, hr = pitch / 2, roll / 2
    return jnp.stack(
        [
            jnp.cos(hp) * jnp.cos(hr),
            jnp.sin(hr) * jnp.cos(hp),
            jnp.sin(hp) * jnp.cos(hr),
            jnp.sin(hp) * jnp.sin(hr),
        ],
        axis=-1,
    )


def omega_derivative(q: Array, omega: Array) -> Array:
    """Quaternion kinematics dq/dt = 0.5 · q ⊗ (0, ω_body) (`maths.py:311`)."""
    zero = jnp.zeros_like(omega[..., :1])
    omega_q = jnp.concatenate([zero, omega], axis=-1)
    return 0.5 * mul(q, omega_q)
