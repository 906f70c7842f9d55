"""Initial-state randomizers, in-jit.

Functional counterparts of `/root/reference/utils/randomization.py`:
Uniform / Normal / TargetUniform / Union state generators, plus
collision-rejection resampling (``safe_generate``) implemented as a
fixed-bound masked resampling loop so it lives inside ``jit`` (the reference
uses a host-side Python while loop, `randomization.py:64-96`).

Reference sampling quirks kept for parity:
* ranges are ``(2·U[0,1) − 1)·half + mean`` (full half-range — unlike
  ``Uniform.generate`` which uses ``(U−0.5)·half``).
* NormalStateRandomizer draws ``(2·N(0,1) − 1)·std + mean``
  (`randomization.py:198-203`) — a 2σ-wide, −1-shifted Gaussian.
* orientation is sampled as euler [roll-ish column order (o0,o1,o2)] then
  converted with ``from_euler`` zyx (`randomization.py:95`).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..core import quaternion as quat


def _u(key, n, mean, half):
    return (2.0 * jax.random.uniform(key, (n, 3)) - 1.0) * half + mean


def calculate_yaw_pitch(vector: Array) -> Tuple[Array, Array]:
    """Heading angles of spawn→target vectors (`randomization.py:15-33`)."""
    x, y, z = vector[:, 0], vector[:, 1], vector[:, 2]
    y_sign = jnp.where(jnp.sign(y) >= 0, 1.0, -1.0)
    xy_norm = jnp.linalg.norm(vector[:, :2], axis=1)
    yaw = jnp.arccos(jnp.clip(x / jnp.maximum(xy_norm, 1e-9), -1.0, 1.0)) * y_sign
    norm = jnp.linalg.norm(vector, axis=1)
    pitch = jnp.arcsin(jnp.clip(z / jnp.maximum(norm, 1e-9), -1.0, 1.0))
    return yaw, pitch


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "pos_mean", "pos_half", "ori_mean", "ori_half",
        "vel_mean", "vel_half", "omega_mean", "omega_half",
        "min_dis", "max_dis",
    ],
    meta_fields=["kind", "heading"],
)
@dataclasses.dataclass(frozen=True)
class RandomizerSpec:
    """One state generator. ``kind`` ∈ {uniform, normal, target_uniform}.

    For ``normal`` the *_half fields hold the std.
    """

    pos_mean: Array
    pos_half: Array
    ori_mean: Array
    ori_half: Array
    vel_mean: Array
    vel_half: Array
    omega_mean: Array
    omega_half: Array
    min_dis: Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.5))
    max_dis: Array = dataclasses.field(default_factory=lambda: jnp.asarray(10.0))
    kind: str = "uniform"
    heading: bool = False

    @staticmethod
    def uniform(position=None, orientation=None, velocity=None,
                angular_velocity=None, heading=False, kind="uniform",
                min_dis=0.5, max_dis=10.0, **_ignored):
        """Build from the reference's kwargs-dict format
        (`randomization.py:106-135`), e.g.
        ``{"position": {"mean": [1,0,1.5], "half": [1,1,0.5]}}``."""

        def mh(d, key2="half"):
            d = d or {}
            return (
                jnp.asarray(d.get("mean", [0.0, 0.0, 0.0]), jnp.float32),
                jnp.asarray(d.get(key2, d.get("std", [0.0, 0.0, 0.0])), jnp.float32),
            )

        pm, ph = mh(position)
        om, oh = mh(orientation)
        vm, vh = mh(velocity)
        am, ah = mh(angular_velocity)
        return RandomizerSpec(
            pos_mean=pm, pos_half=ph, ori_mean=om, ori_half=oh,
            vel_mean=vm, vel_half=vh, omega_mean=am, omega_half=ah,
            min_dis=jnp.asarray(min_dis), max_dis=jnp.asarray(max_dis),
            kind=kind, heading=heading,
        )


def from_reference_kwargs(random_kwargs: dict) -> Sequence[RandomizerSpec]:
    """Parse the reference ``random_kwargs['state_generator']`` dict
    (`droneEnv.py:145-235`) into specs, one per kwargs entry."""
    sg = (random_kwargs or {}).get("state_generator", {})
    cls = sg.get("class", "Uniform")
    kwargs_list = sg.get("kwargs", [{}])
    kind = {"Uniform": "uniform", "Normal": "normal",
            "TargetUniform": "target_uniform"}.get(cls, "uniform")
    if cls == "Union":
        # Union draws uniformly over sub-randomizers per reset
        # (`randomization.py:249-296`); we flatten the union into a list and
        # the sampler picks one at random.
        specs = []
        for entry in kwargs_list:
            for sub in entry.get("randomizers_kwargs", []):
                sub_kind = {"Uniform": "uniform", "Normal": "normal"}[sub["class"]]
                specs.append(RandomizerSpec.uniform(kind=sub_kind, **sub["kwargs"]))
        return specs
    return [RandomizerSpec.uniform(kind=kind, **kw) for kw in kwargs_list]


def sample(
    spec: RandomizerSpec,
    key: Array,
    n: int,
    target_pos: Optional[Array] = None,
    target_vel: Optional[Array] = None,
) -> Tuple[Array, Array, Array, Array]:
    """Draw (pos, quat, vel, omega) for n agents (`_generate` +
    euler→quaternion of `safe_generate`, `randomization.py:95,153-170`)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)

    if spec.kind == "normal":
        def draw(k, mean, std):
            return (2.0 * jax.random.normal(k, (n, 3)) - 1.0) * std + mean

        pos = draw(k1, spec.pos_mean, spec.pos_half)
        euler = draw(k2, spec.ori_mean, spec.ori_half)
        vel = draw(k3, spec.vel_mean, spec.vel_half)
        omega = draw(k4, spec.omega_mean, spec.omega_half)
    elif spec.kind == "target_uniform":
        # spawn on a ring around a (moving) target, yaw aimed at it
        # (`randomization.py:206-246`).
        tp = jnp.zeros((n, 3)) if target_pos is None else jnp.broadcast_to(target_pos, (n, 3))
        offset = (2.0 * jax.random.uniform(k1, (n, 3)) - 1.0) * spec.pos_half
        norm = jnp.linalg.norm(offset, axis=1, keepdims=True)
        scale = jnp.where(norm > spec.max_dis, spec.max_dis / norm, 1.0)
        scale = jnp.where(norm < spec.min_dis, spec.min_dis / jnp.maximum(norm, 1e-9), scale)
        pos = offset * scale + tp
        direction = tp - pos
        yaw, _pitch = calculate_yaw_pitch(direction)
        noise = (2.0 * jax.random.uniform(k2, (n, 3)) - 1.0) * spec.ori_half
        euler = jnp.stack([jnp.zeros(n), jnp.zeros(n), yaw], axis=1) + noise
        if target_vel is not None:
            vel = jnp.broadcast_to(target_vel, (n, 3)) + (
                2.0 * jax.random.uniform(k3, (n, 3)) - 1.0
            ) * spec.vel_half
        else:
            vel = _u(k3, n, spec.vel_mean, spec.vel_half)
        omega = _u(k4, n, spec.omega_mean, spec.omega_half)
    else:  # uniform
        half = (2.0 * jax.random.uniform(k1, (n, 3)) - 1.0) * spec.pos_half
        pos = spec.pos_mean + half
        if spec.heading:
            # aim yaw back toward the spawn-range centre (`randomization.py:162-165`)
            yaw, _pitch = calculate_yaw_pitch(-half)
            noise = (2.0 * jax.random.uniform(k2, (n, 3)) - 1.0) * spec.ori_half
            euler = jnp.stack([jnp.zeros(n), jnp.zeros(n), yaw], axis=1) + noise
        else:
            euler = _u(k2, n, spec.ori_mean, spec.ori_half)
        vel = _u(k3, n, spec.vel_mean, spec.vel_half)
        omega = _u(k4, n, spec.omega_mean, spec.omega_half)

    q = quat.from_euler(euler[:, 0], euler[:, 1], euler[:, 2], order="zyx")
    return pos, q, vel, omega


def meshgrid_sample(
    spec: RandomizerSpec,
    key: Array,
    n: int,
    index: int = 0,
    xyz_num=(1, 1, 1),
    xyz_half=(0.0, 2.0, 0.0),
) -> Tuple[Array, Array, Array, Array]:
    """Deterministic evaluation spawns (the reference ``test=True`` meshgrid
    mode, `randomization.py:139-161`): positions cycle through a linspace
    meshgrid over the spawn box, with a small uniform jitter of
    ``xyz_half``."""
    import numpy as np

    axes = [np.linspace(-1.0, 1.0, k) if k > 1 else np.zeros(1) for k in xyz_num]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    base = jnp.asarray(
        np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1), jnp.float32
    )
    rows = base[(index + jnp.arange(n)) % base.shape[0]]
    jitter = (2.0 * jax.random.uniform(key, (n, 3)) - 1.0) * jnp.asarray(
        xyz_half, jnp.float32
    )
    pos = rows * spec.pos_half + spec.pos_mean + jitter
    k2, k3, k4 = jax.random.split(jax.random.fold_in(key, 1), 3)
    euler = _u(k2, n, spec.ori_mean, spec.ori_half)
    vel = _u(k3, n, spec.vel_mean, spec.vel_half)
    omega = _u(k4, n, spec.omega_mean, spec.omega_half)
    q = quat.from_euler(euler[:, 0], euler[:, 1], euler[:, 2], order="zyx")
    return pos, q, vel, omega


def safe_sample(
    spec: RandomizerSpec,
    key: Array,
    n: int,
    is_collision_fn: Optional[Callable[[Array], Array]] = None,
    max_tries: int = 16,
    target_pos: Optional[Array] = None,
    target_vel: Optional[Array] = None,
) -> Tuple[Array, Array, Array, Array]:
    """Collision-rejection resampling fully inside jit
    (`safe_generate`, `randomization.py:64-96`).

    ``is_collision_fn(pos (n,3)) -> (n,) bool``. Runs a fixed ``max_tries``
    masked-resample scan (constant shape, TPU-friendly) instead of the
    reference's unbounded host loop.
    """
    pos, q, vel, omega = sample(spec, key, n, target_pos, target_vel)
    if is_collision_fn is None:
        return pos, q, vel, omega

    def body(carry, k):
        pos, q, vel, omega = carry
        bad = is_collision_fn(pos)
        p2, q2, v2, o2 = sample(spec, k, n, target_pos, target_vel)
        m = bad[:, None]
        return (
            jnp.where(m, p2, pos),
            jnp.where(m, q2, q),
            jnp.where(m, v2, vel),
            jnp.where(m, o2, omega),
        ), None

    keys = jax.random.split(jax.random.fold_in(key, 1), max_tries)
    (pos, q, vel, omega), _ = jax.lax.scan(body, (pos, q, vel, omega), keys)
    return pos, q, vel, omega
