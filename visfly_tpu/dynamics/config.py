"""Drone physical-parameter loading and the static/dynamic config split.

The reference loads a JSON of physical constants into a mutable ``Dynamics``
object (`/root/reference/envs/base/dynamics.py:562-608`). Here the same
constants split into:

* ``DroneConfig`` — hashable Python statics (dt, substep count, action mode,
  integrator) that select the *compiled program*; passed as a static arg so
  XLA traces one fixed-shape, fixed-control-flow kernel per configuration.
* ``DroneParams`` — a pytree of jnp arrays (mass, inertia, gains, maps,
  normalisation scales) that are *runtime operands*; changing them does not
  recompile, enabling domain-randomised params under ``vmap``.
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import NamedTuple, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core.types import ACTION_TYPE_ALIAS, ActionType, Bound

GRAVITY = 9.81
_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "drone")


@dataclasses.dataclass(frozen=True)
class DroneConfig:
    """Static (trace-time) dynamics configuration.

    Mirrors the ``Dynamics.__init__`` keyword surface
    (`dynamics.py:26-92`): dt/ctrl_dt/comm_delay/action_type/integrator/
    ctrl_delay(=motor first-order lag)/rotor_sim.
    """

    action_type: ActionType = ActionType.BODYRATE
    dt: float = 0.005
    ctrl_dt: float = 0.03
    ctrl_delay: bool = True  # first-order motor lag (`dynamics.py:510-518`)
    comm_delay: float = 0.06  # action FIFO latency (`dynamics.py:322-328`)
    integrator: str = "euler"
    cfg: str = "drone_state"
    ori_output_type: str = "quaternion"
    action_space: Tuple[float, float] = (-1.0, 1.0)
    drag_random: float = 0.0

    def __post_init__(self):
        if isinstance(self.action_type, str):
            object.__setattr__(self, "action_type", ACTION_TYPE_ALIAS[self.action_type])
        # `dynamics.py:71-72`
        if abs(self.ctrl_dt / self.dt - round(self.ctrl_dt / self.dt)) > 1e-9:
            raise ValueError("ctrl_dt should be a multiple of dt")

    @property
    def interval_steps(self) -> int:
        return int(round(self.ctrl_dt / self.dt))

    @property
    def comm_delay_steps(self) -> int:
        return int(self.comm_delay / self.ctrl_dt)

    @property
    def is_quat_output(self) -> bool:
        return self.ori_output_type == "quaternion"


class DroneParams(NamedTuple):
    """Runtime drone constants as a flat pytree of arrays.

    Diagonal matrices in the reference (inertia, PID gains) are stored as
    their (3,) diagonals — every shipped config is diagonal, and elementwise
    multiplies beat 3×3 matmuls on the VPU.
    """

    mass: Array  # ()
    inertia: Array  # (3,)
    inertia_inv: Array  # (3,)
    linear_drag_coeffs: Array  # (3,)  (`dynamics.py:568`)
    quad_drag_coeffs: Array  # (3,)   pre-scaled by ½ρ·cross-section (`:567`)
    b_allocation: Array  # (4, 4)     thrust→[F, τx, τy, τz] (`:111-113`)
    b_allocation_inv: Array  # (4, 4)
    thrust_map: Array  # (3,) quadratic ω→thrust coefficients
    motor_c: Array  # () first-order lag constant exp(−dt/τ) (`:580-581`)
    thrust_bound: Bound  # per-rotor thrust clamp (`:586-593`)
    kp_bodyrate: Array  # (3,)
    kd_bodyrate: Array  # (3,)
    velocity_pid: Array  # (3,) [p, i, d] scalars
    position_pid: Array  # (3,) [p, i, d] scalars
    init_thrust: Array  # () hover thrust per rotor (`:85`)
    init_motor_omega: Array  # ()
    # action de-normalisation (`_get_scale_factor`, `dynamics.py:610-689`):
    # channel 0 (thrust-like or yaw-like) and channels 1:4.
    scale0: Array  # ()
    bias0: Array  # ()
    scale123: Array  # ()
    bias123: Array  # ()


def _diag3(mat: Sequence[Sequence[float]]) -> np.ndarray:
    m = np.asarray(mat, dtype=np.float64)
    if m.ndim == 2:
        return np.diagonal(m).copy()
    return np.broadcast_to(m, (3,)).copy()


def load_drone_json(cfg: str) -> dict:
    """Locate and parse a drone JSON (vendored physical-constant data files
    with identical values to `/root/reference/configs/drone/*.json`)."""
    path = cfg if cfg.endswith(".json") else os.path.join(_CONFIG_DIR, f"{cfg}.json")
    with open(path, "r") as f:
        return json.load(f)


def make_drone_params(config: DroneConfig, dtype=jnp.float32) -> DroneParams:
    """Build the params pytree, mirroring `Dynamics.load` + `_init` +
    `_get_scale_factor` (`dynamics.py:94-130,562-689`)."""
    data = load_drone_json(config.cfg)

    mass = float(data["mass"])
    inertia = np.asarray(data["inertia"], dtype=np.float64)
    cross_sections = np.asarray(data["cross_sections"], dtype=np.float64)
    quad_drag = (
        np.asarray(data["quad_drag_coeffs"], dtype=np.float64)
        * 0.5
        * 1.225
        * cross_sections
    )
    linear_drag = np.asarray(data["linear_drag_coeffs"], dtype=np.float64)

    kappa = float(data["kappa"])
    arm_length = float(data["arm_length"])
    thrust_map = np.asarray(data["thrust_map"], dtype=np.float64)
    motor_tau = float(data["motor_tau"])
    motor_c = math.exp(-config.dt / motor_tau)

    # Motor geometry → allocation matrix (`dynamics.py:100-114`).
    motor_direction = np.array(
        [[1.0, -1.0, -1.0, 1.0], [-1.0, -1.0, 1.0, 1.0], [0.0, 0.0, 0.0, 0.0]]
    )
    motor_direction = motor_direction / np.linalg.norm(motor_direction, axis=0)
    t_bm = arm_length * motor_direction
    b_allocation = np.vstack(
        [np.ones((1, 4)), t_bm[:2], kappa * np.array([[1.0, -1.0, 1.0, -1.0]])]
    )
    b_allocation_inv = np.linalg.inv(b_allocation)

    omega_max = float(data["motor_omega_max"])
    thrust_max = (
        thrust_map[0] * omega_max**2 + thrust_map[1] * omega_max + thrust_map[2]
    )
    thrust_bound = Bound(min=jnp.asarray(0.0, dtype), max=jnp.asarray(thrust_max, dtype))

    max_rate = float(data["max_rate"])
    max_spd = float(data["max_spd"])
    max_pos = float(data["max_pos"])

    # Normalisation scales (`_get_scale_factor`, max_min branch).
    lo, hi = config.action_space
    if config.action_type in (ActionType.BODYRATE, ActionType.THRUST):
        bd_acc_max = float(data["max_acc"]) * GRAVITY
        acc_scale = (bd_acc_max - 0.0) / (hi - lo)
        acc_bias = bd_acc_max - acc_scale * hi
        if config.action_type == ActionType.BODYRATE:
            rate_scale = (max_rate - (-max_rate)) / (hi - lo)
            rate_bias = max_rate - rate_scale * hi
            scale0, bias0, scale123, bias123 = acc_scale, acc_bias, rate_scale, rate_bias
        else:
            scale0, bias0, scale123, bias123 = acc_scale, acc_bias, acc_scale, acc_bias
    elif config.action_type == ActionType.VELOCITY:
        spd_scale = (max_spd - (-max_spd)) / (hi - lo)
        spd_bias = max_spd - spd_scale * hi
        yaw_scale = (math.pi - (-math.pi)) / (hi - lo)
        yaw_bias = math.pi - yaw_scale * hi
        # Reference quirk (`dynamics.py:669-672`): the yaw Uniform is built
        # with half=yaw_bias (==0 for symmetric ranges), so the de-normalised
        # yaw command is always yaw_bias — i.e. 0. Kept for parity.
        scale0, bias0, scale123, bias123 = yaw_bias, yaw_bias, spd_scale, spd_bias
    elif config.action_type == ActionType.POSITION:
        pos_scale = (max_pos - (-max_pos)) / (hi - lo)
        pos_bias = max_pos - pos_scale * hi
        yaw_scale = (math.pi - (-math.pi)) / (hi - lo)
        yaw_bias = math.pi - yaw_scale * hi
        scale0, bias0, scale123, bias123 = yaw_scale, yaw_bias, pos_scale, pos_bias
    else:  # pragma: no cover
        raise ValueError(f"unsupported action type {config.action_type}")

    init_thrust = mass * GRAVITY / 4.0  # (`dynamics.py:85`)
    a, b, c = thrust_map
    init_motor_omega = (-b + math.sqrt(b * b - 4 * a * (c - init_thrust))) / (2 * a)

    def arr(x):
        return jnp.asarray(x, dtype)

    return DroneParams(
        mass=arr(mass),
        inertia=arr(inertia),
        inertia_inv=arr(1.0 / inertia),
        linear_drag_coeffs=arr(linear_drag),
        quad_drag_coeffs=arr(quad_drag),
        b_allocation=arr(b_allocation),
        b_allocation_inv=arr(b_allocation_inv),
        thrust_map=arr(thrust_map),
        motor_c=arr(motor_c),
        thrust_bound=thrust_bound,
        kp_bodyrate=arr(_diag3(data["BODYRAYE_PID"]["p"])),
        kd_bodyrate=arr(_diag3(data["BODYRAYE_PID"]["d"])),
        velocity_pid=arr(
            [
                data["VELOCITY_PID"]["p"],
                data["VELOCITY_PID"]["i"],
                data["VELOCITY_PID"]["d"],
            ]
        ),
        position_pid=arr(
            [
                data["POSITION_PID"]["p"],
                data["POSITION_PID"]["i"],
                data["POSITION_PID"]["d"],
            ]
        ),
        init_thrust=arr(init_thrust),
        init_motor_omega=arr(init_motor_omega),
        scale0=arr(scale0),
        bias0=arr(bias0),
        scale123=arr(scale123),
        bias123=arr(bias123),
    )
