"""Standalone controller interfaces.

Counterpart of the reference's vestigial controller ABC
(`/root/reference/envs/base/controller.py:1-42`): thin functional wrappers
around the dynamics-mode control laws, usable outside the env (e.g. for
sim-to-real replay in utils/pid_alignment.py).
"""
from __future__ import annotations


from jax import Array

from ..core.types import ActionType
from ..dynamics import DroneConfig, DroneParams, DynState
from ..dynamics.dynamics import _de_normalize, _thrust_from_cmd


class Controller:
    """Maps a normalized command in [-1, 1]⁴ to per-rotor desired thrusts
    for the given control mode."""

    action_type: ActionType = ActionType.BODYRATE

    def __init__(self, config: DroneConfig, params: DroneParams):
        import dataclasses

        if config.action_type != self.action_type:
            config = dataclasses.replace(config, action_type=self.action_type)
        self.config = config
        self.params = params

    def __call__(self, state: DynState, action: Array) -> Array:
        command = _de_normalize(self.config, self.params, action)
        return _thrust_from_cmd(self.config, self.params, state, command)


class ThrustController(Controller):
    action_type = ActionType.THRUST


class BodyrateController(Controller):
    action_type = ActionType.BODYRATE


class VelocityController(Controller):
    action_type = ActionType.VELOCITY


class PositionController(Controller):
    action_type = ActionType.POSITION
