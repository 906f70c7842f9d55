from .base import CollisionInfo, DroneGymEnv, EnvState, StepOutput
from .hover import HoverEnv, HoverEnv2
from .navigation import NavigationEnv, NavigationEnv2

__all__ = [
    "DroneGymEnv",
    "EnvState",
    "StepOutput",
    "CollisionInfo",
    "HoverEnv",
    "HoverEnv2",
    "NavigationEnv",
    "NavigationEnv2",
]
