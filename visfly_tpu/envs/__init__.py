from .base import CollisionInfo, DroneGymEnv, EnvState, StepOutput
from .catch import CatchEnv
from .dynamic import DynEnv
from .hover import HoverEnv, HoverEnv2
from .landing import LandingEnv, LandingEnv2
from .multi import MultiDroneGymEnv, MultiNavigationEnv
from .navigation import NavigationEnv, NavigationEnv2
from .racing import RacingEnv, RacingEnv2
from .tracking import TrackEnv, TrackEnv2

ENV_ALIASES = {
    "hover": HoverEnv,
    "hover2": HoverEnv2,
    "navigation": NavigationEnv,
    "navigation2": NavigationEnv2,
    "racing": RacingEnv,
    "racing2": RacingEnv2,
    "tracking": TrackEnv,
    "tracking2": TrackEnv2,
    "landing": LandingEnv,
    "landing2": LandingEnv2,
    "catch": CatchEnv,
    "dynamic": DynEnv,
    "multi_navigation": MultiNavigationEnv,
}

__all__ = [
    "DroneGymEnv",
    "EnvState",
    "StepOutput",
    "CollisionInfo",
    "HoverEnv",
    "HoverEnv2",
    "NavigationEnv",
    "NavigationEnv2",
    "RacingEnv",
    "RacingEnv2",
    "TrackEnv",
    "TrackEnv2",
    "LandingEnv",
    "LandingEnv2",
    "CatchEnv",
    "DynEnv",
    "MultiDroneGymEnv",
    "MultiNavigationEnv",
    "ENV_ALIASES",
]
