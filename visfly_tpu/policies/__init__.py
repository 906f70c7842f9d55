from .extractors import MLP, ImageCNN, MultiInputExtractor
from .networks import (
    Actor,
    ActorCriticPolicy,
    QCritic,
    StateCritic,
    gaussian_entropy,
    gaussian_log_prob,
)

__all__ = [
    "MLP",
    "ImageCNN",
    "MultiInputExtractor",
    "Actor",
    "QCritic",
    "StateCritic",
    "ActorCriticPolicy",
    "gaussian_log_prob",
    "gaussian_entropy",
]
