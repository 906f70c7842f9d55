from .extractors import (
    MLP,
    DecoderHead,
    ImageCNN,
    MultiInputExtractor,
    TransCNN,
    required_input_shape,
)
from .networks import (
    Actor,
    ActorCriticPolicy,
    QCritic,
    StateCritic,
    gaussian_entropy,
    gaussian_log_prob,
)
from .transfer import actor_to_policy_params

__all__ = [
    "MLP",
    "ImageCNN",
    "MultiInputExtractor",
    "TransCNN",
    "DecoderHead",
    "required_input_shape",
    "Actor",
    "QCritic",
    "StateCritic",
    "ActorCriticPolicy",
    "gaussian_log_prob",
    "gaussian_entropy",
    "actor_to_policy_params",
]
