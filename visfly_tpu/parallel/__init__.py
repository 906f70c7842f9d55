from .mesh import make_mesh, replicate_pytree, shard_batch_pytree, shard_train_state

__all__ = [
    "make_mesh",
    "shard_batch_pytree",
    "replicate_pytree",
    "shard_train_state",
]
