from . import units, jax_utils

__all__ = ["units", "jax_utils"]
