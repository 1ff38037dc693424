"""Loss functions."""

from .oce_loss import oce_loss

__all__ = ["oce_loss"]
