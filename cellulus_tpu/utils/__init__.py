"""Utilities: logging, checkpointing, misc host helpers."""

from .logger import Logger, get_logger

__all__ = ["Logger", "get_logger"]
