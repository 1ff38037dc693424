"""Compute ops: clustering, thresholding, morphology, components."""

from .components import label, size_filter

__all__ = ["label", "size_filter"]
