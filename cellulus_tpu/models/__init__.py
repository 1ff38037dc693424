"""Model zoo: the object-centric-embedding U-Net."""

from .geometry import UNetGeometry, compute_geometry, min_input_size, output_size
from .unet import (
    UNetSpec,
    forward,
    init_params,
    model_flops,
    output_spatial_shape,
    select_and_add_coordinates,
    spec_from_config,
    tta_embeddings,
)

__all__ = [
    "UNetGeometry",
    "UNetSpec",
    "compute_geometry",
    "forward",
    "init_params",
    "min_input_size",
    "output_size",
    "model_flops",
    "output_spatial_shape",
    "select_and_add_coordinates",
    "spec_from_config",
    "tta_embeddings",
]
