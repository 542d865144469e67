"""Pipelines: chip creation, export orchestration, training input feed."""

from .chips import (DLTileJobConfig, OGRLabelDataDesc,
                    DLSampleCreationConfig, create_chips_for_tile,
                    create_img_array_for_tile, create_cloudmasked_s2_array,
                    create_label_array_for_tile, stack_products_for_tile,
                    is_done)
from .export import run_export, ExportReport

__all__ = [
    "DLTileJobConfig", "OGRLabelDataDesc", "DLSampleCreationConfig",
    "create_chips_for_tile", "create_img_array_for_tile",
    "create_cloudmasked_s2_array", "create_label_array_for_tile",
    "stack_products_for_tile", "is_done",
    "run_export", "ExportReport",
]
