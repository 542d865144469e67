"""dl_image_segmentation_tpu -- TPU-native geospatial segmentation data
framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
harry-gibson/dl_image_segmentation (reference mounted at
/root/reference): chip creation from a tiled catalog with cloud-masked
compositing and vector label burning, chips -> sharded TFRecords, and a
TFRecord parse/augment/batch input pipeline feeding a U-Net trainer.

The 16-name public facade of the reference
(/root/reference/dl_segmentation_utils/__init__.py:1-15) is preserved
with identical on-disk contracts; everything else is new, TPU-first API.
"""

__version__ = "0.1.0"

# Reference-compatible facade is assembled lazily to keep `import
# dl_image_segmentation_tpu` light (JAX etc. load on first use).
_LAZY = {
    # chip acquisition (reference: _descartes_img_chips.py)
    "DLTileJobConfig": "dl_image_segmentation_tpu.pipeline.chips",
    "OGRLabelDataDesc": "dl_image_segmentation_tpu.pipeline.chips",
    "DLSampleCreationConfig": "dl_image_segmentation_tpu.pipeline.chips",
    "create_chips_for_tile": "dl_image_segmentation_tpu.pipeline.chips",
    "create_label_array_for_tile": "dl_image_segmentation_tpu.pipeline.chips",
    "create_img_array_for_tile": "dl_image_segmentation_tpu.pipeline.chips",
    "create_cloudmasked_s2_array": "dl_image_segmentation_tpu.pipeline.chips",
    "stack_products_for_tile": "dl_image_segmentation_tpu.pipeline.chips",
    # chips -> TFRecords (reference: _img_to_tf_mp.py/_img_to_tf_threaded.py)
    "images_to_tfrecords_mp": "dl_image_segmentation_tpu.records.writers",
    "images_to_tfrecords_mt": "dl_image_segmentation_tpu.records.writers",
    # record codec + parsers (reference: _tfrecord_image_translation.py)
    "convert_to_example": "dl_image_segmentation_tpu.records.example",
    "featuretemplate_bytestring_imagechip": "dl_image_segmentation_tpu.records.parsers",
    "featuretemplate_ndarray_imagechip": "dl_image_segmentation_tpu.records.parsers",
    "parse_encoded_rgb_img_proto": "dl_image_segmentation_tpu.records.parsers",
    "parse_8bit_array_proto": "dl_image_segmentation_tpu.records.parsers",
    "parse_encoded_gdal_proto_eager": "dl_image_segmentation_tpu.records.parsers",
    "parse_encoded_gdal_proto_wrapped": "dl_image_segmentation_tpu.records.parsers",
    "parse_higher_dtype_array_proto": "dl_image_segmentation_tpu.records.parsers",
    # graph-mode tf.data variants (drop-ins for the reference's
    # ds.map(parse_fn, 8) call sites, parse nb cells 30-33)
    "parse_encoded_rgb_img_proto_tf":
        "dl_image_segmentation_tpu.records.parsers_tf",
    "parse_8bit_array_proto_tf":
        "dl_image_segmentation_tpu.records.parsers_tf",
    "parse_higher_dtype_array_proto_tf":
        "dl_image_segmentation_tpu.records.parsers_tf",
    "parse_encoded_gdal_proto_wrapped_tf":
        "dl_image_segmentation_tpu.records.parsers_tf",
}


# star-imports (the reference's notebooks use flat `from pkg import
# ...` style) resolve through __getattr__ one name at a time
__all__ = sorted(_LAZY)


def __getattr__(name):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(name)
    import importlib
    value = getattr(importlib.import_module(mod), name)
    globals()[name] = value
    return value


def __dir__():
    return sorted(list(globals().keys()) + list(_LAZY.keys()))
