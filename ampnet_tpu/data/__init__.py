from ampnet_tpu.data.schema import (
    COL,
    NUM_CANONICAL_COLS,
    classification_label,
    remap_segmentation_labels,
    select_model_features,
)
