from ampnet_tpu.infer.tiled import TiledInferencer, evaluate_dataset
