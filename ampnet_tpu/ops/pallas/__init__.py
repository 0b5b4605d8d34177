from ampnet_tpu.ops.pallas.fused_mlp import fold_bn, fused_mlp_chain
