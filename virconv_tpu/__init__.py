"""VirConv-TPU: a TPU-native multimodal 3D object detection framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of hailanyi/VirConv
(CVPR 2023). The sparse convolution stack is reformulated as sorted voxel-hash
gather + per-offset matmuls that feed the TPU MXU; the transform-ensemble
("TED") replicas are batched along the batch axis instead of spatial index
concatenation; data-parallel training rides ICI via jax.sharding.

Layout:
    ops/        sparse tensor substrate, sparse convs, box geometry, NMS/WBF
    models/     VFE, VirConv backbones (NRConv), BEV backbone, heads, detectors
    datasets/   KITTI datasets, augmentors, processors, StVD, eval metric
    parallel/   mesh + sharded train/eval steps
    utils/      calibration, common math, losses
    train/      optimizer (OneCycle), trainer, checkpointing
"""

__version__ = "0.1.0"
