"""garment_pattern_estimation_tpu — a TPU-native sewing-pattern estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NeuralTailor
(maria-korosteleva/Garment-Pattern-Estimation): point cloud of a draped garment
-> 2D sewing pattern (panel outlines + 3D placement + stitches).

Layering (bottom-up):
    core/        sewing-pattern spec library + NN tensor codec (numpy, host-side)
    preprocess/  mesh IO + surface point sampling + segmentation transfer (host-side)
    data/        datasets, splits, balanced batching, standardization, prefetching
    ops/         TPU kernels: Pallas tiled kNN, fused EdgeConv, sparsemax, pools
    models/      flax modules: encoders, scanned LSTM/GRU decoders, the 3 model families
    losses/      composed pattern loss + quality metrics, jit-compatible
    train/       pjit train step over a device mesh, schedules, early stopping
    experiment/  local-first experiment tracking, versioned checkpoints, .pth import
    parallel/    mesh construction + sharding helpers
    cli/         train / on_test_set / predict_per_example / noise_levels entry points
"""

__version__ = '0.1.0'
