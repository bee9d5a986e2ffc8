"""sgg_tpu — a TPU-native scene-graph-generation framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
PyTorch codebase bknyaz/sgg (see SURVEY.md): PredCls/SGCls/SGDet on Visual
Genome / GQA / VTransE splits, IMP message passing with union-box edge
features, density-aware (dnorm) edge losses, GAN-based compositional
augmentation, and Recall@K / mean-Recall / zero- and k-shot evaluation —
redesigned for TPU: fixed-shape padded graph batches under ``jit``, MXU-mapped
kernels, and ``shard_map`` data parallelism.
"""

__version__ = "0.1.0"
