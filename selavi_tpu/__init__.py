"""selavi-tpu: TPU-native (JAX/XLA/Pallas/pjit) multi-modal self-labeling.

A from-scratch framework with the capabilities of facebookresearch/selavi
(NeurIPS 2020 "Labelling unlabelled videos from scratch with multi-modal
self-supervision"): audio-visual encoders trained against Sinkhorn-Knopp
optimal-transport pseudo-labels, data-parallel over a TPU ICI mesh.

Subpackages
-----------
models     flax linen R(2+1)D-18 video tower, ResNet audio tower, vmapped heads
ops        device-side preprocessing / log-mel kernels (XLA + Pallas)
selflabel  Sinkhorn-Knopp engine, marginals, modality matching, SK schedule
parallel   mesh construction, sharding helpers, multi-host init, preemption
data       datasets (real + synthetic), decode backends, transforms, loader
train      train step, optimizer/schedules, checkpointing, main loop
eval       clustering metrics, cluster dumps, retrieval, finetuning
utils      logging, meters, experiment management
"""

__version__ = "0.1.0"
