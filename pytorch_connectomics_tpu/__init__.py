"""TPU-native connectomics framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the PyTorch Connectomics capability surface for TPU:
config-driven train/test/tune pipelines for 2-D/3-D EM segmentation.
"""

__version__ = "0.1.0"
