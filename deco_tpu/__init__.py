"""deco_tpu: TPU-native frequency-decoupled pixel diffusion framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of hhhhzp/DeCo
(arXiv 2511.19365) designed for TPU: pjit/mesh data parallelism, lax.scan
samplers, Pallas kernels for the hot ops, Orbax checkpointing.
"""

__version__ = "0.1.0"
