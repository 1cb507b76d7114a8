"""upgdm_tpu — TPU-native framework for unsupervised probing of critical
transitions with generative diffusion models.

A ground-up JAX/Flax/XLA rebuild of the capabilities of
curious-child/Unsupervised-probing-Using-Generative-Diffusion-Models
(see /root/repo/SURVEY.md for the structural map of the reference).
"""
__version__ = "0.1.0"
