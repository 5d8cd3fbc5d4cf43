"""dsdiff-tpu: TPU-native medical-image diffusion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
larrybb626/diffusion_models_dsdiff reference stack (see SURVEY.md).
"""
__version__ = "0.1.0"
