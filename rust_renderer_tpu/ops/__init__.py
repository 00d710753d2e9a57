"""Compute kernels: the TPU analog of the reference's GLSL programs.

Each module rebuilds one of the reference's shader families
(utopian/shaders/, SURVEY.md §2.3) as vectorized JAX ops / Pallas kernels
operating on whole-image or whole-ray-batch arrays.
"""
