"""splatpu — TPU-native framework for training and animating 3D Gaussian splats.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
`bryanboateng/animating-gaussian-splats` (see SURVEY.md):

- ``splatpu.core``      pytree types and pure math (quaternions, SSIM, positional
                        encoding, camera projection / EWA splatting math).
- ``splatpu.render``    differentiable Gaussian rasterization: a naive jnp oracle,
                        a tiled XLA production renderer, and Pallas TPU kernels.
- ``splatpu.growth``    jit-safe fixed-capacity densification (clone/split/prune/
                        opacity-reset) with functional optimizer-state surgery.
- ``splatpu.dynamics``  deformation network (residual MLP), state encoding, and
                        the local-rigidity regularizer.
- ``splatpu.neighbors`` exact k-NN (chunked brute force on device; C++ KD-tree on host).
- ``splatpu.data``      CMU-Panoptic / Dynamic-3D-Gaussians data layout loader and
                        synthetic test scenes.
- ``splatpu.train``     stage-1 static densification fit and stage-2 animation training.
- ``splatpu.dist``      device meshes, camera/tile sharding, psum'd gradients.
- ``splatpu.io``        checkpointing and artifact/video export.
- ``splatpu.obs``       metrics sinks, profiling, benchmarking.
"""

__version__ = "0.1.0"
