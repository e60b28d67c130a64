"""TPU-native (JAX / XLA / Pallas / pjit) framework with the capabilities of
akashsengupta1997/HierarchicalProbabilistic3DHuman (ICCV 2021).

Brand-new design, built TPU-first:
  - all compute-path math (SMPL LBS, matrix-Fisher distributions, rejection
    sampling, rasterization, image ops) is pure JAX, jit/vmap/pjit friendly;
  - no data-dependent python control flow inside compiled functions;
  - samples and batch are first-class vmapped axes, shardable over a device
    mesh (see `parallel/`).
"""

__version__ = "0.1.0"
