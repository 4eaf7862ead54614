"""contour_context_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the capabilities of
"Contour Context: Abstract Structural Distribution for 3D LiDAR Loop Detection and
Metric Pose Estimation" (ICRA 2023, reference implementation: lewisjiang/contour-context).

This is NOT a port. The reference is a single-threaded C++14 pipeline built on
OpenCV/Eigen/Ceres/nanoflann; this package re-designs every component TPU-first:

- BEV rasterization        -> scatter-max + argmax-payload gather (ops/bev.py)
- contour extraction       -> multi-level label-propagation connected components +
                              segment-sum moments, fixed-shape contour tables (ops/cc.py)
- retrieval keys           -> ring histogram as a small dense matmul (ops/keys.py)
- BCI constellation        -> batched 256-lane boolean bit ops + batched circular
                              window consensus (ops/bci.py)
- kd-tree retrieval        -> masked brute-force batched L2 top-k over an HBM-resident
                              key matrix (index/db.py), optionally sharded over a
                              device mesh (parallel/sharded_db.py)
- Ceres GMM-L2 refinement  -> batched fixed-iteration damped Gauss-Newton with
                              analytic jax.grad (ops/gmm.py)

Host Python does only file IO, orchestration and evaluation bookkeeping.
"""

from contour_context_tpu.config import (
    ContourManagerConfig,
    ContourSimThresConfig,
    ContourDBConfig,
    TreeBucketConfig,
    GMMOptConfig,
    CandidateScoreEnsemble,
    ScoreConstellSim,
    ScorePairwiseSim,
    ScorePostProc,
    PipelineConfig,
)

__version__ = "0.1.0"
