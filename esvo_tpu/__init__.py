"""esvo_tpu — a TPU-native event-based stereo visual odometry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
HKUST-Aerial-Robotics/ESVO (Zhou, Gallego, Shen — IEEE T-RO 2021):

- ``esvo_tpu.surface``   — time-surface engine (dense scatter/decay, replaces
  the per-pixel event-queue node ``esvo_time_surface``).
- ``esvo_tpu.geometry``  — camera models, rectification LUTs, SE(3)/Cayley ops
  (replaces ``esvo_core/container/CameraSystem`` + kindr + ``tools/cayley``).
- ``esvo_tpu.mapping``   — batched stereo block matching, per-event inverse
  depth refinement, probabilistic (Student-t / Gaussian) depth fusion and
  regularization (replaces ``esvo_core/core/{EventBM, DepthProblem*,
  DepthFusion, DepthRegularization}``).
- ``esvo_tpu.tracking``  — batched 3D-2D edge alignment on negative time
  surfaces with analytical 6-DoF Jacobians (replaces
  ``esvo_core/core/RegProblem*``).
- ``esvo_tpu.runtime``   — the system loop, state machine and configuration
  (replaces the ROS node graph of ``esvo_Mapping`` / ``esvo_Tracking``).
- ``esvo_tpu.io``        — ROS-free dataset ingestion + fixed-rate event
  framing (replaces rosbag playback + ``events_repacking_helper``).
- ``esvo_tpu.parallel``  — device-mesh sharding of the event/point batch axes.
- ``esvo_tpu.eval``      — trajectory/depth evaluation (ATE/RPE, TUM export).

Everything on the device side is fixed-shape, masked, batched dense compute;
dynamic sizes from the reference are replaced by static capacities + validity
masks.
"""

__version__ = "0.1.0"
