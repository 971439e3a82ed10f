"""evfly_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the evfly event-camera
obstacle-avoidance stack (reference: anish-bhattacharya/evfly).

Layering (bottom → top):

  ops/       TPU compute primitives: torch-semantics interpolation/pooling/conv
             wrappers, the Pallas event voxelizer (histogram-as-matmul).
  models/    Functional model zoo with torch-state_dict-shaped param pytrees:
             OrigUNet, ViTLSTM (SegFormer MixTransformer + LSTM), ConvLSTM,
             composites, and the .pth weight porter.
  data/      h5 trajectory datasets, dataloader parity (splits, percentile
             rescale, resize), jax-random augmentation.
  train/     The Learner train/eval API (config-file compatible with the
             reference's configargparse .txt files), losses, LR schedule,
             checkpointing (.pth-compatible reads/writes).
  stream/    Streaming sliding-window inference: event accumulator semantics,
             jitted stateful step with donated carry, closed-loop harness.
  parallel/  Mesh/sharding helpers; data-parallel (multi-stream) training.
  sim/       ROS-free closed-loop simulator: obstacle fields, analytic depth
             rendering, difflog event sensor, the privileged expert, and the
             crash/segment-time evaluator.
  native/    C++ runtime pieces (event stream accumulator) with ctypes
             bindings and pure-python fallbacks.
"""

__version__ = "0.1.0"
