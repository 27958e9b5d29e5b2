"""hairpt — a TPU-native differentiable hair path tracer (JAX/XLA/Pallas).

A from-scratch reimplementation of the capability surface of the Mitsuba 0.5
hair-rendering fork (ja5087/cs184-final-project-mitsuba0.5), designed TPU-first:

- wavefront path tracing over SoA ray batches under ``jax.jit``
  (replaces libcore's thread Scheduler + BlockedRenderProcess,
  reference: src/libcore/sched.cpp, src/librender/renderproc.cpp)
- flattened BVH over triangles and hair cylinder segments with vectorized
  traversal (replaces GenericKDTree/ShapeKDTree/HairKDTree,
  reference: include/mitsuba/render/gkdtree.h, src/shapes/hair.cpp)
- switch-free fused BSDF eval/sample over material tables
  (replaces the dlopen plugin dispatch, reference: src/libcore/plugin.cpp)
- differentiable end to end: pixel gradients w.r.t. BSDF/emitter parameters
  (a new capability; the reference is forward-only C++)
- multi-chip scaling via jax.sharding.Mesh + shard_map over image tiles
  (replaces RemoteWorker/StreamBackend TCP protocol,
  reference: src/libcore/sched_remote.cpp)
"""

__version__ = "0.1.0"
