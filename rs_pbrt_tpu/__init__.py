"""rs_pbrt_tpu — a TPU-native, differentiable physically-based renderer.

A from-scratch JAX / Pallas re-design of the capability set of the
reference CPU renderer (rs_pbrt, itself an implementation of PBRT 3rd
edition).  Architecture: wavefront rendering over SoA ray batches,
tag-switched batched kernels instead of enum dispatch, flat index tables
instead of pointer graphs, `jax.sharding` meshes instead of thread pools.

Layout:
  utils/     L0 math substrate: vectors, transforms, spectra, RNG
  ops/       device kernels: sampling, intersection, BVH, BSDF, film
  models/    scene-object families: cameras, lights, materials, shapes,
             samplers, filters, textures, media + the integrators
  scene/     scene description: .pbrt parser, pbrt API state machine,
             flat SceneArrays compilation
  parallel/  device meshes, sharded rendering, collectives
  io/        image input/output, mesh loaders
"""

__version__ = "0.1.0"
