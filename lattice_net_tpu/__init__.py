"""lattice_net_tpu — a TPU-native (JAX/XLA/Pallas) sparse permutohedral lattice framework.

Re-implements the capabilities of LatticeNet (Rosu et al., RSS 2020,
reference CUDA/torch implementation at AIS-Bonn/lattice_net) with a
TPU-first design:

* the reference's GPU hash table (spinlock inserts, device-side probing;
  reference ``include/lattice_net/kernels/HashTableGPU.cuh``) is replaced by a
  deterministic sort-based, fixed-capacity lattice structure that is fully
  traceable under ``jax.jit`` (see :mod:`lattice_net_tpu.lattice.structure`);
* the reference's im2row + GEMM convolution (``src/Lattice.cu:424-474``)
  becomes a cached neighbour-index table + gather-GEMM that XLA maps onto
  the MXU (see :mod:`lattice_net_tpu.lattice.ops`);
* the mutable ``Lattice`` C++ object becomes an immutable pytree
  (:class:`lattice_net_tpu.lattice.structure.LatticeStructure`), making the
  whole network a pure function of ``(structures, params, values)`` —
  jit/vmap/shard_map-able by construction.
"""

__version__ = "0.1.0"
