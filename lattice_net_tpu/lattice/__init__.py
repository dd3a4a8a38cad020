from lattice_net_tpu.lattice import permutohedral
from lattice_net_tpu.lattice.structure import (
    LatticeStructure,
    LatticeHierarchy,
    build_structure,
    build_hierarchy,
    build_neighbors_same_level,
    build_neighbors_coarse_from_fine,
    build_neighbors_fine_from_coarse,
    filter_extent,
)
