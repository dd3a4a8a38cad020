from lattice_net_tpu.lattice import permutohedral
from lattice_net_tpu.lattice.structure import (
    LatticeStructure,
    LatticeHierarchy,
    build_structure,
    build_hierarchy,
    build_neighbors_same_level,
    build_neighbors_coarse_from_fine,
    build_neighbors_fine_from_coarse,
    capacity_schedule_from_occupancy,
    compact_hierarchy,
    default_capacity_schedule,
    escalate_capacities,
    filter_extent,
)
