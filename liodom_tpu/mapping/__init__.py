from liodom_tpu.mapping.grid import (MapState, init_map, update_map,
                                     update_map_full, get_map,
                                     get_local_map, local_map_offsets,
                                     map_entropy, cell_keys,
                                     count_cells)
from liodom_tpu.mapping.service import (MappingService, combined_step,
                                        init_combined)

__all__ = ["MapState", "init_map", "update_map", "update_map_full",
           "get_map", "get_local_map",
           "local_map_offsets", "map_entropy", "cell_keys", "count_cells",
           "MappingService", "combined_step", "init_combined"]
