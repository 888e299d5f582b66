"""Reference-name alias for the neighbour-list utilities.

The reference ships `torchmd/neighbourlist.py` as an unused sketch
(discretize_box + a commented-out neighbour_list). Here the functionality
is real and lives in torchmd_tpu.neighbors; this module keeps the
reference spelling importable.
"""

from .neighbors import (
    CellKernel,
    CellList,
    CellListConfig,
    build_cell_list,
    candidate_matrix,
    discretize_box,
    make_cell_config,
    needs_rebuild,
)

__all__ = [
    "CellKernel", "CellList", "CellListConfig", "build_cell_list",
    "candidate_matrix", "discretize_box", "make_cell_config", "needs_rebuild",
]
