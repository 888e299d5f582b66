from .pallas_nonbonded import (
    PallasNBData,
    pallas_available,
    pallas_nonbonded_energy_forces,
    pallas_supported_terms,
    prepare_nb_data,
)

__all__ = [
    "PallasNBData",
    "pallas_available",
    "pallas_nonbonded_energy_forces",
    "pallas_supported_terms",
    "prepare_nb_data",
]
