"""Volumetric rendering: occupancy-lattice marching, compositing, occupancy
grid maintenance (TPU-native redesign of distill_mutual/renderer.py and the
raymarching CUDA extension)."""

from pvd_tpu.render.occupancy import (
    OccupancyState,
    init_occupancy_state,
    mark_untrained_grid,
    update_density_grid,
)
from pvd_tpu.render.renderer import (
    MarchedSamples,
    march_rays,
    render_rays,
    render_stratified,
)

__all__ = [
    "OccupancyState",
    "init_occupancy_state",
    "mark_untrained_grid",
    "update_density_grid",
    "MarchedSamples",
    "march_rays",
    "render_rays",
    "render_stratified",
]
