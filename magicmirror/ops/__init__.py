from .sampling import grid_sample, texture_mapping
from .shading import spherical_harmonic_lighting
from .rasterize import dibr_rasterization
