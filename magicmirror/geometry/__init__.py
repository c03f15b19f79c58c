from .obj_io import load_obj, save_mesh, Mesh
from .camera import (
    camera_position_from_spherical_angles,
    generate_transformation_matrix,
    perspective_projection,
)
from . import mesh
