"""Test fixtures: re-export of the package's synthetic dataset generators."""

from graphphysics_tpu.utils.synthetic import (  # noqa: F401
    cylinder_node_types,
    synth_velocity,
    tet_grid,
    triangulated_grid,
    write_aneurysm_xdmf,
    write_cylinder_h5,
    write_panels_xdmf,
    write_plate_h5,
)
