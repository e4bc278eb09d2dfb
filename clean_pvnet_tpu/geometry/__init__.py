from clean_pvnet_tpu.geometry.transforms import (  # noqa: F401
    project,
    transform_points,
    angle_axis_to_matrix,
    matrix_to_angle_axis,
    rotation_geodesic_deg,
)
from clean_pvnet_tpu.geometry.vertex import (  # noqa: F401
    compute_vertex_field,
    compute_vertex_field_np,
)
from clean_pvnet_tpu.geometry.fps import farthest_point_sampling  # noqa: F401
from clean_pvnet_tpu.geometry.pnp import (  # noqa: F401
    solve_pnp,
    solve_pnp_uncertainty,
    solve_pnp_uncertainty_scalar,
)
from clean_pvnet_tpu.geometry.view_sampler import (  # noqa: F401
    hinter_sampling,
    sample_views,
)
