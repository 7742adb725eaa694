from semantic_slam_tpu.viz.renderer import (  # noqa: F401
    render_map, render_objects, export_map_ply,
)
