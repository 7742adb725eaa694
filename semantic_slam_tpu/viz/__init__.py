from semantic_slam_tpu.viz.renderer import (  # noqa: F401
    render_map, render_objects, export_map_ply,
    render_detections, render_clusters, render_object_overlay,
)
