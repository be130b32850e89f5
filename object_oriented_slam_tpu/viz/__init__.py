from .export import draw_depth_frame, draw_frame, render_map  # noqa: F401
