from .mesh import (
    make_train_step,
    ray_mesh,
    sharded_render_frame,
    sharded_trace,
)

__all__ = [
    "make_train_step",
    "ray_mesh",
    "sharded_render_frame",
    "sharded_trace",
]
