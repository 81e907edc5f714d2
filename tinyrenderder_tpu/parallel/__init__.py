from tinyrenderder_tpu.parallel.dist import (make_mesh, render_frame_sharded,
                                             render_pass_sharded)

__all__ = ["make_mesh", "render_pass_sharded", "render_frame_sharded"]
