from artes_tpu.parallel.mesh import (make_mesh, round_up_batch,  # noqa: F401
                                     sharded_dispatch)
