from artes_tpu.parallel.mesh import make_mesh, sharded_dispatch  # noqa: F401
