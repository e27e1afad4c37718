from spurfies_tpu.parallel.mesh import make_mesh, shard_views
