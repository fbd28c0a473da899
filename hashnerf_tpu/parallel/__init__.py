from hashnerf_tpu.parallel.mesh import make_mesh, shard_rays, replicate
from hashnerf_tpu.parallel.train_sharded import make_sharded_train_step
