from ctdd_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
from ctdd_tpu.parallel.dp import make_dp_train_step, make_dp_sampler  # noqa: F401
