from cleverrec_tpu.parallel.mesh import make_mesh  # noqa: F401
from cleverrec_tpu.parallel.sharding import (  # noqa: F401
    shard_batch_spec, shard_params, sharded_train_step)
