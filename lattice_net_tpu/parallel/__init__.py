from lattice_net_tpu.parallel.data_parallel import (
    TrainState,
    make_loss_fn,
    make_train_step,
    make_dp_train_step,
    make_batch,
)
from lattice_net_tpu.parallel.lattice_sharded import (
    make_hybrid_lnn_train_step,
    make_sharded_lnn_forward,
    make_sharded_lnn_train_step,
    shard_clouds_host,
    shard_points_host,
)
