from lattice_net_tpu.parallel.data_parallel import (
    TrainState,
    make_loss_fn,
    make_train_step,
    make_dp_train_step,
    make_batch,
)
