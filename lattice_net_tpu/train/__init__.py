from lattice_net_tpu.train.optim import (
    adamw_amsgrad,
    cosine_warm_restarts,
    make_optimizer,
)
