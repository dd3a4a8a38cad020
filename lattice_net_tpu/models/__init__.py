from lattice_net_tpu.models.lnn import LNN, ModelParams, prepare_cloud
