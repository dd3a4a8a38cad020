from lattice_net_tpu.data.toy import ToyCloud, make_toy_cloud
