from lattice_net_tpu.ops_tpu.gather import take_rows, take_rows_reference
