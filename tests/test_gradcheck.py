"""Finite-difference gradient checks of every lattice op (float64, CPU)."""

from lattice_net_tpu.misc.lnn_grad_check import run_all


def test_all_op_gradients():
    results = run_all(verbose=False)
    assert len(results) >= 9
