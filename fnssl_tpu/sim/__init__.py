from fnssl_tpu.sim.sabine import (
    beta_sabine_estimation, att2t_sabine_estimator, t2n)
from fnssl_tpu.sim.ism import simulate_rir, simulate_trajectory
