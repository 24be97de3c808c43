from fnssl_tpu.physics.dpipd import DPIPD, DPIPD2
from fnssl_tpu.physics.targets import (
    ipd_complex_to_ri, vad_mask_and_sum, bessel_nonsource_target,
    vad_gate_with_nonsource, dp_vad, energy_vad)
