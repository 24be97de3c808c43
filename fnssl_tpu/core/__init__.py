from fnssl_tpu.core.stft import stft, istft, hann_window, num_frames
from fnssl_tpu.core.complexops import (
    complex_multiplication, complex_conjugate_multiplication,
    complex_cart2polar)
from fnssl_tpu.core.pairs import (
    pair_rebatch, pair_unbatch, pair_indices, num_pairs)
from fnssl_tpu.core.norm import (
    forgetting_norm, forgetting_norm_streaming, offline_norm,
    ForgettingNormState, init_state)
from fnssl_tpu.core.coords import cart2sph, sph2cart
from fnssl_tpu.core.gcc import gcc, SRPMap
from fnssl_tpu.core.convs import (
    spheric_pad, caus_conv1d, caus_conv2d, caus_conv3d, caus_cnn_block)
