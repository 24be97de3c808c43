from fnssl_tpu.utils.audio_io import read_audio, write_audio
from fnssl_tpu.utils.logging import (
    MetricLogger, EmaLoss, set_seed, detect_infnan, tag_and_log_git_status)
from fnssl_tpu.utils.flops import (
    cost_analysis, count_params, flops_forward_backward, write_flops)
from fnssl_tpu.utils.profiling import trace, time_fn, summarize
