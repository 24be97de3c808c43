from fnssl_tpu.eval.decode import (
    DecodeResult, spatial_spectrum, idl_decode, pd_decode, mse_decode,
    time_pool_ipd, template_ri, track_associate)
from fnssl_tpu.eval.metrics import (
    angular_error, get_metric_single, get_metric_multiple)
from fnssl_tpu.eval.pred_doa import (
    PredDOA, PredDOAMultiTrack, predgt2doa_cls, ipd_baseline)
from fnssl_tpu.eval.vis import vis_doa, locata_plot
